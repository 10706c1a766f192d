"""Physical-plan audit for the headline queries (see SCALE.md).

Prints broadcast/sort-merge join counts, shuffle counts, and
single-partition exchanges per query, plus scan pushdown detail for the
aggregation query. Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDIT = [
    "a1_groupby_agg",
    "j1_j2_enrich",
    "j3_broadcast_join",
    "j4_j5_fact_join",
    "g_dim_customers",
    "g_dim_customers_faithful",
    "g_dim_products",
    "g_fact_sales",
    "d_minhash_pairs",
    "v_lsh_topk",
    "w2_surrogate_key",
    "w2_surrogate_two_phase",
    "x2_asof_join",
    "x2_range_join",
    "d_cosine_dedup_lsh",
    "a1_hll_rollup",
    "t_winnow",
    "t_curation_pipeline",
    "j_salted_skew",
    "s6_partition_pruning",
    "a1_pivot",
    "t_chunk_documents",
    "t_vocab_topk",
    "t_pii_scrub",
    "t_hash_split",
    "t_tfidf_topterms",
    "d_ngram_jaccard",
    "d_cc_dedup",
    "e_json_extract",
    "t_pack_sequences",
    "t_stratified_sample",
    "t_best_per_lang",
    "t_mixture_weights",
    "s10_incremental_load",
    "x2_interval_join",
    "a1_grouping_sets",
    "s11_versioned_merge",
    "s12_zorder_roundtrip",
    "v_semantic_dedup",
    "t_quality_model",
    "er_resolve",
    "er_golden",
    "t_global_shuffle",
    "t_charlm_score",
    "s13_orc_roundtrip",
    "t_weighted_sample",
    "t_pretrain_pipeline",
    "t_span_dedup",
    "a1_cms_topk",
    # round-6 additions
    "t_bm25_topk",
    "x2_funnel",
    "t_quality_deciles",
    "a1_rfm_segments",
    "v_int8_quantize",
    "d_dup_stats",
    "t_weighted_per_lang",
    "s14_version_changes",
    "m_media_decode",
    "d_containment_pairs",
    "t_corpus_drift",
    # round-7 additions
    "x2_sessionize",
    "x2_retention",
    "w6_rolling_median",
    "x2_interarrival",
    "x2_asof_forward",
    "t_bm25_conjunctive",
    "v_sign_project",
    "j7_bloom_join",
    "t_dedupe_lines",
    "a2_target_encode",
    "a2_feature_scale",
    "a2_one_hot",
    "j8_star_revenue",
    # round-9 additions
    "x2_sessionize_chunked",
    "m_decode_jpeg",
    "j9_scd2_pit",
    "t_cluster_split",
    "g_fact_sales_pit",
    # round-10 additions
    "m_image_ahash_pairs",
    "m_decode_progressive",
    "g_reference_dim_customers",
    "g_reference_fact_sales",
    "g_reference_dim_products",
    "m_audio_fp_pairs",
    "m_hash_index_dedup",
    "gr_pagerank",
    # round-10 session-2 / round-11 crawl-chain additions
    "gr_trustrank",
    "v_hard_negatives",
    "t_canonical_urls",
    "t_html_extract",
    "t_warc_pipeline",
    "t_robots_filter",
    "m_image_exif",
    "m_audio_quality",
    "m_resample_audio",
    # round-12 additions (crawl-frontier tier + data selection)
    "t_frontier_schedule",
    "t_sitemap_urls",
    "d_exact_index_dedup",
    "t_dsir_select",
    # round-15 additions (drift remediation + BPE twin)
    "t_bpe_tokens_small",
    "v_ivf_split_topk",
    # round-16 additions (drift-shape-aware maintenance choose-path,
    # cold-cell merge)
    "v_ivf_maintain_topk",
    "v_ivf_merge_topk",
    # round-17 additions (sweep-chosen merge, banding retunes)
    "v_ivf_maintain_merge_topk",
    "m_minhash_reband_dedup",
    "m_hamming_reband_dedup",
    "er_reblock_incremental",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import __spark_entry__ as ent
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import get_spark

    spark = get_spark("explain-audit")
    qs = ent.queries()
    # optional comma-list substring filter (argv[2]) for auditing a
    # round's additions without replaying the whole list
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    for name in AUDIT:
        if only and not any(s in name for s in only):
            continue
        plan = qs[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        print(
            f"{name}: broadcast_joins="
            f"{plan.count('BroadcastHashJoin')} "
            f"sortmerge_joins={plan.count('SortMergeJoin')} "
            f"shuffles={plan.count('Exchange hashpartitioning') + plan.count('Exchange rangepartitioning')} "
            f"single_partition_exchanges={plan.count('Exchange SinglePartition')}"
        )

    print("\n--- a1_groupby_agg scan detail (pushdown/pruning) ---")
    plan = qs["a1_groupby_agg"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "FileScan" in line or "PushedFilters" in line:
            print(line.strip()[:250])

    salted_skew_evidence(spark)


def salted_skew_evidence(spark) -> None:
    """Runtime proof that salting spreads a hot join key across
    reducers (SCALE.md `j_salted_skew` row). A synthetic 30%-hot-key
    left side is joined to a dim with AQE disabled (so the comparison
    isolates the salting itself, not AQE's skew splitting); the number
    of distinct shuffle partitions that carry the hot key's output rows
    is measured via spark_partition_id() before any post-join exchange.
    Unsalted: 1 reducer owns the hot key. Salted: ~`salt` reducers.
    """
    from pyspark.sql import functions as F

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.joins import (
        salted_join,
    )

    print("\n--- j_salted_skew reducer evidence (hot key = 30% of rows) ---")
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n = 300_000
        left = spark.range(n).select(
            F.when(F.col("id") % 10 < 3, F.lit(7)).otherwise(F.col("id") % 1000)
            .alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
        # defeat broadcast so both plans shuffle on the join key
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

        def hot_reducers(df):
            return (
                df.withColumn("_pid", F.spark_partition_id())
                .filter(F.col("k") == 7)
                .select("_pid").distinct().count()
            )

        plain = left.join(right, "k")
        salted = salted_join(left, right, "k", salt=8)
        print(f"unsalted join: hot key rows on {hot_reducers(plain)} reducer(s)")
        print(f"salted join (salt=8): hot key rows on {hot_reducers(salted)} reducer(s)")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


if __name__ == "__main__":
    main()
