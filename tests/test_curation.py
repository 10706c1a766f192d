"""Curation operators: sequence packing, stratified sampling, per-group
top-k, mixture reweighting (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
    mixture_weights,
    pack_sequences,
    stratified_sample,
    topk_per_group,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load

    return load(spark, SF, "documents")


def test_pack_sequences_invariants(docs):
    budget = 1000
    out = pack_sequences(
        docs.select("doc_id", "n_chars"), "n_chars", budget=budget,
        order_col="doc_id", n_shards=4,
    ).cache()
    # lossless: every document assigned exactly once
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # a document starts strictly inside its sequence's budget window
    assert out.filter(
        (F.col("_seq_offset") < 0) | (F.col("_seq_offset") >= budget)
    ).count() == 0
    # within a sequence, total tokens excluding the final straddler fit
    # the budget: start offset + own tokens ≤ budget for all but the max
    # doc_id of the sequence
    w_max = out.groupBy("seq_id").agg(F.max("doc_id").alias("_last"))
    inner = out.join(w_max, "seq_id").filter(F.col("doc_id") != F.col("_last"))
    assert inner.filter(
        F.col("_seq_offset") + F.col("n_chars") > budget
    ).count() == 0
    out.unpersist()


def test_pack_sequences_shard_isolation(spark):
    """Explicit shard column: sequences never mix shards, and seq ids
    from different shards never collide (shard << 32 namespacing)."""
    df = spark.createDataFrame(
        [(i, 300, i % 3) for i in range(60)], "id bigint, toks int, shard int"
    )
    out = pack_sequences(
        df, "toks", budget=1000, order_col="id", shard_col="shard"
    )
    per_seq = out.groupBy("seq_id").agg(
        F.countDistinct("shard").alias("n_shards")
    )
    assert per_seq.filter(F.col("n_shards") > 1).count() == 0
    assert out.filter(
        F.shiftright(F.col("seq_id"), 32) != F.col("shard").cast("bigint")
    ).count() == 0


def test_stratified_sample_deterministic_and_exact(docs):
    fr = {"en": 0.5, "de": 1.0}
    a = stratified_sample(docs, "lang", fr, "doc_id").select("doc_id")
    b = stratified_sample(docs, "lang", fr, "doc_id").select("doc_id")
    assert sorted(r[0] for r in a.collect()) == sorted(r[0] for r in b.collect())
    # fraction 1.0 keeps every row of the stratum
    n_de = docs.filter(F.col("lang") == "de").count()
    kept_de = stratified_sample(docs, "lang", fr, "doc_id").filter(
        F.col("lang") == "de"
    ).count()
    assert kept_de == n_de
    # strata absent from the dict default to fraction 0 (dropped)
    assert stratified_sample(docs, "lang", fr, "doc_id").filter(
        ~F.col("lang").isin("en", "de")
    ).count() == 0
    # en rate lands near 0.5 (binomial tolerance on a small table)
    n_en = docs.filter(F.col("lang") == "en").count()
    kept_en = stratified_sample(docs, "lang", fr, "doc_id").filter(
        F.col("lang") == "en"
    ).count()
    assert abs(kept_en / n_en - 0.5) < 0.2


def test_stratified_sample_threshold_is_decimal_exact(spark):
    """Rates like 0.7/0.15, whose double product rounds just BELOW the
    integer (0.7*10000 = 6999.999…), must still use the exact decimal
    threshold (7000/1500) — computed driver-side, matching what any SQL
    oracle's decimal floor(rate*10000) yields. A pure-Python md5 replay
    with the exact integer thresholds must select identical rows."""
    import hashlib

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        _rate_threshold,
    )

    assert _rate_threshold(0.7) == 7000
    assert _rate_threshold(0.15) == 1500
    assert _rate_threshold(1.0) == 10000
    assert _rate_threshold(0.0) == 0

    rows = [(i, "en" if i % 2 == 0 else "fr") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    fr = {"en": 0.7, "fr": 0.15}
    kept = {
        r["doc_id"]
        for r in stratified_sample(df, "lang", fr, "doc_id", seed=42).collect()
    }

    def bucket(key: int) -> int:
        return int(hashlib.md5(f"{key}#42".encode()).hexdigest()[:8], 16) % 10_000

    expected = {
        i for i, lang in rows if bucket(i) < {"en": 7000, "fr": 1500}[lang]
    }
    assert kept == expected


def test_stratified_sample_seed_changes_selection(docs):
    fr = {"en": 0.5}
    a = {r[0] for r in stratified_sample(docs, "lang", fr, "doc_id", seed=1)
         .select("doc_id").collect()}
    b = {r[0] for r in stratified_sample(docs, "lang", fr, "doc_id", seed=2)
         .select("doc_id").collect()}
    assert a != b  # astronomically unlikely to collide if seed is wired


def test_topk_per_group(docs):
    out = topk_per_group(
        docs.select("doc_id", "lang", "n_chars"),
        ["lang"],
        [F.desc("n_chars"), F.asc("doc_id")],
        k=3,
        rank_col="rank",
    ).cache()
    sizes = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 3 for n in sizes.values())
    # the selected rows really are the maxima: the worst selected
    # n_chars per lang >= the best unselected n_chars per lang
    worst_sel = out.groupBy("lang").agg(F.min("n_chars").alias("w"))
    unsel = docs.join(out.select("doc_id"), "doc_id", "left_anti")
    best_unsel = unsel.groupBy("lang").agg(F.max("n_chars").alias("b"))
    bad = worst_sel.join(best_unsel, "lang").filter(F.col("w") < F.col("b"))
    assert bad.count() == 0
    out.unpersist()


def test_mixture_weights_algebra(docs):
    target = {"en": 0.6, "de": 0.4}
    out = {r["lang"]: r for r in mixture_weights(docs, "lang", target).collect()}
    total = sum(r["n_rows"] for r in out.values())
    for lang, r in out.items():
        assert r["observed_share"] == pytest.approx(r["n_rows"] / total)
        want = target.get(lang, 0.0)
        assert r["target_share"] == pytest.approx(want)
        assert r["weight"] == pytest.approx(want / (r["n_rows"] / total))
    # absent-from-target strata get weight 0, never NULL
    assert all(r["weight"] is not None for r in out.values())


def test_apply_mixture_materializes_expected_volumes(docs):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        apply_mixture,
        mixture_weights,
    )

    target = {"en": 0.6, "de": 0.4}
    out = apply_mixture(docs, "lang", target, key_col="doc_id").cache()
    # deterministic: re-run emits the identical multiset
    again = apply_mixture(docs, "lang", target, key_col="doc_id")
    assert sorted(map(tuple, out.select("doc_id", "copy_idx").collect())) == \
        sorted(map(tuple, again.select("doc_id", "copy_idx").collect()))
    # groups absent from the target are dropped entirely
    assert out.filter(~F.col("lang").isin("en", "de")).count() == 0
    # per-group output volume == n_rows * weight within the one-extra
    # granularity of repeat-or-drop (expectation exact, realization
    # within ±group size of the md5 draw; use a generous band)
    w = {r["lang"]: (r["n_rows"], r["weight"])
         for r in mixture_weights(docs, "lang", target).collect()}
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang in ("en", "de"):
        n_rows, weight = w[lang]
        expected = n_rows * weight
        assert abs(got[lang] - expected) < 0.25 * n_rows + 1
    # copy_idx is a dense 1..k per doc
    per_doc = out.groupBy("doc_id").agg(
        F.count("*").alias("n"), F.max("copy_idx").alias("mx")
    )
    assert per_doc.filter(F.col("n") != F.col("mx")).count() == 0
    out.unpersist()


def test_apply_mixture_clamps_extreme_upsampling(spark):
    """A 1-row group with a large target share would get weight
    target/observed in the hundreds; max_weight bounds the blast
    radius."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        apply_mixture,
    )

    rows = [(i, "big") for i in range(999)] + [(9999, "rare")]
    df = spark.createDataFrame(rows, "id bigint, g string")
    out = apply_mixture(
        df, "g", {"big": 0.5, "rare": 0.5}, key_col="id", max_weight=10.0
    )
    n_rare = out.filter(F.col("g") == "rare").count()
    # unclamped weight would be 0.5/(1/1000) = 500 copies; clamp -> <=10
    assert n_rare <= 10
    assert n_rare >= 9  # floor(10) with frac 0 -> exactly 10 expected


def test_cluster_split_prevents_near_dup_leakage(spark):
    """Every member of a near-dup cluster must land in the SAME split
    (the leakage guarantee a per-document hash split lacks); singletons
    split exactly like a plain hash_split of their own id."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        hash_split,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        cluster_split,
    )

    df = spark.createDataFrame([(i,) for i in range(1, 11)], "doc_id long")
    # two transitive clusters {1,2,3} (via 1-2, 2-3) and {7,8}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long"
    )
    out = {r.doc_id: (r.cluster_id, r.split)
           for r in cluster_split(df, "doc_id", pairs).collect()}
    assert len(out) == 10  # 1:1 join-back, no row loss
    # cluster co-travel: min-id label, identical split across members
    assert out[1][0] == out[2][0] == out[3][0] == 1
    assert out[1][1] == out[2][1] == out[3][1]
    assert out[7][0] == out[8][0] == 7
    assert out[7][1] == out[8][1]
    # pairwise: no pair straddles splits (the leakage property itself)
    for a, b in [(1, 2), (2, 3), (7, 8)]:
        assert out[a][1] == out[b][1]
    # singletons: own id as cluster, split == plain hash_split(id)
    plain = {
        r.doc_id: r.s
        for r in df.withColumn("s", hash_split(F.col("doc_id"))).collect()
    }
    for sid in (4, 5, 6, 9, 10):
        assert out[sid] == (sid, plain[sid])


def test_registry_contract_consistency():
    """Driver-contract meta-checks: every oracle_sql key has a queries()
    entry, names are unique, and the verified front-50 window contains
    at most the known rows-only set (a regression here silently removes
    a query from driver verification)."""
    import __spark_entry__ as ent

    qs = list(ent.queries().keys())
    oracles = ent.oracle_sql()
    assert len(qs) == len(set(qs))
    unknown = [k for k in oracles if k not in qs]
    assert unknown == [], f"oracle_sql keys without queries(): {unknown}"
    front = qs[:50]
    rows_only_front = [q for q in front if q not in oracles]
    # Engine-internal sketches (Spark-native HLL / Greenwald-Khanna)
    # and the learned BPE vocabulary are the only sanctioned rows-only
    # entries left after the round-14 md5-family + grid-KMeans +
    # nearest-centroid conversions — each has an oracle-green exact
    # twin and a bound pytest (see COVERAGE.md)
    assert set(rows_only_front) <= {
        "a1_approx_distinct", "a1_approx_percentile", "t_bpe_tokens",
    }, f"unexpected rows-only queries in the verified window: {rows_only_front}"


def test_global_shuffle_is_a_permutation(docs):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        global_shuffle,
    )

    out = global_shuffle(docs.select("doc_id"), "doc_id", n_shards=8).cache()
    n = docs.count()
    # lossless: every doc appears once, with a unique (shard, pos) slot
    assert out.count() == n
    assert out.select("shard", "shard_pos").distinct().count() == n
    # positions are dense 0..k-1 within every shard
    bad = (
        out.groupBy("shard")
        .agg(
            F.count("*").alias("k"),
            F.min("shard_pos").alias("lo"),
            F.max("shard_pos").alias("hi"),
        )
        .filter((F.col("lo") != 0) | (F.col("hi") != F.col("k") - 1))
    )
    assert bad.count() == 0
    # shards are hash-balanced: no shard more than 2x the mean
    sizes = [r.k for r in out.groupBy("shard").agg(F.count("*").alias("k")).collect()]
    assert max(sizes) <= 2 * (n / len(sizes))
    out.unpersist()


def test_global_shuffle_deterministic_and_seed_sensitive(docs):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        global_shuffle,
    )

    d = docs.select("doc_id").limit(200)
    a = {(r.doc_id): (r.shard, r.shard_pos)
         for r in global_shuffle(d, "doc_id", 4, seed=1).collect()}
    b = {(r.doc_id): (r.shard, r.shard_pos)
         for r in global_shuffle(d, "doc_id", 4, seed=1).collect()}
    c = {(r.doc_id): (r.shard, r.shard_pos)
         for r in global_shuffle(d, "doc_id", 4, seed=2).collect()}
    assert a == b  # replayable
    assert a != c  # seed draws a fresh permutation


def test_global_shuffle_actually_shuffles(docs):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        global_shuffle,
    )

    # within a shard, hash order must decorrelate from source order:
    # adjacent doc_ids should rarely be adjacent in shard positions
    out = global_shuffle(docs.select("doc_id"), "doc_id", n_shards=1)
    rows = sorted(
        ((r.shard_pos, r.doc_id) for r in out.collect())
    )
    seq = [doc for _, doc in rows]
    adjacent = sum(1 for x, y in zip(seq, seq[1:]) if abs(x - y) == 1)
    assert adjacent < len(seq) * 0.05


def test_global_shuffle_rejects_bad_shards(docs):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        global_shuffle,
    )

    with pytest.raises(ValueError, match="n_shards"):
        global_shuffle(docs, "doc_id", 0)


def test_export_shards_layout_and_order(docs, tmp_path):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        export_shards,
        global_shuffle,
    )

    spark = docs.sparkSession
    path = str(tmp_path / "shards")
    export_shards(docs.select("doc_id", "n_chars"), path, "doc_id", n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    assert set(r.shard for r in back.select("shard").distinct().collect()) == {0, 1, 2, 3}
    # a sequential read of one shard partition sees shard_pos order
    # (file order == row-group order for a single sorted write)
    one = spark.read.parquet(path + "/shard=2").select("shard_pos").collect()
    seq = [r.shard_pos for r in one]
    assert seq == sorted(seq)
    # layout is exactly the global_shuffle assignment
    want = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in global_shuffle(
            docs.select("doc_id"), "doc_id", 4
        ).collect()
    }
    got = {(r.doc_id, r.shard, r.shard_pos) for r in back.select(
        "doc_id", "shard", "shard_pos").collect()}
    assert got == want


def test_weighted_sample_is_deterministic_and_sized(docs):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        weighted_sample,
    )

    d = docs.select("doc_id", "n_chars")
    a = sorted(r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 50).collect())
    b = sorted(r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 50).collect())
    c = sorted(r.doc_id for r in weighted_sample(d, "doc_id", "n_chars", 50, seed=7).collect())
    assert len(a) == 50 and a == b
    assert a != c  # fresh seed, fresh sample


def test_weighted_sample_prefers_heavy_rows(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        weighted_sample,
    )

    # 100 light rows (w=1) vs 100 heavy rows (w=50): a 50-sample should
    # be dominated by heavy rows (each heavy ~50x more likely per draw)
    rows = [(i, 1.0) for i in range(100)] + [(100 + i, 50.0) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, w double")
    got = [r.id for r in weighted_sample(df, "id", "w", 50).collect()]
    heavy = sum(1 for i in got if i >= 100)
    assert heavy >= 40


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        weighted_sample,
    )

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None)], "id long, w double"
    )
    got = [r.id for r in weighted_sample(df, "id", "w", 10).collect()]
    assert got == [1]


def test_export_shards_jsonl_matches_parquet_layout(docs, tmp_path):
    """JSONL export (the LLM-stack interchange format) must carry the
    identical shard assignment and in-file ordering as the parquet
    layout, and reject unknown formats."""
    import json as _json
    import glob as _glob

    import pytest as _pytest

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        export_shards,
        global_shuffle,
    )

    spark = docs.sparkSession
    path = str(tmp_path / "jsonl_shards")
    export_shards(
        docs.select("doc_id", "n_chars"), path, "doc_id", n_shards=4,
        format="json", compression="gzip",
    )
    back = spark.read.json(path)
    assert back.count() == docs.count()
    want = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in global_shuffle(docs.select("doc_id"), "doc_id", 4).collect()
    }
    got = {
        (r.doc_id, r.shard, r.shard_pos)
        for r in back.select("doc_id", "shard", "shard_pos").collect()
    }
    assert got == want
    # the raw JSONL bytes of one shard stream in shard_pos order
    import gzip as _gzip

    files = sorted(_glob.glob(path + "/shard=1/*.json.gz"))
    assert files, "expected gzip JSONL part files"
    seq = []
    for f in files:
        with _gzip.open(f, "rt") as fh:
            seq.extend(_json.loads(line)["shard_pos"] for line in fh)
    assert seq == sorted(seq)
    with _pytest.raises(ValueError, match="unknown export format"):
        export_shards(docs, path, "doc_id", 4, format="csv")


def test_percentile_buckets_matches_rank_based_deciles(spark):
    """Value-based quantile bucketing: thresholds are exact percentiles,
    boundary-equal values share a bucket, NULLs land in bucket 1, and
    for all-distinct values the population matches NTILE's within the
    tie-free guarantee."""
    import pytest as _pytest

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        percentile_buckets,
    )

    rows = [(i, float(i)) for i in range(1, 101)] + [(999, None)]
    df = spark.createDataFrame(rows, "id long, v double")
    out = percentile_buckets(df, "v", n_buckets=4, out_col="q")
    got = {r.id: r.q for r in out.collect()}
    # thresholds of 1..100 at [.25,.5,.75] = 25.75, 50.5, 75.25
    assert got[25] == 1 and got[26] == 2 and got[50] == 2
    assert got[51] == 3 and got[75] == 3 and got[76] == 4 and got[100] == 4
    assert got[999] == 1  # NULL -> bucket 1 (documented)
    # ties on the boundary share a bucket (value-based, not row-based)
    tie = spark.createDataFrame(
        [(i, 1.0) for i in range(6)] + [(9, 2.0), (10, 3.0)], "id long, v double"
    )
    tb = {r.id: r.q for r in percentile_buckets(tie, "v", 2, "q").collect()}
    assert len({tb[i] for i in range(6)}) == 1
    with _pytest.raises(ValueError, match="n_buckets"):
        percentile_buckets(df, "v", n_buckets=1)


def test_bm25_ranks_rarer_terms_higher(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        bm25_topk,
    )

    rows = [
        (1, "rare common common filler filler"),
        (2, "common filler filler filler filler"),
        (3, "rare rare common filler filler"),
        (4, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, ["rare", "common"], k=4).collect()
    ids = [r.doc_id for r in out]
    # doc 3 (two 'rare' hits) beats doc 1 (one of each) beats doc 2
    # (only the frequent term); doc 4 never matches
    assert ids[:3] == [3, 1, 2] and 4 not in ids
    assert all(out[i].bm25 >= out[i + 1].bm25 for i in range(len(out) - 1))


def test_bm25_conjunctive_is_subset_with_identical_scores(spark):
    """require_all_terms=True keeps exactly the docs matching EVERY
    query term, with scores unchanged from the disjunctive ranking —
    in both the single-query and batch forms."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        bm25_topk,
        bm25_topk_queries,
    )

    rows = [
        (1, "rare common common filler filler"),
        (2, "common filler filler filler filler"),
        (3, "rare rare common filler filler"),
        (4, "nothing relevant here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    disj = {r.doc_id: r.bm25 for r in bm25_topk(df, ["rare", "common"], k=4).collect()}
    conj = {
        r.doc_id: r.bm25
        for r in bm25_topk(
            df, ["rare", "common"], k=4, require_all_terms=True
        ).collect()
    }
    # only docs 1 and 3 contain both terms; scores identical to disjunctive
    assert set(conj) == {1, 3}
    assert set(conj) < set(disj)
    assert all(conj[d] == disj[d] for d in conj)

    # batch form: per-query AND against each query's own term set
    q = spark.createDataFrame(
        [(1, "rare"), (1, "common"), (2, "common")], "query_id int, term string"
    )
    got = {}
    for r in bm25_topk_queries(df, q, k=4, require_all_terms=True).collect():
        got.setdefault(r.query_id, set()).add(r.doc_id)
    assert got == {1: {1, 3}, 2: {1, 2, 3}}


def test_funnel_counts_requires_strict_order(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.windows import (
        funnel_counts,
    )
    import pytest as _pytest

    rows = [
        # user 1: full ordered funnel
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 10:05:00"),
        (1, "purchase", "2024-01-01 10:10:00"),
        # user 2: clicks BEFORE viewing -> stops at view
        (2, "click", "2024-01-01 09:00:00"),
        (2, "view", "2024-01-01 09:30:00"),
        # user 3: view+click, no purchase
        (3, "view", "2024-01-01 08:00:00"),
        (3, "click", "2024-01-01 08:01:00"),
        # user 4: purchase only -> counted nowhere
        (4, "purchase", "2024-01-01 07:00:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r.step: r for r in funnel_counts(
        ev, ["view", "click", "purchase"]).collect()}
    assert out["view"].n_users == 3
    assert out["click"].n_users == 2      # users 1 and 3 (user 2 out of order)
    assert out["purchase"].n_users == 1   # user 1
    assert out["view"].conversion_rate == 1.0
    assert out["click"].conversion_rate == round(2 / 3, 6)
    assert out["purchase"].conversion_rate == 0.5
    with _pytest.raises(ValueError, match="non-empty"):
        funnel_counts(ev, [])


def test_weighted_sample_per_group_matches_global_within_group(spark):
    """Per-group selection equals running the global sampler on each
    group alone (same priorities, same tiebreak), and caps at k per
    group."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        weighted_sample,
        weighted_sample_per_group,
    )

    rows = [(i, "g" + str(i % 3), float(1 + i % 7)) for i in range(90)]
    rows += [(900, "g0", None), (901, "g1", 0.0)]  # excluded weights
    df = spark.createDataFrame(rows, "id long, grp string, w double")
    out = weighted_sample_per_group(df, ["grp"], "id", "w", k=5)
    got = {}
    for r in out.collect():
        got.setdefault(r.grp, set()).add(r.id)
    assert all(len(v) == 5 for v in got.values()) and len(got) == 3
    assert 900 not in got["g0"] and 901 not in got["g1"]
    for g in ("g0", "g1", "g2"):
        solo = {
            r.id
            for r in weighted_sample(
                df.filter(F.col("grp") == g), "id", "w", k=5
            ).collect()
        }
        assert solo == got[g]


def test_percentile_buckets_multi_matches_single(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        percentile_buckets,
        percentile_buckets_multi,
    )

    rows = [(i, float(i % 17), float((i * 3) % 11)) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, a double, b double")
    multi = percentile_buckets_multi(df, {"a": (4, "qa"), "b": (5, "qb")})
    sa = percentile_buckets(df, "a", 4, "qa").select("id", "qa")
    sb = percentile_buckets(df, "b", 5, "qb").select("id", "qb")
    want = {
        r.id: (r.qa, r.qb)
        for r in sa.join(sb, "id").collect()
    }
    got = {r.id: (r.qa, r.qb) for r in multi.collect()}
    assert got == want


def test_bm25_batch_matches_single_query_form(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import (
        bm25_topk,
        bm25_topk_queries,
    )

    rows = [
        (1, "rare common common filler filler"),
        (2, "common filler filler filler filler"),
        (3, "rare rare common filler filler"),
        (4, "other words entirely different here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = spark.createDataFrame(
        [(1, "rare"), (1, "common"), (2, "other")], "query_id int, term string"
    )
    batch = {}
    for r in bm25_topk_queries(df, q, k=4).collect():
        batch.setdefault(r.query_id, {})[r.doc_id] = r.bm25
    for qid, terms in ((1, ["rare", "common"]), (2, ["other"])):
        single = {r.doc_id: r.bm25 for r in bm25_topk(df, terms, k=4).collect()}
        assert batch[qid] == single


def test_target_encode_smoothing_shrinks_rare_categories(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.features import (
        target_encode,
    )

    rows = [("big", 10.0)] * 100 + [("rare", 100.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {
        r.c: r.c_te
        for r in target_encode(df, "c", "y", smoothing=10.0)
        .select("c", F.col("c_te"))
        .distinct()
        .collect()
    }
    g = (100 * 10.0 + 100.0) / 101  # global mean ≈ 10.89
    # rare (n=1) shrinks almost to the global mean; big barely moves
    assert abs(out["rare"] - (1 * 100.0 + 10 * g) / 11) < 1e-6
    assert abs(out["big"] - (100 * 10.0 + 10 * g) / 110) < 1e-6
    assert out["rare"] < 100.0 and out["rare"] > g


def test_target_encode_null_category_gets_its_own_encoding(spark):
    """The NULL-category level must encode like any other level (the
    docstring's promise): groupBy keeps NULL as a group, and the
    eqNullSafe join-back must match it — a null-unsafe equality would
    silently leave NULL-category rows with a NULL encoding."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.features import (
        target_encode,
    )

    rows = [("a", 10.0), ("a", 20.0), (None, 50.0), (None, 70.0)]
    df = spark.createDataFrame(rows, "c string, y double")
    out = {
        r.c: r.c_te
        for r in target_encode(df, "c", "y", smoothing=2.0)
        .select("c", "c_te")
        .distinct()
        .collect()
    }
    g = (10.0 + 20.0 + 50.0 + 70.0) / 4  # 37.5
    expect_null = (2 * 60.0 + 2.0 * g) / (2 + 2.0)
    expect_a = (2 * 15.0 + 2.0 * g) / (2 + 2.0)
    assert out[None] is not None, "NULL category fell out of the join-back"
    assert abs(out[None] - expect_null) < 1e-6
    assert abs(out["a"] - expect_a) < 1e-6
    # row count unchanged: the broadcast join-back is 1:1
    assert target_encode(df, "c", "y").count() == 4


def test_scaling_guards_degenerate_groups(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.features import (
        minmax_scale,
        zscore_scale,
    )

    rows = [("a", 1.0), ("a", 3.0), ("const", 5.0), ("const", 5.0)]
    df = spark.createDataFrame(rows, "g string, x double")
    out = {
        (r.g, r.x): (r.x_z, r.x_mm)
        for r in minmax_scale(
            zscore_scale(df, ["x"], by=["g"]), ["x"], by=["g"]
        ).collect()
    }
    assert out[("a", 1.0)] == (-1.0, 0.0)
    assert out[("a", 3.0)] == (1.0, 1.0)
    # zero-variance group: NULL, never ±inf/NaN
    assert out[("const", 5.0)] == (None, None)


def test_one_hot_bounded_and_null_safe(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.features import (
        one_hot,
    )

    rows = [(1, "x"), (2, "x"), (3, "y"), (4, "z"), (5, None)]
    df = spark.createDataFrame(rows, "id int, c string")
    out = {r.id: r.asDict() for r in one_hot(df, "c", top_k=2).collect()}
    # top-2 by count (x), tie y<z by value -> columns x and y only
    cols = {k for k in out[1] if "_oh_" in k}
    assert cols == {"c_oh_x", "c_oh_y", "c_oh_other"}
    assert (out[1]["c_oh_x"], out[1]["c_oh_other"]) == (1, 0)
    assert (out[4]["c_oh_x"], out[4]["c_oh_y"], out[4]["c_oh_other"]) == (0, 0, 1)
    # NULL category: all indicators 0, other 1 (never NULL)
    assert (out[5]["c_oh_x"], out[5]["c_oh_y"], out[5]["c_oh_other"]) == (0, 0, 1)


def test_one_hot_sanitized_name_collisions_get_rank_suffix(spark):
    """Distinct category values whose sanitized names collide ('A' vs
    'a', 'a b' vs 'a_b') must each keep an indicator — the later one
    takes a frequency-rank suffix instead of silently overwriting."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.features import (
        one_hot,
    )

    rows = [(1, "A"), (2, "A"), (3, "a"), (4, "a b"), (5, "a_b"), (6, "a_b")]
    df = spark.createDataFrame(rows, "id int, c string")
    out = {r.id: r.asDict() for r in one_hot(df, "c", top_k=4).collect()}
    cols = sorted(k for k in out[1] if "_oh_" in k)
    # a LITERAL value that sanitizes to an already-generated suffixed
    # name must not overwrite it either: 'a 2'(x3) -> a_2; 'A'(x2) -> a;
    # 'a'(x1) -> collides with 'a' AND the generated 'a_2' -> a_3
    tricky = spark.createDataFrame(
        [(1, "a 2"), (2, "a 2"), (3, "a 2"), (4, "A"), (5, "A"), (6, "a")],
        "id int, c string",
    )
    t_out = {r.id: r.asDict() for r in one_hot(tricky, "c", top_k=3).collect()}
    t_cols = sorted(k for k in t_out[1] if "_oh_" in k and k != "c_oh_other")
    assert len(t_cols) == 3 and len(set(t_cols)) == 3, t_cols
    for rid, val in ((1, "a 2"), (4, "A"), (6, "a")):
        hits = [k for k, v in t_out[rid].items()
                if "_oh_" in k and k != "c_oh_other" and v == 1]
        assert len(hits) == 1, (val, hits)
    # three distinct values -> three distinct indicator columns hit
    assert len({
        [k for k, v in t_out[rid].items()
         if "_oh_" in k and k != "c_oh_other" and v == 1][0]
        for rid in (1, 4, 6)
    }) == 3
    # 'A'(n=2) -> c_oh_a; 'a_b'(n=2) -> c_oh_a_b; 'a'(n=1, later rank)
    # -> c_oh_a_2; 'a b'(n=1, ties broken by value, 'a b' < 'a_b' ...
    # actually 'a b' sorts before 'a_b') -> collision suffix on a_b
    assert len(cols) == 5  # 4 indicators + other
    assert len(set(cols)) == 5, f"collided indicator names: {cols}"
    # every category hits exactly one indicator; none overwritten
    for rid in (1, 3, 4, 5):
        hits = sum(v for k, v in out[rid].items() if "_oh_" in k and k != "c_oh_other")
        assert hits == 1, f"row {rid} hit {hits} indicators"
    # distinct values keep distinct indicator columns
    hit_cols = {
        rid: [k for k, v in out[rid].items() if "_oh_" in k and v == 1][0]
        for rid in (1, 3, 4, 5)
    }
    assert len(set(hit_cols.values())) == 4, hit_cols


@pytest.mark.slow
def test_cluster_split_survives_deep_chain(spark):
    """Adversarial pair graph: one 3,000-link CHAIN (diameter far past
    label propagation's round budget). The star default must still
    produce ONE cluster in ONE split — a split chain would put
    near-duplicates of test docs into train, the exact leakage this
    operator exists to prevent; label propagation at max_iter=20 only
    warns and returns the split labels (why it is no longer the
    default here)."""
    import warnings

    from pyspark.sql import functions as F

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        cluster_split,
    )

    n = 3000
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    out = cluster_split(ids, "doc_id", chain)
    groups = out.groupBy("cluster_id", "split").count().collect()
    assert len(groups) == 1 and groups[0]["count"] == n
    assert groups[0]["cluster_id"] == 0

    # the label path on the same graph does NOT converge: it warns and
    # returns split components — documented, which is why cluster_split
    # defaults to star
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        lbl = cluster_split(ids, "doc_id", chain, algorithm="label")
        n_clusters = lbl.select("cluster_id").distinct().count()
    assert n_clusters > 1
    assert any("did not converge" in str(w.message) for w in caught)


def test_robots_rules_and_allowed(spark):
    """RFC 9309: group selection (specific shadows '*', multi-agent
    groups), longest-match with allow-wins ties, comments stripped,
    '*' wildcard rules applied (round 11 — previously dropped),
    empty Disallow = allow-all, unknown domains allowed."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        robots_allowed,
        robots_rules,
    )

    robots_a = (
        "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
        "Disallow: /tmp*\n# note\nUser-agent: gptbot\nDisallow: /\n"
    )
    robots_b = "User-agent: badbot\nUser-agent: gptbot\nDisallow: /blocked\n"
    robots_c = "User-agent: *\nDisallow:\n"
    dom = spark.createDataFrame(
        [("a.com", robots_a), ("b.com", robots_b), ("c.com", robots_c)],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [
            ("http://a.com/public/x",),
            ("http://a.com/private/secret",),
            ("http://a.com/private/ok/y",),
            ("http://a.com/tmp/z",),
            ("http://b.com/blocked/z",),
            ("http://b.com/open",),
            ("http://c.com/anything",),
            ("http://d.com/no/robots",),
        ],
        "url string",
    )
    # default agent '*': a.com star group applies; b.com has no '*'
    star = {
        r["url"]: r["crawl_allowed"]
        for r in robots_allowed(urls, robots_rules(dom)).collect()
    }
    assert star["http://a.com/public/x"] is True
    assert star["http://a.com/private/secret"] is False
    assert star["http://a.com/private/ok/y"] is True  # longest match allows
    assert star["http://a.com/tmp/z"] is False  # '/tmp*' wildcard applies
    assert star["http://b.com/blocked/z"] is True  # no '*' group on b
    assert star["http://c.com/anything"] is True  # empty Disallow
    assert star["http://d.com/no/robots"] is True
    # gptbot: a.com specific group (Disallow /) SHADOWS the '*' group
    bot = {
        r["url"]: r["crawl_allowed"]
        for r in robots_allowed(urls, robots_rules(dom, agent="gptbot")).collect()
    }
    assert bot["http://a.com/public/x"] is False
    assert bot["http://a.com/private/ok/y"] is False
    assert bot["http://b.com/blocked/z"] is False  # multi-agent group
    assert bot["http://b.com/open"] is True


def test_robots_edge_semantics(spark):
    """Seventh-review regressions: query-no-path URLs and explicit
    default ports cannot bypass rules; mixed-case rule domains match;
    duplicate URL rows keep their cardinality; an empty specific group
    SHADOWS '*' (unrestricted, per RFC 9309); a blank line inside a
    User-agent run does not split the group."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        robots_allowed,
        robots_rules,
    )

    dom = spark.createDataFrame(
        [
            ("A.com", "User-agent: *\nDisallow: /\n"),
            ("b.com",
             "User-agent: gptbot\nCrawl-delay: 5\nUser-agent: *\nDisallow: /\n"),
            ("c.com", "User-agent: a\n\nUser-agent: b\nDisallow: /x\n"),
        ],
        "domain string, robots_txt string",
    )
    urls = spark.createDataFrame(
        [("http://a.com?p=1",), ("http://A.COM:80/any",), ("http://a.com/q",),
         ("http://a.com/q",)],
        "url string",
    )
    out = robots_allowed(urls, robots_rules(dom)).collect()
    assert len(out) == 4  # duplicate row cardinality preserved
    assert all(r["crawl_allowed"] is False for r in out)
    # empty specific group shadows '*': gptbot unrestricted on b.com
    bot = robots_allowed(
        spark.createDataFrame([("http://b.com/page",)], "url string"),
        robots_rules(dom, agent="gptbot"),
    ).first()
    assert bot["crawl_allowed"] is True
    # blank line inside the UA run: agent 'a' shares b's Disallow
    a_rules = robots_rules(dom, agent="a")
    ra = robots_allowed(
        spark.createDataFrame([("http://c.com/x/1",)], "url string"), a_rules
    ).first()
    assert ra["crawl_allowed"] is False


def test_robots_wildcard_semantics(spark):
    """RFC 9309 wildcard matching (round 11): '*' spans any octets,
    trailing '$' anchors the path end, mid-pattern '$' is literal,
    regex metachars in patterns are escaped (.zip must not match
    xzip), and specificity = raw pattern length so a long wildcard
    Disallow beats a shorter literal Allow."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        robots_allowed,
        robots_rules,
    )

    robots = (
        "User-agent: *\n"
        "Disallow: /p/*.zip$\n"
        "Allow: /p\n"
        "Disallow: /dl*\n"
        "Disallow: /exact$\n"
        "Disallow: /lit$eral\n"
        "Disallow: *.png$\n"
    )
    dom = spark.createDataFrame(
        [("w.com", robots)], "domain string, robots_txt string"
    )
    cases = {
        "http://w.com/p/a/b.zip": False,   # '*' spans '/', '$' anchors
        "http://w.com/p/a/b.zip2": True,   # '$' anchor: not an end match
        "http://w.com/p/a/bxzip": True,    # '.' escaped: no regex dot
        "http://w.com/p/ok": True,         # literal Allow, no wildcard hit
        "http://w.com/dl": False,          # trailing '*' matches empty
        "http://w.com/dload/x": False,     # trailing '*' spans rest
        "http://w.com/exact": False,       # '$'-anchored exact path
        "http://w.com/exact/sub": True,    # anchored rule only hits exact
        "http://w.com/lit$eral/x": False,  # mid-pattern '$' is literal
        "http://w.com/img/i.png": False,   # leading '*' wildcard
    }
    urls = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_allowed(urls, robots_rules(dom)).collect()
    }
    assert got == cases
    rules = {
        (r["path_prefix"], r["pattern_re"])
        for r in robots_rules(dom).collect()
    }
    # literal rules keep a NULL pattern_re (startswith fast path)
    assert ("/p", None) in rules
    assert (r"/p/*.zip$", r"^/p/.*\.zip$") in rules


def test_robots_query_string_matching(spark):
    """RFC 9309 matches path+query (round-12 fix): the dominant
    real-world wildcard use — 'Disallow: /*?sessionid=' — must block
    '?sessionid='-bearing URLs, a '$'-anchored rule must NOT block the
    same path with a query appended, literal prefixes extend into the
    query string, and specificity counts octets (multi-byte UTF-8
    patterns beat shorter ASCII ones that tie on characters)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        robots_allowed,
        robots_rules,
    )

    robots = (
        "User-agent: *\n"
        "Disallow: /*?sessionid=\n"
        "Disallow: /fish.php$\n"
        "Disallow: /cgi?\n"
    )
    dom = spark.createDataFrame(
        [("q.com", robots)], "domain string, robots_txt string"
    )
    cases = {
        "http://q.com/page?sessionid=abc": False,  # wildcard sees query
        "http://q.com?sessionid=abc": False,       # query-no-path → /?q
        "http://q.com/page?other=1": True,
        "http://q.com/fish.php": False,            # '$' anchors bare path
        "http://q.com/fish.php?id=1": True,        # ...but not path+query
        "http://q.com/cgi?x=1": False,             # literal prefix w/ '?'
        "http://q.com/cgi": True,
    }
    urls = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {
        r["url"]: r["crawl_allowed"]
        for r in robots_allowed(urls, robots_rules(dom)).collect()
    }
    assert got == cases
    # octet specificity: 'Allow: /aé' (4 octets) outranks
    # 'Disallow: /ab?' (... equal chars); pin via a direct tie-break
    dom2 = spark.createDataFrame(
        [("o.com", "User-agent: *\nAllow: /aé\nDisallow: /aéb\n")],
        "domain string, robots_txt string",
    )
    r2 = robots_rules(dom2)
    lens = {r["path_prefix"]: r["spec_len"] for r in r2.collect()}
    assert lens["/aé"] == 4 and lens["/aéb"] == 5  # octets, not chars
    verdict = robots_allowed(
        spark.createDataFrame([("http://o.com/aéb",)], "url string"), r2
    ).first()
    assert verdict["crawl_allowed"] is False


def test_robots_directives_and_frontier_schedule(spark):
    """Round 12: Crawl-delay obeys the SAME group selection as rules
    (specific shadows '*' by existence — an empty specific group means
    NO delay), multiple delays take the min, junk values go NULL not
    crash; Sitemap lines are GLOBAL (bind to the file, not a group);
    frontier_schedule assigns deterministic per-domain serial slots
    with offsets = slot × delay, default delay for unknown domains,
    and priority-descending order when a priority column is given."""
    from pyspark.sql import functions as F

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        frontier_schedule,
        robots_directives,
    )

    dom = spark.createDataFrame(
        [
            ("a.com",
             "User-agent: bot\nCrawl-delay: 2\nUser-agent: *\n"
             "Crawl-delay: 10\nSitemap: http://A.com/s2.xml\n"
             "Disallow: /x\nSitemap: http://a.com/s1.xml\n"),
            ("b.com", "User-agent: *\nCrawl-delay: abc\n"),
            ("c.com",
             "User-agent: bot\nDisallow: /\nUser-agent: *\nCrawl-delay: 5\n"),
            ("d.com", "User-agent: *\nCrawl-delay: 3\nCrawl-delay: 1\n"),
            ("e.com", "# nothing\n"),
        ],
        "domain string, robots_txt string",
    )
    star = {
        r["domain"]: (r["crawl_delay"], r["sitemaps"])
        for r in robots_directives(dom).collect()
    }
    # sitemaps: global, case-preserved, sorted; '*' group delays
    assert star["a.com"] == (
        10.0, ["http://A.com/s2.xml", "http://a.com/s1.xml"]
    )
    assert star["b.com"] == (None, [])       # junk delay → NULL
    assert star["c.com"] == (5.0, [])
    assert star["d.com"] == (1.0, [])        # min of multiple
    assert star["e.com"] == (None, [])
    bot = {
        r["domain"]: r["crawl_delay"]
        for r in robots_directives(dom, agent="bot").collect()
    }
    assert bot["a.com"] == 2.0               # specific group's delay
    assert bot["c.com"] is None              # empty-of-delay group SHADOWS

    urls = spark.createDataFrame(
        [("http://a.com/z", 1), ("http://A.COM:80/a", 1),
         ("http://a.com/m", 9),              # higher priority first
         ("http://zz.com/1", 1), ("http://zz.com/0", 1)],
        "url string, prio int",
    )
    sched = {
        r["url"]: (r["fetch_domain"], r["fetch_slot"],
                   r["fetch_offset_seconds"])
        for r in frontier_schedule(
            urls, robots_directives(dom), priority_col="prio"
        ).collect()
    }
    # a.com delay 10; priority 9 wins slot 0, then url order; default
    # port + case fold into one politeness key
    assert sched["http://a.com/m"] == ("a.com", 0, 0.0)
    assert sched["http://A.COM:80/a"] == ("a.com", 1, 10.0)
    assert sched["http://a.com/z"] == ("a.com", 2, 20.0)
    # unknown domain: default_delay=1.0
    assert sched["http://zz.com/0"] == ("zz.com", 0, 0.0)
    assert sched["http://zz.com/1"] == ("zz.com", 1, 1.0)
    # no directives at all: every domain gets the default
    plain = frontier_schedule(urls.select("url"), default_delay=2.5)
    offs = {
        r["url"]: r["fetch_offset_seconds"] for r in plain.collect()
    }
    assert offs["http://a.com/z"] == 5.0     # slot 2 (url order) × 2.5
    # duplicate / case-variant directive rows must not multiply
    # frontier rows into conflicting slots (review fix: the join
    # aggregates by lowered domain, min delay wins)
    dup_dirs = spark.createDataFrame(
        [("a.com", 10.0), ("A.COM", 4.0), ("a.com", 10.0)],
        "domain string, crawl_delay double",
    )
    dup_out = frontier_schedule(urls.select("url"), dup_dirs)
    assert dup_out.count() == urls.count()
    a_rows = {
        r["fetch_slot"]: r["fetch_offset_seconds"]
        for r in dup_out.filter(F.col("fetch_domain") == "a.com").collect()
    }
    assert a_rows == {0: 0.0, 1: 4.0, 2: 8.0}  # min delay, dense slots
    # reserved output columns are refused loudly, not clobbered
    import pytest

    with pytest.raises(ValueError, match="frontier_schedule reserves"):
        frontier_schedule(
            urls.withColumnRenamed("prio", "fetch_slot")
        )


def test_dsir_importance_and_select(spark):
    """Round 12 (Xie et al., NeurIPS 2023): target-like documents must
    outscore off-target ones; the unigram+bigram path matches a pure-
    Python replay of the whole pipeline (tokenize → md5 bucket →
    Laplace distributions → log-ratio sum); empty documents score 0.0;
    Gumbel selection is deterministic across calls (md5-derived noise,
    no rand())."""
    import hashlib
    import math
    import re

    import pytest as pt

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        dsir_importance,
        dsir_select,
    )

    target = spark.createDataFrame(
        [(100, "alpha beta alpha gamma"), (101, "beta alpha beta")],
        "doc_id long, text string",
    )
    raw_rows = [
        (1, "alpha beta gamma alpha"),
        (2, "zeta eta theta iota"),
        (3, "alpha zeta beta eta"),
        (4, ""),
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["dsir_logw"]
        for r in dsir_importance(raw, target, bigrams=True).collect()
    }
    assert got[4] == 0.0
    assert got[1] > got[3] > got[2]  # target-like > mixed > off-target

    # pure-Python replay of the unigram+bigram pipeline
    B, a = 256, 1.0

    def feats(text):
        t = [x for x in re.split(r"\s+", text.lower().strip()) if x]
        return t + [f"{u} {v}" for u, v in zip(t, t[1:])]

    def bkt(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:4], 16) % B

    t_b = [bkt(f) for tx in
           ["alpha beta alpha gamma", "beta alpha beta"] for f in feats(tx)]
    r_b = [bkt(f) for _, tx in raw_rows for f in feats(tx)]
    tc = {b: t_b.count(b) for b in set(t_b)}
    rc = {b: r_b.count(b) for b in set(r_b)}
    T, R = len(t_b), len(r_b)

    def lr(b):
        return math.log((tc.get(b, 0) + a) / (T + a * B)) - math.log(
            (rc.get(b, 0) + a) / (R + a * B)
        )

    for did, tx in raw_rows:
        want = round(sum(lr(bkt(f)) for f in feats(tx)), 6) if tx else 0.0
        assert got[did] == pt.approx(want, abs=2e-6)

    # Gumbel selection: deterministic, k respected, same draw twice
    s1 = sorted(
        r["doc_id"]
        for r in dsir_select(raw, target, k=2, gumbel=True).collect()
    )
    s2 = sorted(
        r["doc_id"]
        for r in dsir_select(raw, target, k=2, gumbel=True).collect()
    )
    assert s1 == s2 and len(s1) == 2
    # exact mode: top-k by weight then id (same feature space as `got`)
    exact = [
        r["doc_id"]
        for r in dsir_select(raw, target, k=2, bigrams=True).collect()
    ]
    ranked = sorted(got, key=lambda d: (-got[d], d))[:2]
    assert sorted(exact) == sorted(ranked)


def test_parse_sitemaps(spark):
    """Round 12: <urlset> pages come back kind='url' with XML entities
    decoded and whitespace trimmed; <sitemapindex> children come back
    kind='sitemap' (not recursed); namespace prefixes are accepted;
    malformed XML degrades to zero rows instead of throwing (the
    untrusted-input contract Spark's xpath cannot honor)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        parse_sitemaps,
    )

    urlset = (
        '<?xml version="1.0"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc> http://a.com/p?x=1&amp;y=2 </loc>"
        "<lastmod>2024-01-01</lastmod></url>"
        "<url><loc>http://a.com/&quot;q&quot;</loc></url></urlset>"
    )
    index = (
        "<sm:sitemapindex xmlns:sm='x'>"
        "<sm:sitemap><sm:loc>http://a.com/sub.xml</sm:loc></sm:sitemap>"
        "</sm:sitemapindex>"
    )
    df = spark.createDataFrame(
        [(1, urlset), (2, index), (3, "<bad"), (4, None)],
        "id int, sitemap_xml string",
    )
    rows = {(r["id"], r["loc"], r["kind"]) for r in parse_sitemaps(df).collect()}
    assert rows == {
        (1, "http://a.com/p?x=1&y=2", "url"),
        (1, 'http://a.com/"q"', "url"),
        (2, "http://a.com/sub.xml", "sitemap"),
    }
    assert "sitemap_xml" not in parse_sitemaps(df).columns


def test_robots_allowed_caller_column_safety(spark):
    """Round-11 hardening: map-typed caller columns survive (the
    verdict aggregates on the row id alone, caller columns ride a
    first(struct)), caller columns named like rule columns don't
    collide, and the reserved '__rb_' prefix is refused loudly."""
    import pytest

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        robots_allowed,
        robots_rules,
    )

    dom = spark.createDataFrame(
        [("m.com", "User-agent: *\nDisallow: /x\n")],
        "domain string, robots_txt string",
    )
    rules = robots_rules(dom)
    urls = spark.createDataFrame(
        [("http://m.com/x/1", {"k": "v"}, "callerdir"),
         ("http://m.com/ok", {"k2": "v2"}, "callerdir2")],
        "url string, meta map<string,string>, directive string",
    )
    out = {
        r["url"]: (r["crawl_allowed"], r["meta"], r["directive"])
        for r in robots_allowed(urls, rules).collect()
    }
    assert out["http://m.com/x/1"] == (False, {"k": "v"}, "callerdir")
    assert out["http://m.com/ok"] == (True, {"k2": "v2"}, "callerdir2")
    bad = spark.createDataFrame([("u", 1)], "url string, __rb_rid int")
    with pytest.raises(ValueError, match="__rb_"):
        robots_allowed(bad, rules)


@pytest.mark.slow
def test_crawl_tick_standing_state_and_replay(spark):
    """Round 14: the end-to-end crawl tick (discover -> canonicalize ->
    robots -> seen-set probe -> fetch-sim -> politeness schedule ->
    land) over THREE ticks of standing state, then crash-redelivery of
    the latest tick.

    Pinned behaviors: sitemapindex children are never scheduled; the
    canonicalizer folds case/fragment/entity variants into one seen-set
    key; robots-disallowed URLs neither schedule nor enter the seen set
    (tick 3 can fetch a URL tick 1 was blocked from only if rules
    change — here the block persists); cross-tick URL repeats drop
    against the seen set while per-domain slots CONTINUE the counters;
    within-tick duplicates keep the min order_col; re-firing the latest
    tick leaves fetched/seen/state byte-identical (re-firing an OLD
    tick is documented as outside the contract)."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        crawl_tick,
    )

    tables = ("ctk_seen", "ctk_state", "ctk_fetched")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    robots = spark.createDataFrame(
        [
            ("d0.example.com", "User-agent: *\nDisallow: /p1\nCrawl-delay: 2\n"),
            ("d1.example.com", "User-agent: *\n"),
        ],
        "domain string, robots_txt string",
    )
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, sitemap_xml string"
    )

    def xml(k, leaf):
        # uppercase host + fragment + escaped & — all folded away by
        # canonicalize_url before the seen-set and politeness keys
        return (
            f"<urlset><url><loc>HTTP://D{k}.example.com/p{leaf}"
            f"?a=1&amp;b=2#f</loc></url></urlset>"
        )

    kw = dict(
        seen_table="ctk_seen", frontier_state_table="ctk_state",
        fetched_table="ctk_fetched", robots_df=robots,
    )
    # tick 0: d0/p0 ok, d0/p1 robots-blocked, d1/p0 ok, one child
    # sitemap (never scheduled)
    child = (
        "<sitemapindex><sitemap><loc>http://d0.example.com/sm.xml"
        "</loc></sitemap></sitemapindex>"
    )
    r0 = crawl_tick(
        spark, mk([(1, xml(0, 0)), (2, xml(0, 1)), (3, xml(1, 0)), (4, child)]),
        0, **kw,
    )
    got0 = sorted(
        (r["doc_id"], r["url"], r["fetch_slot"], r["fetch_offset_seconds"])
        for r in r0.collect()
    )
    assert got0 == [
        (1, "http://d0.example.com/p0?a=1&b=2", 0, 0.0),
        (3, "http://d1.example.com/p0?a=1&b=2", 0, 0.0),
    ]
    # tick 1: p0 repeats drop on both domains; new p2/p1 slots CONTINUE
    # (d0 slot 1 x delay 2 = 2.0; d1 slot 1 x default 1.0)
    r1 = crawl_tick(
        spark,
        mk([(5, xml(0, 0)), (6, xml(0, 2)), (7, xml(1, 0)), (8, xml(1, 1))]),
        1, **kw,
    )
    got1 = sorted(
        (r["doc_id"], r["url"], r["fetch_slot"], r["fetch_offset_seconds"])
        for r in r1.collect()
    )
    assert got1 == [
        (6, "http://d0.example.com/p2?a=1&b=2", 1, 2.0),
        (8, "http://d1.example.com/p1?a=1&b=2", 1, 1.0),
    ]
    # tick 2: within-tick duplicate — min doc_id survives, one slot
    b2 = [(10, xml(1, 2)), (9, xml(1, 2))]
    r2 = crawl_tick(spark, mk(b2), 2, **kw)
    assert [
        (r["doc_id"], r["fetch_slot"]) for r in r2.collect()
    ] == [(9, 2)]
    # fetch-sim pair present and deterministic (md5 of canonical url)
    row = r2.first()
    assert row["sim_status"] == 200 and len(row["sim_fp"]) == 32
    # crash-redelivery: re-fire the LATEST tick twice — fetched, seen
    # and state must stay byte-identical each time
    snap = lambda t: sorted(map(str, spark.table(t).collect()))  # noqa: E731
    before = {t: snap(t) for t in tables}
    for _ in range(2):
        crawl_tick(spark, mk(b2), 2, **kw)
        for t in tables:
            assert snap(t) == before[t], t
    # the robots block persisted across all ticks: p1 on d0 was never
    # fetched and never entered the seen set
    fetched_urls = {
        r["url"] for r in spark.table("ctk_fetched").collect()
    }
    assert "http://d0.example.com/p1?a=1&b=2" not in fetched_urls
    assert spark.table("ctk_seen").count() == 5  # p0,p2 on d0; p0,p1,p2 on d1
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_crawl_tick_empty_first_tick_returns_empty_frame(spark):
    """Round-14 edge: a first tick whose every candidate is
    robots-blocked (or loc-less) lands nothing, so the sink table does
    not exist yet — crawl_tick must return an empty frame with the
    landed schema instead of throwing TABLE_OR_VIEW_NOT_FOUND, and a
    later productive tick must still land normally with slot 0."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
        crawl_tick,
    )

    tables = ("cte_seen", "cte_state", "cte_fetched")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    robots = spark.createDataFrame(
        [("d0.example.com", "User-agent: *\nDisallow: /\n")],
        "domain string, robots_txt string",
    )
    kw = dict(
        seen_table="cte_seen", frontier_state_table="cte_state",
        fetched_table="cte_fetched", robots_df=robots,
    )
    blocked = spark.createDataFrame(
        [(1, "<urlset><url><loc>http://d0.example.com/x</loc></url></urlset>")],
        "doc_id long, sitemap_xml string",
    )
    r0 = crawl_tick(spark, blocked, 0, **kw)
    assert r0.count() == 0
    assert set(r0.columns) == {
        "doc_id", "url", "sim_fp", "sim_status", "fetch_domain",
        "fetch_slot", "fetch_offset_seconds", "_batch_id",
    }
    assert not spark.catalog.tableExists("cte_fetched")
    # a later productive tick lands with a fresh slot counter
    ok = spark.createDataFrame(
        [(2, "<urlset><url><loc>http://d1.example.com/y</loc></url></urlset>")],
        "doc_id long, sitemap_xml string",
    )
    r1 = crawl_tick(spark, ok, 1, **kw)
    rows = r1.collect()
    assert len(rows) == 1 and rows[0]["fetch_slot"] == 0
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
