"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship medallion-style query at sf0.001.
``queries()`` maps every implemented operator from SURVEY.md §2 to a
``(spark, sf_dir) -> DataFrame`` callable; ``oracle_sql()`` gives the
DuckDB-equivalent ANSI SQL. Aliases are kept identical on both sides
(the driver sorts columns by name before value-hashing).

Determinism rules used throughout:
- every window/top-k has a total tie-break order;
- per-row float arithmetic (repairs, ratios) is bit-identical across
  engines, so it is left exact; cross-row float AGGREGATES are rounded
  on both sides to absorb summation-order differences;
- computed dates/timestamps are cast to strings on both sides so
  date-vs-timestamp representation differences can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark import functions as lf
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.text import LANG_MARKERS
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators import (
    dedupe_latest,
    scd2_close,
    star_join,
    surrogate_key,
    surrogate_key_two_phase,
)
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.multimodal import (
    attach_fake_blobs,
    decode_images,
    sample_frames,
)
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.similarity import (
    lsh_topk,
)
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load

SF0001 = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- flagship
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: dedup-latest + two broadcast left joins + surrogate key +
    CASE normalization over customer/orders/nation (SURVEY.md §7 step 1 —
    the dim_customers-gold shape on the driver star schema).
    """
    orders = load(spark, SF0001, "orders")
    customer = load(spark, SF0001, "customer")
    nation = load(spark, SF0001, "nation")

    latest = dedupe_latest(orders, ["o_custkey"], "o_orderdate", ["o_orderkey"])
    enriched = star_join(
        latest.alias("o"),
        [
            (customer.alias("c"), F.col("o.o_custkey") == F.col("c.c_custkey"), "left"),
            (nation.alias("n"), F.col("c.c_nationkey") == F.col("n.n_nationkey"), "left"),
        ],
    )
    keyed = surrogate_key(enriched, ["o_custkey"], "customer_key")
    return keyed.select(
        "customer_key",
        F.col("o_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("n_name").alias("nation_name"),
        lf.map_codes("o_orderstatus", {"O": "Open", "F": "Fulfilled", "P": "Pending"}).alias(
            "last_order_status"
        ),
        F.col("o_totalprice").alias("last_order_total"),
    )


# ---------------------------------------------------------------- helpers
def _sql_lang_score(lang: str) -> str:
    terms = [
        f"(CASE WHEN ' ' || lower(text) || ' ' LIKE '% {w} %' THEN 1 ELSE 0 END)"
        for w in LANG_MARKERS[lang]
    ]
    return "(" + " + ".join(terms) + ")"


def _sql_language_id() -> str:
    scores = {lang: _sql_lang_score(lang) for lang in LANG_MARKERS}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    whens = "".join(
        f" WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANG_MARKERS
    )
    return f"CASE WHEN {best} = 0 THEN 'und'{whens} ELSE 'und' END"


# ---------------------------------------------------------------- queries
# Scans / projections / filters ------------------------------------------


def _q_s5_parquet_scan(spark, sf_dir):
    return load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")


def _q_p1_projection(spark, sf_dir):
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name")


def _q_p2_projection_rename(spark, sf_dir):
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        F.col("c_name").alias("customer_name"),
        F.col("c_mktsegment").alias("segment"),
    )


def _q_p6_filter_eq(spark, sf_dir):
    return (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def _q_p8_compound_filter(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    cond = ((F.col("l_discount") >= 0.05) & (F.col("l_quantity") < 10)) | (
        F.col("l_returnflag") == "R"
    )
    return li.filter(cond).select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")


def _q_f8_isin(spark, sf_dir):
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
        .select("c_custkey", "c_mktsegment")
    )


# Scalar / cleansing rules ------------------------------------------------


def _q_f_trim_upper(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.trim(F.col("c_name")).alias("name_trim"),
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
    )


def _q_r3_map_codes(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        lf.map_codes("o_orderstatus", {"O": "Open", "F": "Fulfilled", "P": "Pending"}).alias(
            "status_label"
        ),
    )


def _q_r4_key_surgery(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        lf.strip_prefix("c_name", "Customer#").alias("cust_number"),
        lf.strip_chars(F.col("c_name"), "#").alias("name_nohash"),
        F.substring(F.col("c_name"), 1, 8).alias("name_head"),
        F.length(F.col("c_name")).cast("bigint").alias("name_len"),
        F.col("c_name").startswith("Customer#").cast("boolean").alias("is_prefixed"),
    )


def _q_r4_product_key_split(spark, sf_dir):
    # prd_key surgery analog: build a CC-CC-style composite key, then split
    # it into category id (first 5, - -> _) and product number (char 7+).
    p = load(spark, sf_dir, "part")
    composite = F.concat_ws(
        "-", F.substring("p_type", 1, 2), F.substring("p_brand", 1, 2), F.col("p_name")
    )
    return p.select(
        "p_partkey",
        composite.alias("composite_key"),
        lf.category_id_from_key(composite).alias("cat_id"),
        lf.product_number_from_key(composite).alias("product_number"),
    )


def _q_r5_coalesce_zero(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    nullable = F.when(F.col("l_orderkey") % 7 != 0, F.col("l_linenumber"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        lf.coalesce_zero(nullable).alias("linenumber_filled"),
    )


def _q_r7_int_date(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    as_int = F.date_format("o_orderdate", "yyyyMMdd").cast("int")
    dirty = (
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(0))
        .when(F.col("o_orderkey") % 101 == 0, F.lit(20231301))
        .otherwise(as_int)
    )
    return o.select(
        "o_orderkey",
        dirty.alias("order_dt_int"),
        lf.int_yyyymmdd_to_date(dirty).cast("string").alias("order_dt"),
    )


def _q_r8_recompute_amount(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice") / F.col("l_quantity")
    sales = (
        F.when(F.col("l_orderkey") % 13 == 0, F.lit(None).cast("double"))
        .when(F.col("l_orderkey") % 17 == 0, F.lit(-1.0))
        .when(F.col("l_orderkey") % 19 == 0, F.col("l_extendedprice") + 1.0)
        .otherwise(F.col("l_extendedprice"))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        sales.alias("sales_raw"),
        lf.recompute_amount(sales, F.col("l_quantity"), price).alias("sales_fixed"),
    )


def _q_r9_backfill_price(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    price = (
        F.when(F.col("l_orderkey") % 23 == 0, F.lit(None).cast("double"))
        .when(F.col("l_orderkey") % 29 == 0, F.lit(-5.0))
        .otherwise(F.col("l_extendedprice") / F.col("l_quantity"))
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        lf.backfill_unit_price(F.col("l_extendedprice"), F.col("l_quantity"), price).alias(
            "price_fixed"
        ),
    )


def _q_r10_null_if_future(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        lf.null_if_future(F.col("o_orderdate"), "1995-06-01")
        .cast("string")
        .alias("orderdate_capped"),
    )


def _q_r11_prefer_source(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    primary = (
        F.when(F.col("c_custkey") % 5 == 0, F.lit("n/a"))
        .when(F.col("c_custkey") % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
    )
    fallback = F.when(F.col("c_custkey") % 3 != 0, F.lower(F.col("c_mktsegment")))
    return c.select(
        "c_custkey", lf.prefer_source(primary, fallback).alias("segment_pref")
    )


def _q_f16_date_arith(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") - F.expr("INTERVAL 1 DAY")).cast("string").alias("prev_day"),
    )


# Windows -----------------------------------------------------------------


def _q_w1_dedup_latest(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    latest = dedupe_latest(o, ["o_custkey"], "o_orderdate", ["o_orderkey"])
    return latest.select(
        "o_custkey", "o_orderkey", F.col("o_orderdate").cast("string").alias("order_ts"), "o_totalprice"
    )


def _q_w2_surrogate_key(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return surrogate_key(c, ["c_custkey"], "customer_key").select("customer_key", "c_custkey")


def _q_w2_surrogate_two_phase(spark, sf_dir):
    c = load(spark, sf_dir, "customer")
    return surrogate_key_two_phase(c, ["c_custkey"], "customer_key").select(
        "customer_key", "c_custkey"
    )


def _q_w3_scd2_close(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    closed = scd2_close(o, ["o_custkey"], "o_orderdate", "version_end", tiebreakers=["o_orderkey"])
    return closed.select(
        "o_custkey", "o_orderkey", F.col("version_end").cast("string").alias("version_end")
    )


def _q_r12_current_rows(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    closed = scd2_close(o, ["o_custkey"], "o_orderdate", "version_end", tiebreakers=["o_orderkey"])
    return closed.filter(F.col("version_end").isNull()).select("o_custkey", "o_orderkey")


# Joins -------------------------------------------------------------------


def _q_j1_j2_enrich(spark, sf_dir):
    c = load(spark, sf_dir, "customer").alias("c")
    n = load(spark, sf_dir, "nation").alias("n")
    r = load(spark, sf_dir, "region").alias("r")
    out = star_join(
        c,
        [
            (n, F.col("c.c_nationkey") == F.col("n.n_nationkey"), "left"),
            (r, F.col("n.n_regionkey") == F.col("r.r_regionkey"), "left"),
        ],
    )
    return out.select(
        "c_custkey",
        "c_name",
        F.col("n_name").alias("nation_name"),
        F.col("r_name").alias("region_name"),
    )


def _q_j3_broadcast_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").alias("l")
    p = load(spark, sf_dir, "part").alias("p")
    out = star_join(li, [(p, F.col("l.l_partkey") == F.col("p.p_partkey"), "left")])
    return out.select("l_orderkey", "l_linenumber", F.col("p_name").alias("part_name"))


def _q_j4_j5_fact_join(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").alias("l")
    o = load(spark, sf_dir, "orders").alias("o")
    c = load(spark, sf_dir, "customer").alias("c")
    out = star_join(
        li,
        [
            (o, F.col("l.l_orderkey") == F.col("o.o_orderkey"), "left"),
            (c, F.col("o.o_custkey") == F.col("c.c_custkey"), "left"),
        ],
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.col("o_orderstatus").alias("order_status"),
        F.col("c_mktsegment").alias("segment"),
    )


# Aggregates / sort / limit / set ops ------------------------------------


def _q_a1_groupby_agg(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def _q_a1_rollup(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"), F.round(F.sum("l_quantity"), 2).alias("sum_qty")
    )


def _q_a1_count_distinct(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"), F.count("*").alias("n_orders")
    )


def _q_o1_topk(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_custkey"))
        .limit(10)
    )


def _q_o1_set_except(spark, sf_dir):
    o = load(spark, sf_dir, "orders")
    all_cust = o.select("o_custkey").distinct()
    f_cust = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return all_cust.subtract(f_cust)


def _q_o1_union(spark, sf_dir):
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


# Text analysis -----------------------------------------------------------


def _q_t_token_count(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        lf.token_count("text").alias("n_tokens"),
        lf.approx_bpe_token_count("text").alias("n_tokens_bpe"),
    )


def _q_t_quality_score(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", lf.quality_score("text").alias("quality"))


def _q_t_language_id(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", "lang", lf.language_id("text").alias("lang_guess"))


def _q_t_doc_fingerprint(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", lf.doc_fingerprint("text").alias("fp"))


def _q_t_exact_dedup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", lf.doc_fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# Vectors -----------------------------------------------------------------


def _q_v_l2_norm(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", F.round(lf.l2_norm("embedding"), 6).alias("norm"))


def _q_v_dot_product(spark, sf_dir):
    e1 = load(spark, sf_dir, "embeddings").alias("e1")
    e2 = load(spark, sf_dir, "embeddings").alias("e2")
    joined = e1.join(e2, F.col("e2.vec_id") == F.col("e1.vec_id") + 1, "inner")
    return joined.select(
        F.col("e1.vec_id").alias("vec_id"),
        F.round(lf.dot_product(F.col("e1.embedding"), F.col("e2.embedding")), 6).alias("dot"),
    )


def _q_v_cosine_topk(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q_embedding"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(lf.cosine_similarity("embedding", "q_embedding"), 6).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(20)


# Dedup tiers (operators/dedup.py) ----------------------------------------


def _q_d_exact_dedup(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return exact_dedup(d, ["text"], order_col="doc_id")


def _q_d_ngram_jaccard(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.2)


def _q_d_minhash_pairs(spark, sf_dir):
    # rows-only: candidate selection depends on Spark's xxhash64, which
    # DuckDB cannot reproduce; exact-Jaccard semantics are oracle-checked
    # via d_ngram_jaccard and pytest covers the LSH guarantees.
    d = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(d, "doc_id", "text", threshold=0.5)


def _q_d_minhash_dedup(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return minhash_lsh_dedup(d, "doc_id", "text", threshold=0.5)


def _q_d_simhash_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return simhash_near_dups(d, "doc_id", "text", max_hamming=3)


# Similarity search (operators/similarity.py) ------------------------------


def _q_v_lsh_topk(spark, sf_dir):
    # rows-only: approximate by construction (recall < 1); the exact
    # baseline v_cosine_topk is the oracle-checked reference.
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return lsh_topk(e.filter(F.col("vec_id") >= 3), q, k=10, dim=64)


# Multimodal plumbing (operators/multimodal.py) ----------------------------


def _q_m_decode_images(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    blobs = attach_fake_blobs(d, "text")
    return decode_images(blobs).select("doc_id", "width", "height", "channels")


def _q_m_frame_sample(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    blobs = attach_fake_blobs(d, "text")
    frames = sample_frames(blobs, frame_bytes=16, every_n=2)
    return frames.select(
        "doc_id",
        F.col("frame_index").cast("bigint").alias("frame_index"),
        F.hex("frame").alias("frame_hex"),
    )


# Event-time windows ------------------------------------------------------


def _q_x1_tumbling_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").cast("string").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _q_x1_sliding_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").cast("string").alias("window_start"), "n_events", "total_value")
    )


def _q_x1_session_window(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("string").alias("session_start"),
            "n_events",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "s5_parquet_scan": _q_s5_parquet_scan,
        "p1_projection": _q_p1_projection,
        "p2_projection_rename": _q_p2_projection_rename,
        "p6_filter_eq": _q_p6_filter_eq,
        "p8_compound_filter": _q_p8_compound_filter,
        "f8_isin": _q_f8_isin,
        "f_trim_upper": _q_f_trim_upper,
        "r3_map_codes": _q_r3_map_codes,
        "r4_key_surgery": _q_r4_key_surgery,
        "r4_product_key_split": _q_r4_product_key_split,
        "r5_coalesce_zero": _q_r5_coalesce_zero,
        "r7_int_date": _q_r7_int_date,
        "r8_recompute_amount": _q_r8_recompute_amount,
        "r9_backfill_price": _q_r9_backfill_price,
        "r10_null_if_future": _q_r10_null_if_future,
        "r11_prefer_source": _q_r11_prefer_source,
        "f16_date_arith": _q_f16_date_arith,
        "w1_dedup_latest": _q_w1_dedup_latest,
        "w2_surrogate_key": _q_w2_surrogate_key,
        "w2_surrogate_two_phase": _q_w2_surrogate_two_phase,
        "w3_scd2_close": _q_w3_scd2_close,
        "r12_current_rows": _q_r12_current_rows,
        "j1_j2_enrich": _q_j1_j2_enrich,
        "j3_broadcast_join": _q_j3_broadcast_join,
        "j4_j5_fact_join": _q_j4_j5_fact_join,
        "a1_groupby_agg": _q_a1_groupby_agg,
        "a1_rollup": _q_a1_rollup,
        "a1_count_distinct": _q_a1_count_distinct,
        "o1_topk": _q_o1_topk,
        "o1_set_except": _q_o1_set_except,
        "o1_union": _q_o1_union,
        "t_token_count": _q_t_token_count,
        "t_quality_score": _q_t_quality_score,
        "t_language_id": _q_t_language_id,
        "t_doc_fingerprint": _q_t_doc_fingerprint,
        "t_exact_dedup": _q_t_exact_dedup,
        "v_l2_norm": _q_v_l2_norm,
        "v_dot_product": _q_v_dot_product,
        "v_cosine_topk": _q_v_cosine_topk,
        "x1_tumbling_window": _q_x1_tumbling_window,
        "x1_sliding_window": _q_x1_sliding_window,
        "x1_session_window": _q_x1_session_window,
        "d_exact_dedup": _q_d_exact_dedup,
        "d_ngram_jaccard": _q_d_ngram_jaccard,
        "d_minhash_pairs": _q_d_minhash_pairs,
        "d_minhash_dedup": _q_d_minhash_dedup,
        "d_simhash_pairs": _q_d_simhash_pairs,
        "v_lsh_topk": _q_v_lsh_topk,
        "m_decode_images": _q_m_decode_images,
        "m_frame_sample": _q_m_frame_sample,
    }


def oracle_sql() -> dict[str, str]:
    status_case = (
        "CASE WHEN upper(trim(o_orderstatus)) = 'O' THEN 'Open' "
        "WHEN upper(trim(o_orderstatus)) = 'F' THEN 'Fulfilled' "
        "WHEN upper(trim(o_orderstatus)) = 'P' THEN 'Pending' ELSE 'n/a' END"
    )
    dirty_int_date = (
        "CASE WHEN o_orderkey % 100 = 0 THEN 0 "
        "WHEN o_orderkey % 101 = 0 THEN 20231301 "
        "ELSE CAST(strftime(o_orderdate, '%Y%m%d') AS INT) END"
    )
    r8_sales = (
        "CASE WHEN l_orderkey % 13 = 0 THEN NULL "
        "WHEN l_orderkey % 17 = 0 THEN -1.0 "
        "WHEN l_orderkey % 19 = 0 THEN l_extendedprice + 1.0 "
        "ELSE l_extendedprice END"
    )
    r9_price = (
        "CASE WHEN l_orderkey % 23 = 0 THEN NULL "
        "WHEN l_orderkey % 29 = 0 THEN -5.0 "
        "ELSE l_extendedprice / l_quantity END"
    )
    r11_primary = (
        "CASE WHEN c_custkey % 5 = 0 THEN 'n/a' "
        "WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END"
    )
    r11_fallback = "CASE WHEN c_custkey % 3 <> 0 THEN lower(c_mktsegment) END"
    fp = "md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"
    tok = (
        "CASE WHEN text IS NULL THEN NULL WHEN length(trim(text)) = 0 THEN 0 "
        "ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
    )
    quality = (
        "round(CASE WHEN text IS NULL OR length(text) = 0 THEN 0.0 ELSE "
        "0.5 * (CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE)) "
        "+ 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)"
        " / CAST(length(text) AS DOUBLE)) "
        "+ 0.2 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) END, 6)"
    )
    dot64 = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(e1.embedding[i] AS DOUBLE) * CAST(e2.embedding[i] AS DOUBLE)))"
    )
    norm_sql = "sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    qnorm = "sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    enorm = "sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    qdot = (
        "list_sum(list_transform(range(1, 65), "
        "i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)))"
    )
    return {
        "s5_parquet_scan": "SELECT n_nationkey, n_name, n_regionkey FROM nation",
        "p1_projection": "SELECT c_custkey, c_name FROM customer",
        "p2_projection_rename": (
            "SELECT c_custkey AS customer_id, c_name AS customer_name, "
            "c_mktsegment AS segment FROM customer"
        ),
        "p6_filter_eq": (
            "SELECT o_orderkey, o_custkey, o_totalprice FROM orders "
            "WHERE o_orderstatus = 'F'"
        ),
        "p8_compound_filter": (
            "SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem "
            "WHERE (l_discount >= 0.05 AND l_quantity < 10) OR l_returnflag = 'R'"
        ),
        "f8_isin": (
            "SELECT c_custkey, c_mktsegment FROM customer "
            "WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')"
        ),
        "f_trim_upper": (
            "SELECT c_custkey, trim(c_name) AS name_trim, "
            "upper(c_mktsegment) AS seg_upper FROM customer"
        ),
        "r3_map_codes": f"SELECT o_orderkey, {status_case} AS status_label FROM orders",
        "r4_key_surgery": (
            "SELECT c_custkey, "
            "CASE WHEN c_name LIKE 'Customer#%' THEN substring(c_name, 10) ELSE c_name END"
            " AS cust_number, "
            "replace(c_name, '#', '') AS name_nohash, "
            "substring(c_name, 1, 8) AS name_head, "
            "CAST(length(c_name) AS BIGINT) AS name_len, "
            "(c_name LIKE 'Customer#%') AS is_prefixed "
            "FROM customer"
        ),
        "r4_product_key_split": (
            "WITH k AS (SELECT p_partkey, "
            "substring(p_type, 1, 2) || '-' || substring(p_brand, 1, 2) || '-' || p_name"
            " AS composite_key FROM part) "
            "SELECT p_partkey, composite_key, "
            "replace(substring(composite_key, 1, 5), '-', '_') AS cat_id, "
            "substring(composite_key, 7) AS product_number FROM k"
        ),
        "r5_coalesce_zero": (
            "SELECT l_orderkey, l_linenumber, "
            "coalesce(CASE WHEN l_orderkey % 7 <> 0 THEN l_linenumber END, 0)"
            " AS linenumber_filled FROM lineitem"
        ),
        "r7_int_date": (
            f"WITH d AS (SELECT o_orderkey, {dirty_int_date} AS order_dt_int FROM orders) "
            "SELECT o_orderkey, order_dt_int, "
            "CAST(CAST(CASE WHEN order_dt_int = 0 OR length(CAST(order_dt_int AS VARCHAR)) <> 8 "
            "THEN NULL ELSE try_strptime(CAST(order_dt_int AS VARCHAR), '%Y%m%d') END"
            " AS DATE) AS VARCHAR) AS order_dt FROM d"
        ),
        "r8_recompute_amount": (
            f"WITH s AS (SELECT l_orderkey, l_linenumber, {r8_sales} AS sales_raw, "
            "l_quantity, l_extendedprice / l_quantity AS price FROM lineitem) "
            "SELECT l_orderkey, l_linenumber, sales_raw, "
            "CASE WHEN sales_raw IS NULL OR sales_raw <= 0 "
            "OR sales_raw <> l_quantity * abs(price) "
            "THEN l_quantity * abs(price) ELSE sales_raw END AS sales_fixed FROM s"
        ),
        "r9_backfill_price": (
            f"WITH s AS (SELECT l_orderkey, l_linenumber, l_extendedprice, l_quantity, "
            f"{r9_price} AS price FROM lineitem) "
            "SELECT l_orderkey, l_linenumber, "
            "CASE WHEN price IS NULL OR price <= 0 THEN l_extendedprice / "
            "(CASE WHEN l_quantity <> 0 THEN l_quantity ELSE 1 END) "
            "ELSE CAST(price AS DOUBLE) END AS price_fixed FROM s"
        ),
        "r10_null_if_future": (
            "SELECT o_orderkey, CAST(CASE WHEN o_orderdate > TIMESTAMP '1995-06-01' "
            "THEN NULL ELSE o_orderdate END AS VARCHAR) AS orderdate_capped FROM orders"
        ),
        "r11_prefer_source": (
            f"WITH s AS (SELECT c_custkey, {r11_primary} AS p, {r11_fallback} AS f "
            "FROM customer) "
            "SELECT c_custkey, CASE WHEN p IS NOT NULL AND p <> 'n/a' THEN p "
            "ELSE coalesce(f, 'n/a') END AS segment_pref FROM s"
        ),
        "f16_date_arith": (
            "SELECT o_orderkey, CAST(o_orderdate - INTERVAL 1 DAY AS VARCHAR)"
            " AS prev_day FROM orders"
        ),
        "w1_dedup_latest": (
            "SELECT o_custkey, o_orderkey, CAST(o_orderdate AS VARCHAR) AS order_ts, "
            "o_totalprice FROM orders "
            "QUALIFY row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate DESC, o_orderkey DESC) = 1"
        ),
        "w2_surrogate_key": (
            "SELECT row_number() OVER (ORDER BY c_custkey) AS customer_key, "
            "c_custkey FROM customer"
        ),
        "w2_surrogate_two_phase": (
            "SELECT row_number() OVER (ORDER BY c_custkey) AS customer_key, "
            "c_custkey FROM customer"
        ),
        "w3_scd2_close": (
            "SELECT o_custkey, o_orderkey, "
            "CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) - INTERVAL 1 DAY AS VARCHAR)"
            " AS version_end FROM orders"
        ),
        "r12_current_rows": (
            "SELECT o_custkey, o_orderkey FROM orders "
            "QUALIFY lead(o_orderdate) OVER (PARTITION BY o_custkey "
            "ORDER BY o_orderdate, o_orderkey) IS NULL"
        ),
        "j1_j2_enrich": (
            "SELECT c_custkey, c_name, n_name AS nation_name, r_name AS region_name "
            "FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "LEFT JOIN region r ON n.n_regionkey = r.r_regionkey"
        ),
        "j3_broadcast_join": (
            "SELECT l_orderkey, l_linenumber, p_name AS part_name "
            "FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey"
        ),
        "j4_j5_fact_join": (
            "SELECT l_orderkey, l_linenumber, l_extendedprice, "
            "o_orderstatus AS order_status, c_mktsegment AS segment "
            "FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey "
            "LEFT JOIN customer c ON o.o_custkey = c.c_custkey"
        ),
        "a1_groupby_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(avg(l_discount), 6) AS avg_disc, "
            "count(*) AS count_order FROM lineitem "
            "WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "a1_rollup": (
            "SELECT l_returnflag, l_linestatus, count(*) AS cnt, "
            "round(sum(l_quantity), 2) AS sum_qty FROM lineitem "
            "GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        "a1_count_distinct": (
            "SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust, "
            "count(*) AS n_orders FROM orders GROUP BY o_orderstatus"
        ),
        "o1_topk": (
            "SELECT o_custkey, round(sum(o_totalprice), 2) AS revenue FROM orders "
            "GROUP BY o_custkey ORDER BY revenue DESC, o_custkey LIMIT 10"
        ),
        "o1_set_except": (
            "SELECT DISTINCT o_custkey FROM orders EXCEPT "
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'"
        ),
        "o1_union": (
            "SELECT DISTINCT nationkey FROM ("
            "SELECT c_nationkey AS nationkey FROM customer "
            "UNION ALL SELECT s_nationkey AS nationkey FROM supplier)"
        ),
        "t_token_count": (
            f"SELECT doc_id, {tok} AS n_tokens, "
            "CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens_bpe FROM documents"
        ),
        "t_quality_score": f"SELECT doc_id, {quality} AS quality FROM documents",
        "t_language_id": (
            f"SELECT doc_id, lang, {_sql_language_id()} AS lang_guess FROM documents"
        ),
        "t_doc_fingerprint": f"SELECT doc_id, {fp} AS fp FROM documents",
        "t_exact_dedup": (
            f"SELECT {fp} AS fp, min(doc_id) AS keep_doc_id, count(*) AS n_copies "
            "FROM documents GROUP BY 1"
        ),
        "v_l2_norm": f"SELECT vec_id, round({norm_sql}, 6) AS norm FROM embeddings",
        "v_dot_product": (
            f"SELECT e1.vec_id AS vec_id, round({dot64}, 6) AS dot "
            "FROM embeddings e1 JOIN embeddings e2 ON e2.vec_id = e1.vec_id + 1"
        ),
        "v_cosine_topk": (
            f"WITH q AS (SELECT embedding FROM embeddings WHERE vec_id = 0) "
            f"SELECT e.vec_id AS vec_id, round({qdot} / ({enorm} * {qnorm}), 6) AS cos_sim "
            "FROM embeddings e, q WHERE e.vec_id <> 0 "
            "ORDER BY cos_sim DESC, vec_id LIMIT 20"
        ),
        # ts is parquet TIMESTAMP(NANOS): cast to µs TIMESTAMP to match the
        # engine's truncation (session.load) before bucketing/printing.
        "x1_tumbling_window": (
            "SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS VARCHAR)"
            " AS window_start, "
            "event_type, count(*) AS n_events, round(sum(value), 2) AS total_value "
            "FROM events GROUP BY 1, 2"
        ),
        "x1_sliding_window": (
            "SELECT CAST(ws AS VARCHAR) AS window_start, count(*) AS n_events, "
            "round(sum(value), 2) AS total_value FROM ("
            "SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) AS ws, value"
            " FROM events "
            "UNION ALL "
            "SELECT time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) "
            "- INTERVAL '30 minutes' AS ws, value FROM events) GROUP BY ws"
        ),
        "x1_session_window": (
            "WITH ev AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events), "
            "gaps AS (SELECT user_id, ts, "
            "CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
            "> INTERVAL '30 minutes' OR lag(ts) OVER (PARTITION BY user_id "
            "ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS new_session FROM ev), "
            "sessions AS (SELECT user_id, ts, "
            "sum(new_session) OVER (PARTITION BY user_id ORDER BY ts "
            "ROWS UNBOUNDED PRECEDING) AS session_id FROM gaps) "
            "SELECT user_id, CAST(min(ts) AS VARCHAR) AS session_start, "
            "count(*) AS n_events FROM sessions GROUP BY user_id, session_id"
        ),
        "d_exact_dedup": (
            "SELECT doc_id, text FROM (SELECT doc_id, text FROM documents) "
            "QUALIFY row_number() OVER (PARTITION BY md5(coalesce(CAST(text AS VARCHAR), '')) "
            "ORDER BY doc_id) = 1"
        ),
        # word-3-gram shingle inverted index -> exact Jaccard on pairs
        # sharing >=1 shingle; mirrors operators/dedup.ngram_jaccard_pairs
        # (max_df=1000 boilerplate cap is a no-op at 500 docs but kept for
        # structural fidelity).
        "d_ngram_jaccard": (
            "WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks "
            "FROM documents), "
            "s AS (SELECT doc_id, list_distinct([array_to_string(toks[i:i+2], ' ') "
            "for i in generate_series(1, greatest(len(toks) - 2, 0))]) AS sh FROM t), "
            "ex0 AS (SELECT doc_id, unnest(sh) AS shingle FROM s), "
            "rare AS (SELECT shingle FROM ex0 GROUP BY shingle "
            "HAVING count(DISTINCT doc_id) <= 1000), "
            "ex AS (SELECT ex0.doc_id, ex0.shingle FROM ex0 JOIN rare USING (shingle)), "
            "sizes AS (SELECT doc_id, count(DISTINCT shingle) AS sz FROM ex GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i "
            "FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
            "GROUP BY 1, 2) "
            "SELECT id_a, id_b, round(i / (sa.sz + sb.sz - i), 6) AS jaccard "
            "FROM inter JOIN sizes sa ON sa.doc_id = id_a "
            "JOIN sizes sb ON sb.doc_id = id_b "
            "WHERE round(i / (sa.sz + sb.sz - i), 6) >= 0.2"
        ),
        # deterministic fake decode: dims derived from sha256 of the blob
        # (documents are pure ASCII, so sha256(text) == sha256 of the
        # UTF-8 payload); hex-pair -> byte via strpos arithmetic.
        "m_decode_images": (
            "WITH h AS (SELECT doc_id, sha256(text) AS s FROM documents) "
            "SELECT doc_id, "
            "CAST(64 + ((strpos('0123456789abcdef', substring(s, 1, 1)) - 1) * 16 "
            "+ strpos('0123456789abcdef', substring(s, 2, 1)) - 1) % 192 AS INT) AS width, "
            "CAST(64 + ((strpos('0123456789abcdef', substring(s, 3, 1)) - 1) * 16 "
            "+ strpos('0123456789abcdef', substring(s, 4, 1)) - 1) % 192 AS INT) AS height, "
            "CAST(3 AS INT) AS channels FROM h"
        ),
        # every-2nd 16-byte frame; ASCII corpus -> char substring ==
        # byte substring, hex() is uppercase on both engines.
        "m_frame_sample": (
            "WITH b AS (SELECT doc_id, text, octet_length(encode(text)) AS blen "
            "FROM documents), "
            "f AS (SELECT doc_id, text, "
            "unnest([i for i in generate_series(0, greatest(blen // 16 - 1, 0)) "
            "if i % 2 = 0]) AS frame_index FROM b) "
            "SELECT doc_id, frame_index, "
            "hex(substring(text, CAST(frame_index * 16 + 1 AS INT), 16)) AS frame_hex FROM f"
        ),
    }
