"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is timed end-to-end (plan + execute). Wide results are
executed via the ``noop`` sink so nothing funnels through the driver;
small aggregates are collected.

Noise contract (BASELINE.md "Bench noise contract"): every query is
min-of-N (N=2, 3 for sub-second queries); a fixed code-independent
calibration workload is timed alongside and its drift vs the previous
recorded round scales the regression threshold symmetrically with a
0.8 floor (host contention divides out; a fast box narrows the gate,
but never below an absolute 1.15x — the per-query scheduling-noise
band); suspects are re-timed up to twice, and only a suspect that was
ALSO over the gate in the previous run records as a regression
(cross-run persistence). A flag that
survives all of that is a code regression, not box noise. Every run
persists its full payload to ``bench_sidecar.json`` (keyed by SF,
stamped with the round) because the driver's ``BENCH_r{N}.json``
keeps only a 2000-char stdout tail the payload outgrew in round 12.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as ent  # noqa: E402
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import get_spark, load  # noqa: E402


def _exec(df, wide: bool):
    if wide:
        df.write.format("noop").mode("overwrite").save()
    else:
        df.collect()


_SIDECAR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_sidecar.json"
)


def _current_round() -> int:
    """This run's round number = newest driver-recorded round + 1.
    The driver writes ``BENCH_r{N}.json`` AFTER running bench, so while
    bench executes the newest recording on disk is the previous round."""
    root = os.path.dirname(os.path.abspath(__file__))
    best = 0
    for fname in os.listdir(root):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fname)
        if m:
            best = max(best, int(m.group(1)))
    return best + 1


def _previous_round_queries(sf_key: str) -> tuple[dict[str, float], float | None]:
    """(per-query timings, calibration seconds) of the newest prior
    recording — whichever is newer of:

    * the newest ``BENCH_r{N}.json`` whose ``parsed`` payload survived
      the driver's tail capture (since round 12 the printed line
      exceeds the ~2000-char capture so ``parsed`` is null there), and
    * bench's own sidecar ``bench_sidecar.json``, written by every run
      precisely because the driver recordings truncate (ADVICE r13) —
      keyed by SF so an sf0.01 iteration run never becomes the sf0.1
      baseline, and stamped with the round it ran in.

    Empty dict / None when neither exists (round 1)."""
    root = os.path.dirname(os.path.abspath(__file__))
    best_n, best, best_cal = -1, {}, None
    for fname in os.listdir(root):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", fname)
        if not m:
            continue
        try:
            with open(os.path.join(root, fname)) as f:
                parsed = json.load(f).get("parsed") or {}
            qs = parsed.get("queries") or {}
        except (OSError, json.JSONDecodeError):
            continue
        if int(m.group(1)) > best_n and qs:
            best_n, best = int(m.group(1)), qs
            cal = parsed.get("calibration") or {}
            best_cal = cal.get("sec") if isinstance(cal, dict) else None
    try:
        with open(_SIDECAR) as f:
            side = json.load(f).get(sf_key) or {}
        # >=: a same-round sidecar (e.g. a local sf0.1 run earlier in
        # the round) is fresher than the prior round's driver record.
        if side.get("queries") and int(side.get("round", -1)) >= best_n:
            best = side["queries"]
            best_cal = (side.get("calibration") or {}).get("sec")
    except (OSError, json.JSONDecodeError, ValueError, TypeError):
        pass
    return best, best_cal


# the driver records only a ~2000-char stdout TAIL; the LAST printed
# line must therefore stay one complete JSON document under that cap
# (round 12's failure mode: the tail cut an oversized line mid-document
# and BENCH_r12 recorded parsed=null). 1900 leaves slack for the
# trailing newline and tail-boundary jitter.
_COMPACT_BUDGET = 1900


def compact_line(
    metric: str,
    value: float,
    timings: dict,
    sf,
    regressions,
    suspects,
    calibration: dict,
    budget: int = _COMPACT_BUDGET,
) -> str:
    """Render the compact last stdout line — ALWAYS valid JSON, ALWAYS
    within ``budget`` chars (round 17: the r16 fix shrank the line but
    nothing stopped query growth — or a pathological all-queries
    regression list — from overflowing it again). Degradation ladder,
    first form that fits wins:

    1. the full compact form (per-query 2-dp timings + name lists);
    2. regressions/suspects collapsed to counts — the lists are the
       only fields that can grow by O(n_queries) in one bad run;
    3. per-query timings dropped too (counts + total only) — the
       driver contract minimum (metric/value/unit/sf) always survives.

    ``tests/test_bench_sidecar.py`` pins the CURRENT query set plus 30
    synthetic extra queries at worst-case float width under form 1."""
    base = {"metric": metric, "value": value, "unit": "sec"}
    q2 = {n: round(t, 2) for n, t in timings.items()}
    forms = [
        {
            **base, "queries": q2, "sf": sf,
            "regressions": sorted(regressions),
            "suspects": sorted(suspects),
            "calibration": calibration,
        },
        {
            **base, "queries": q2, "sf": sf,
            "n_regressions": len(regressions),
            "n_suspects": len(suspects),
            "calibration": calibration,
        },
        {
            **base, "sf": sf, "n_queries": len(timings),
            "n_regressions": len(regressions),
            "n_suspects": len(suspects),
            "calibration": calibration,
        },
    ]
    for form in forms:
        s = json.dumps(form)
        if len(s) <= budget:
            return s
    return json.dumps(base)  # unreachable at sane metric-string length


def _write_sidecar(sf_key: str, payload: dict, rnd: int) -> None:
    """Persist the full payload beside the script, keyed by SF. The
    driver's BENCH_r{N}.json keeps only a 2000-char stdout tail, which
    the payload outgrew in round 12 — this file is the durable copy
    the next round's regression gate reads."""
    try:
        with open(_SIDECAR) as f:
            side = json.load(f)
        if not isinstance(side, dict):
            side = {}
    except (OSError, json.JSONDecodeError):
        side = {}
    side[sf_key] = dict(payload, round=rnd)
    tmp = _SIDECAR + ".tmp"
    with open(tmp, "w") as f:
        json.dump(side, f, indent=1, sort_keys=True)
    os.replace(tmp, _SIDECAR)


def _previous_suspects(sf_key: str) -> set[str]:
    """Query names that exceeded the gate in the PREVIOUS bench run for
    this SF — the cross-run persistence input to the regression gate
    (BASELINE.md "Bench noise contract" §3): a suspect is only RECORDED
    as a regression when it exceeded the gate in two consecutive runs.
    Rationale: with ~33 queries at ±20-40% scheduling noise, almost
    every run draws ONE random slow window past a ~1.3x gate even
    after re-times (observed across three same-code runs: q21/q29,
    then q11/q15, then q14 — never the same query twice), while a real
    code regression is slow in EVERY run. Falls back to the old
    format's recorded ``regressions`` keys; empty when no sidecar
    exists (then there is no baseline either, so no suspects arise)."""
    try:
        with open(_SIDECAR) as f:
            side = json.load(f).get(sf_key) or {}
        return set(side.get("suspects") or side.get("regressions") or [])
    except (OSError, json.JSONDecodeError, AttributeError, TypeError):
        return set()


def _calibration(spark, sf_dir: str, _time) -> float:
    """Fixed-shape, code-independent reference workload timed alongside
    every round so host drift can be divided out of the regression gate
    (BASELINE.md "Bench noise contract"). Deliberately touches only
    pyspark built-ins + a trivial Arrow kernel — no repo operator code —
    so its round-over-round ratio measures the BOX, not the code:

    * a lineitem scan + filter + 2-key shuffle agg (JVM/codegen+shuffle
      cost component), and
    * an Arrow pandas_udf identity pass over 200k rows (Python worker
      round-trip cost component, the part host contention hits hardest).

    min-of-3 like every headline query.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _cal_kernel(s: pd.Series) -> pd.Series:
        return s * 1.0000001

    def _cal(spark, d):
        li = load(spark, d, "lineitem")
        jvm = (
            li.filter(F.col("l_quantity") > 10)
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_extendedprice").alias("s"),
                F.avg("l_discount").alias("a"),
                F.count("*").alias("n"),
            )
        )
        py = (
            spark.range(200_000, numPartitions=32)
            .select(_cal_kernel(F.col("id").cast("double")).alias("v"))
            .agg(F.sum("v").alias("sv"))
        )
        return jvm.unionByName(
            py.select(
                F.lit("CAL").alias("l_returnflag"),
                F.lit("CAL").alias("l_linestatus"),
                F.col("sv").alias("s"),
                F.lit(0.0).alias("a"),
                F.lit(0).cast("long").alias("n"),
            )
        )

    return min(_time(lambda s, d: _cal(s, d), False) for _ in range(3))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    qs = ent.queries()

    def q_fact_join_agg(spark, d):
        # join-heavy: fact x orders x customer -> grouped revenue.
        # NO broadcast hints: orders is fact-proportional (never
        # broadcastable at scale) and customer grows with SF too — AQE
        # picks broadcast-vs-shuffle from runtime stats, which is the
        # plan that survives a 100x scale-up.
        li = load(spark, d, "lineitem").alias("l")
        o = load(spark, d, "orders").alias("o")
        c = load(spark, d, "customer").alias("c")
        return (
            li.join(o, F.col("l.l_orderkey") == F.col("o.o_orderkey"), "left")
            .join(c, F.col("o.o_custkey") == F.col("c.c_custkey"), "left")
            .groupBy("c_mktsegment")
            .agg(
                F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                    "revenue"
                ),
                F.count("*").alias("n_items"),
            )
        )

    def q_minhash_dedup(spark, d):
        # q11's historical workload, byte-identical since r11: greedy
        # MinHash-LSH dedup on the crc32 ARROW kernel (the scale path).
        # The registry's d_minhash_dedup entry switched to the md5
        # oracle family in round 14 — benching that would change what
        # q11 measures, so the arrow workload is pinned here instead.
        from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
            minhash_lsh_dedup,
        )

        docs = load(spark, d, "documents")
        return minhash_lsh_dedup(docs, "doc_id", "text", threshold=0.5)

    def q_curation_compose(spark, d):
        # curation tier composed: per-language stratified downsample ->
        # fixed-budget sequence packing. Scan-fused filter + one shard
        # shuffle; see operators/curation.py.
        from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
            pack_sequences,
            stratified_sample,
        )

        docs = load(spark, d, "documents")
        kept = stratified_sample(
            docs, "lang", {"en": 0.5, "de": 1.0, "fr": 0.5, "es": 0.5, "zh": 0.25},
            key_col="doc_id",
        )
        return pack_sequences(
            kept.select("doc_id", "n_chars"), "n_chars", budget=4000,
            order_col="doc_id",
        )

    # q16 setup: persist the MinHash index ONCE (untimed — a standing
    # pipeline builds once and then pays only per-batch cost, which is
    # the number q16 tracks round-over-round). append=False keeps the
    # index immutable so regression re-times measure the same work.
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
        minhash_build_index,
        minhash_incremental_dedup,
    )

    inc_table = "bench_mh_index"
    spark.sql(f"DROP TABLE IF EXISTS {inc_table}")
    minhash_build_index(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 != 0),
        inc_table,
    )

    def q_incremental_minhash(spark, d):
        # steady state of a standing corpus: sign one arriving batch
        # (10% of documents), probe the persisted bucketed index, drop
        # near-dups of the corpus or of earlier batch rows; hot-bucket
        # capped on both joins.
        batch = load(spark, d, "documents").filter(F.col("doc_id") % 10 == 0)
        # log_skew=False pins the r16-benched uninstrumented per-batch
        # body (the q11 crc32 precedent) — the round-17 skew report is
        # one extra bounded agg that would change what q16 measures
        return minhash_incremental_dedup(
            spark, inc_table, batch, append=False, max_bucket_size=64,
            log_skew=False,
        )

    # q17 setup: commit the base versioned table ONCE (untimed — the
    # standing-lakehouse analog of q16's index build). The timed query
    # resets the table to version 1 (manifest unlink + vacuum: driver
    # file ops, microseconds) so every sample — including regression
    # re-times — measures the identical partition-scoped COW merge of
    # one CDC batch onto the same base snapshot.
    import os as _os
    import tempfile as _tempfile

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
        VersionedTable,
    )

    vt_root = _tempfile.mkdtemp(prefix="bench-vt-")
    _orders_cols = ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    VersionedTable(spark, vt_root).write(
        load(spark, sf_dir, "orders").select(*_orders_cols),
        partition_by=["o_orderstatus"],
    )

    def q_versioned_merge(spark, d):
        vt = VersionedTable(spark, vt_root)
        for v in vt.versions()[1:]:
            _os.unlink(vt._manifest_path(v))
        vt.vacuum(retain_last=1)
        batch = load(spark, d, "orders").filter(
            F.col("o_orderkey") % 100 == 0
        ).select(
            "o_orderkey",
            "o_orderstatus",
            F.round(F.col("o_totalprice") + 50, 2).alias("o_totalprice"),
            "o_orderdate",
        )
        vt.merge(batch, keys=["o_orderkey"])
        return vt.read().groupBy("o_orderstatus").agg(F.count("*").alias("n"))

    # q20 setup: resolve + index the clean customers ONCE (untimed —
    # the standing-pipeline analog of q16's minhash index). The timed
    # query resolves the typo-variant batch against the index with
    # append=False so regression re-times measure identical work.
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.entity import (
        er_build_index,
        er_incremental,
        resolve_entities,
    )

    er_table = "bench_er_index"
    er_key = F.expr("right(c_name, 6)")
    spark.sql(f"DROP TABLE IF EXISTS {er_table}")
    spark.sql(f"DROP TABLE IF EXISTS {er_table}__relabel")
    _cust = load(spark, sf_dir, "customer")
    _er_base = _cust.select(
        F.col("c_custkey").cast("bigint").alias("id"), "c_name"
    )
    er_build_index(
        resolve_entities(_er_base, "id", "c_name", er_key, threshold=0.9),
        er_table, "id", "c_name", er_key,
    )

    # q22 setup: reuse q16's standing index; write the arriving corpus
    # as THREE parquet files (untimed) so maxFilesPerTrigger=1 forces 3
    # sequential micro-batches. The timed query runs the streaming
    # steady state end-to-end — foreachBatch scheduling + per-batch
    # sign/probe against the bucketed index — with append=False so
    # every sample (and regression re-time) measures identical work.
    stream_src = _tempfile.mkdtemp(prefix="bench-stream-src-")
    _docs = load(spark, sf_dir, "documents")
    for res in (1, 4, 7):
        _docs.filter(F.col("doc_id") % 10 == res).coalesce(1).write.mode(
            "append"
        ).parquet(stream_src)
    _doc_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in _docs.schema.fields
    )

    def q_stream_corpus_dedup(spark, d):
        from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
            stream_corpus_dedup,
        )

        sdf = (
            spark.readStream.schema(_doc_ddl)
            .option("maxFilesPerTrigger", "1")
            .parquet(stream_src)
        )
        with _tempfile.TemporaryDirectory() as ck:
            # log_skew=False: same uninstrumented-body pin as q16
            stream_corpus_dedup(
                sdf, inc_table, ck, append=False, max_bucket_size=64,
                query_name="bench_q22", log_skew=False,
            )
        return spark.range(1).select(F.lit("drained").alias("status"))

    def q_er_incremental(spark, d):
        batch = load(spark, d, "customer").filter(
            F.col("c_custkey") % 7 == 0
        ).select(
            (F.col("c_custkey") + 100000000).cast("bigint").alias("id"),
            F.concat(
                F.substring("c_name", 1, 1), F.expr("substring(c_name, 3)")
            ).alias("c_name"),
        )
        return er_incremental(
            spark, er_table, batch, "id", "c_name", er_key,
            threshold=0.9, append=False,
        )

    # q30 setup: standing Hamming fingerprint index (media near-dup
    # steady state). Mostly-unique fingerprints (xxhash64 of a partner
    # id) with planted hamming-1 neighbors: docs %10==7 neighbor their
    # even predecessor (corpus dup), docs %10==9 neighbor doc-4 in the
    # same odd batch (within-batch dup). Evens indexed untimed; the
    # timed query probes + self-dedups the 2.5k-doc odd batch with
    # append=False so every sample measures identical work.
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.multimodal import (
        hamming_incremental_dedup,
        hamming_index_build,
    )

    fp_table = "bench_fp_idx"
    spark.sql(f"DROP TABLE IF EXISTS {fp_table}")
    _partner = F.when(
        F.col("doc_id") % 10 == 7, F.col("doc_id") - 1
    ).when(F.col("doc_id") % 10 == 9, F.col("doc_id") - 4).otherwise(
        F.col("doc_id")
    )
    _planted = (F.col("doc_id") % 10).isin(7, 9).cast("long")
    _fpf = load(spark, sf_dir, "documents").select(
        "doc_id", F.xxhash64(_partner).bitwiseXOR(_planted).alias("phash")
    )
    hamming_index_build(_fpf.filter(F.col("doc_id") % 2 == 0), fp_table)
    _fp_odds = _fpf.filter(F.col("doc_id") % 2 == 1)

    def q_hash_index_steady(spark, d):
        return hamming_incremental_dedup(
            spark, fp_table, _fp_odds, max_hamming=3, append=False
        )

    # q34 setup: standing IVF vector index (streaming-ANN steady
    # state, round 15). Evens indexed untimed; each timed sample
    # streams a 3-micro-batch feed of 1k FRESH-id odd vectors through
    # stream_ivf_append (replay anti-join vs the id-bucketed index +
    # nearest-cell assignment + partitioned bucketed append + drift
    # log), then probes the grown index with ivf_query_index. Feeds
    # are pre-written untimed with per-sample id offsets so every
    # sample appends the same-size batch of genuinely new ids; the
    # per-batch probe is flat in index size (SCALE.md 1x/10x/40x), so
    # samples stay comparable as the index accretes across them.
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
    )

    ivf_bench_table = "bench_ivf_idx"
    for _t in (
        ivf_bench_table,
        f"{ivf_bench_table}_drift_stats",
        f"{ivf_bench_table}_drift_log",
        f"{ivf_bench_table}_centroids",
    ):
        spark.sql(f"DROP TABLE IF EXISTS {_t}")
    _emb_all = load(spark, sf_dir, "embeddings")
    ivf_bench_cents = ivf_build_index(
        _emb_all.filter(F.col("vec_id") % 2 == 0),
        ivf_bench_table,
        n_clusters=16,
        seed=42,
    )
    _ann_odds = _emb_all.filter(F.col("vec_id") % 2 == 1)
    ann_feed_root = _tempfile.mkdtemp(prefix="bench-ann-feed-")
    # one pre-written feed per possible invocation: samples + the
    # sub-second extra sample (taken when samples < 3) + up to 2 gate
    # re-times. Derived from the env knob, NOT a constant — a raised
    # SPARK_GRAFT_BENCH_SAMPLES must grow the feed pool with it or the
    # exhaustion assert below kills the whole run.
    _ann_n_feeds = max(
        1, int(_os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "2"))
    ) + 3
    for _s in range(_ann_n_feeds):
        for _j in range(3):
            _ann_odds.filter(F.col("vec_id") % 3 == _j).select(
                (F.col("vec_id") + F.lit((_s + 1) * 1_000_000)).alias(
                    "vec_id"
                ),
                "embedding",
            ).coalesce(1).write.mode("append").parquet(
                f"{ann_feed_root}/s{_s}"
            )
    _ann_queries = (
        _emb_all.filter(F.col("vec_id") < 30)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .localCheckpoint(eager=True)
    )
    _ann_sample = {"i": 0}

    def q_ann_index_steady(spark, d):
        from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
            stream_ivf_append,
        )

        # one pre-written feed per invocation. Reusing a feed would
        # silently time an EMPTY append (its ids are already indexed,
        # the replay anti-join drops every row) — fail loudly instead
        # of skewing min-of-N.
        i = _ann_sample["i"]
        assert i < _ann_n_feeds, (
            f"q34 feed exhaustion: invocation {i} exceeds the "
            f"{_ann_n_feeds} pre-written feeds; raise the feed count"
        )
        _ann_sample["i"] += 1
        sdf = (
            spark.readStream.schema(_ann_odds.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{ann_feed_root}/s{i}")
        )
        with _tempfile.TemporaryDirectory() as ck:
            stream_ivf_append(
                sdf,
                ivf_bench_table,
                ivf_bench_cents,
                checkpoint_dir=ck,
                query_name="bench_q34",
            )
        return ivf_query_index(
            spark, ivf_bench_table, _ann_queries, ivf_bench_cents,
            k=10, n_probe=4,
        )

    def q_crawl_chain(spark, d):
        # the crawl-to-corpus chain end-to-end (round 12): per-record
        # gzip WARC walk (odd docs ship the real .warc.gz container) ->
        # HTTP envelope strip -> HTML extract -> URL canonicalization
        # -> RFC 9309 robots filter -> URL-grain exact dedup. The
        # robots rules table is 50 domains (AQE broadcasts it); the
        # '?'-bearing wildcard rule exercises the per-row regexp_like
        # candidate path at corpus grain, the literal rules the
        # startswith fast path. Chain cost is Arrow-batch bound
        # (decode+extract), then one fingerprint shuffle for the dedup.
        from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.curation import (
            robots_allowed,
            robots_rules,
        )
        from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
            exact_dedup,
        )

        corpus = qs["t_warc_pipeline"](spark, d)
        sites = spark.range(50).select(
            F.concat(
                F.lit("site"), F.col("id").cast("string"),
                F.lit(".example.com"),
            ).alias("domain"),
            F.lit(
                "User-agent: *\nDisallow: /p1\nAllow: /p1/q1\n"
                "Disallow: /*?a=3\nDisallow: /p6/*.zip$\n"
            ).alias("robots_txt"),
        )
        allowed = robots_allowed(
            corpus, robots_rules(sites), url_col="canonical_url"
        )
        return exact_dedup(
            allowed.filter(F.col("crawl_allowed")).select(
                "doc_id", "canonical_url", "text"
            ),
            ["canonical_url"],
            order_col="doc_id",
        )

    bench = {
        "q1_lineitem_agg": (qs["a1_groupby_agg"], False),
        "q2_fact_join_agg": (q_fact_join_agg, False),
        "q3_dedup_latest": (qs["w1_dedup_latest"], True),
        "q4_topk_revenue": (qs["o1_topk"], False),
        "q5_scd2_window": (qs["w3_scd2_close"], True),
        "q6_text_stats": (qs["t_quality_score"], True),
        "q7_vector_topk": (qs["v_cosine_topk"], False),
        "q8_session_window": (qs["x1_session_window"], True),
        "q9_exact_dedup": (qs["t_exact_dedup"], True),
        "q10_rollup": (qs["a1_rollup"], False),
        "q11_minhash_dedup": (q_minhash_dedup, True),
        "q12_lsh_topk": (qs["v_lsh_topk"], False),
        "q13_gold_pipeline": (qs["g_fact_sales"], True),
        "q14_cc_dedup": (qs["d_cc_dedup"], True),
        "q15_curation_pack": (q_curation_compose, True),
        "q16_incremental_minhash": (q_incremental_minhash, True),
        "q17_versioned_merge": (q_versioned_merge, False),
        # blocking join + in-block levenshtein + label-propagation CC
        # over ~16.5k dirty customer records at sf0.1
        "q18_entity_resolution": (qs["er_resolve"], True),
        # char-trigram LM train + full-corpus score (explode + broadcast
        # joins + per-doc agg) over 5k documents at sf0.1
        "q19_charlm_score": (qs["t_charlm_score"], True),
        # ER steady state: ~2.1k-record batch vs the 15k-record index
        "q20_er_incremental": (q_er_incremental, True),
        # exact substring dedup: ~1M 8-token span fingerprints over 5k
        # docs at sf0.1 (explode + partial-agg groupBy + join-back)
        "q21_span_dedup": (qs["t_span_dedup"], True),
        # streaming steady state: 3 sequential micro-batches (10% of
        # docs each) signed + probed against the standing index through
        # foreachBatch — q16's per-batch cost plus the streaming
        # machinery, regression-tracked as one number
        "q22_stream_corpus_dedup": (q_stream_corpus_dedup, False),
        # hypertable resampling: ~1M-bucket per-user hourly grid with
        # LOCF fill at sf0.1 (per-key sequence explode + fill window)
        "q23_resample_ffill": (qs["x2_resample_ffill"], True),
        # sessionization: per-event assignment + session rollup over
        # 100k events at sf0.1 — lag, running sum and rollup all ride
        # ONE user-keyed exchange (plan-audited round 7)
        "q24_sessionize": (qs["x2_sessionize"], True),
        # classic 6-table star join (TPC-H Q5 shape): broadcast dims,
        # one spine shuffle, AQE join reordering
        "q25_star_join": (qs["j8_star_revenue"], True),
        # session family steady-state (round 9): Markov event-transition
        # matrix and per-user inter-arrival gap profile — both ride one
        # user-keyed exchange (operators/windows.py), regression-tracked
        # alongside q24's sessionize so the whole family has a baseline
        "q26_transitions": (qs["x2_transitions"], False),
        "q27_interarrival": (qs["x2_interarrival"], False),
        # point-in-time star join (round 9): asof union-walk at fact
        # scale (~600k facts x SCD-2 product versions at sf0.1) + the
        # medallion silver repair chain feeding it
        "q28_pit_star": (qs["g_fact_sales_pit"], True),
        # image perceptual near-dup (round 10): encode + REAL decode +
        # aHash of one BMP per document inside Arrow batches, then the
        # Hamming-banded pair join — the multimodal dedup hot path
        "q29_image_phash": (qs["m_image_ahash_pairs"], True),
        # standing Hamming index steady state (round 10): a 2.5k-doc
        # batch banded + probed against the 2.5k-fingerprint bucketed
        # index + within-batch self-dedup — the media twin of q16's
        # MinHash steady state
        "q30_hash_index_steady": (q_hash_index_steady, True),
        # crawl-to-corpus chain (round 12): gzip WARC walk + HTML
        # extract + canonicalize + RFC 9309 robots (path+query
        # wildcards) + URL dedup over every document at sf0.1
        "q31_crawl_chain": (q_crawl_chain, True),
        # DSIR data selection (round 12): two tokenize passes, two
        # bucket aggs, broadcast ratio table, one doc-keyed scoring
        # sum + TakeOrdered top-k — English-target selection over the
        # whole corpus at sf0.1
        "q32_dsir_select": (qs["t_dsir_select"], True),
        # end-to-end crawl tick (round 14): 3 ticks of sitemap
        # discovery + canonicalize + RFC 9309 robots + standing
        # seen-set probe + politeness scheduling with per-domain
        # counter continuation; the fixture drops and rebuilds its
        # state tables on every invocation, so each min-of-N sample
        # measures the identical three-tick composition
        "q33_crawl_tick": (qs["t_crawl_tick"], True),
        # streaming-ANN steady state (round 15): one 3-micro-batch
        # ingest tick into the standing id-bucketed IVF index + a
        # 30-query n_probe=4 probe of the grown index — the vector twin
        # of q22's corpus-dedup and q30's Hamming steady states
        "q34_ann_index_steady": (q_ann_index_steady, False),
    }

    # Warm the JVM/session and the Python/Arrow worker pool so q1/q11
    # don't absorb one-time startup cost (a real cluster runs warm).
    load(spark, sf_dir, "region").count()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).count()

    @pandas_udf("array<bigint>")
    def _warm_str(s: pd.Series) -> pd.Series:
        return pd.Series([[len(x)] for x in s])

    spark.range(1000, numPartitions=32).select(
        _warm_str(F.col("id").cast("string"))
    ).count()

    # warm the actual minhash Arrow kernel (numpy import + JIT in every
    # python worker) on a token corpus so q11 measures the operator, not
    # one-time worker initialization — a real cluster runs warm.
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
        with_minhash_signature_arrow,
    )

    tiny = spark.range(256, numPartitions=32).select(
        F.col("id").alias("_id"), F.concat(F.lit("warm doc "), F.col("id")).alias("text")
    )
    with_minhash_signature_arrow(tiny, "text").select("_sig").count()

    def _time(fn, wide) -> float:
        t0 = time.time()
        _exec(fn(spark, sf_dir), wide)
        return round(time.time() - t0, 3)

    # Calibration BEFORE the headline queries: a fixed code-independent
    # workload whose round-over-round ratio estimates host drift. The
    # regression gate below scales its threshold by this drift so a
    # contended box doesn't manufacture code-regression flags (and a
    # fast box doesn't hide real ones). See BASELINE.md.
    cal_sec = _calibration(spark, sf_dir, _time)

    # min-of-N timing (round 9): two consecutive rounds showed ±40%
    # per-query drift on byte-identical code, so a single sample is
    # noise-dominated. Every query runs N times (default 2) and keeps
    # the minimum — the standard noisy-box estimator of the true cost.
    # Side-effecting queries (q16/q17/q20/q22) are built append=False /
    # self-resetting so every sample measures identical work.
    samples = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "2")))
    timings: dict[str, float] = {}
    all_samples: dict[str, list[float]] = {}
    for name, (fn, wide) in bench.items():
        ts = [_time(fn, wide) for _ in range(samples)]
        # sub-second queries are scheduling-noise dominated (a 0.3 s
        # query flipped ±25% between rounds on identical code): give
        # them one extra sample so min-of-3 stays inside the regression
        # gate's band. Costs at most ~1 s per sub-second query.
        if min(ts) < 1.0 and samples < 3:
            ts.append(_time(fn, wide))
        all_samples[name] = ts
        timings[name] = min(ts)

    # Regression gate: compare against the latest recorded round. Even
    # with min-of-N a slow window can still leak through, so any query
    # over threshold is re-timed and the best sample kept; only a
    # repeatably-slow query is flagged.
    threshold = 1.3
    rnd = _current_round()
    sf_key = f"sf{sf}" if sf is not None else sf_dir
    prev, prev_cal = _previous_round_queries(sf_key)
    # host-drift normalization: if the calibration workload itself runs
    # e.g. 1.5x slower than last round's recorded run, the box (not the
    # code) drifted — widen the gate by that factor. Applied
    # SYMMETRICALLY with a 0.8 floor: on a faster-than-baseline box the
    # gate narrows (so a real code regression masked by a box speedup
    # still gets re-timed), but never below 0.8x of the base threshold
    # (the calibration workload has its own ~±20% noise band and a
    # lucky-fast calibration sample must not manufacture flags).
    cal_drift = (
        round(cal_sec / prev_cal, 3) if prev_cal and prev_cal > 0 else None
    )
    eff_threshold = threshold * max(0.8, cal_drift) if cal_drift else threshold
    # Absolute floor on the NARROWED gate: per-query scheduling noise
    # is ±15% on byte-identical code even on a calm box (the recorded
    # noise maps show max/min spreads of 1.1-2.0x), so a
    # faster-than-baseline box must not narrow the gate into that band
    # — the first calibrated run (drift 0.749) flagged two 1.06x
    # wiggles as regressions before this floor existed.
    eff_threshold = max(1.15, eff_threshold)
    suspects = [
        n for n, t in timings.items()
        if n in prev and prev[n] > 0 and t > eff_threshold * prev[n]
    ]
    for name in suspects:
        fn, wide = bench[name]
        # up to two re-times: a globally-slow window can produce two slow
        # samples in a row (observed: q13 at exactly 1.3x in one run,
        # back to 1.06x the next); stop as soon as one sample clears.
        for _ in range(2):
            t = _time(fn, wide)
            all_samples[name].append(t)
            timings[name] = min(timings[name], t)
            if timings[name] <= eff_threshold * prev[name]:
                break
    suspects_now = {
        n: {"prev": prev[n], "now": timings[n],
            "ratio": round(timings[n] / prev[n], 2)}
        for n in suspects
        if timings[n] > eff_threshold * prev[n]
    }
    # Cross-run persistence (BASELINE.md contract §3): a suspect only
    # RECORDS as a regression when the same query also exceeded the
    # gate in the previous run — one run's slow window is noise, two
    # consecutive runs' is code.
    prev_suspects = _previous_suspects(sf_key)
    regressions = {n: v for n, v in suspects_now.items() if n in prev_suspects}
    if suspects_now:
        print(
            f"suspects this run (recorded, escalate if repeated): "
            f"{suspects_now}", file=sys.stderr,
        )
    if regressions:
        print(f"REGRESSIONS vs previous round: {regressions}", file=sys.stderr)

    payload = {
                "metric": "headline query wall-clock, local[32]",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "regressions": regressions,
                # every over-gate query THIS run (regressions = the
                # subset also suspect in the previous run; see
                # _previous_suspects)
                "suspects": sorted(suspects_now),
                # fixed code-independent workload (scan+agg + Arrow
                # round-trip), min-of-3: drift > 1 means the box ran
                # slower than the previous recorded round and the
                # regression threshold was widened accordingly
                "calibration": {
                    "sec": cal_sec,
                    "prev_sec": prev_cal,
                    "drift": cal_drift,
                    "effective_threshold": round(eff_threshold, 3),
                },
                # per-query max/min sample ratio: variance context for
                # reading the regression list — a broad band here means
                # the box was noisy during the run (host contention),
                # not that the code drifted (see the round-12 A/B)
                "noise": {
                    n: round(max(ts) / min(ts), 2)
                    for n, ts in all_samples.items()
                    if min(ts) > 0
                },
    }
    # durable copy FIRST (the driver records only the ~2000-char TAIL
    # of stdout — see _write_sidecar), then the FULL payload for human
    # readers, then LAST a compact line (total + 2-dp per-query times
    # only, ~1.2 KB) so the tail the driver captures is always one
    # valid JSON document matching the contract shape.
    _write_sidecar(sf_key, payload, rnd)
    print(json.dumps(payload))
    # calibration kept in the compact line so a driver record can serve
    # as the next round's baseline even without the sidecar
    print(
        compact_line(
            payload["metric"],
            payload["value"],
            timings,
            sf,
            regressions,
            suspects_now,
            {"sec": cal_sec, "drift": cal_drift},
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
