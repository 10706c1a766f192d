"""CDC-style incremental loads (plans/incremental.py): high-watermark
extraction, idempotent merge, inclusive-boundary semantics."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.plans.incremental import (
    high_watermark,
    incremental_upsert,
)

D = datetime.date


def _rows(spark, rows):
    return spark.createDataFrame(rows, "k int, v string, ts date")


def test_first_run_loads_everything_with_batch_dedup(spark):
    t = "inc_t_first"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    src = _rows(spark, [(1, "a", D(2020, 1, 1)), (2, "b", D(2020, 1, 2)),
                        (2, "b2", D(2020, 1, 3))])
    out = incremental_upsert(spark, src, t, ["k"], "ts")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 2: "b2"}  # within-batch last-writer-wins
    assert high_watermark(spark, t, "ts") == D(2020, 1, 3)


def test_watermark_filters_stale_rows_and_merges_fresh(spark):
    t = "inc_t_merge"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    incremental_upsert(
        spark, _rows(spark, [(1, "a", D(2020, 1, 1)), (2, "b", D(2020, 2, 1))]),
        t, ["k"], "ts",
    )
    # batch 2: one stale row (before wm — must be ignored), one update at
    # the boundary (inclusive — must apply), one new key after it
    b2 = _rows(spark, [(1, "STALE", D(2020, 1, 15)),
                       (2, "b-updated", D(2020, 2, 1)),
                       (3, "c", D(2020, 3, 1))])
    out = incremental_upsert(spark, b2, t, ["k"], "ts")
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 2: "b-updated", 3: "c"}


@pytest.mark.slow
def test_rerun_is_idempotent(spark):
    t = "inc_t_idem"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    b1 = _rows(spark, [(1, "a", D(2020, 1, 1)), (2, "b", D(2020, 2, 1))])
    b2 = _rows(spark, [(3, "c", D(2020, 3, 1))])
    incremental_upsert(spark, b1, t, ["k"], "ts")
    once = sorted(map(tuple, incremental_upsert(spark, b2, t, ["k"], "ts").collect()))
    again = sorted(map(tuple, incremental_upsert(spark, b2, t, ["k"], "ts").collect()))
    assert once == again
    assert len(once) == 3


def test_strict_bound_skips_boundary_rows(spark):
    t = "inc_t_strict"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    incremental_upsert(spark, _rows(spark, [(1, "a", D(2020, 1, 1))]), t, ["k"], "ts")
    b2 = _rows(spark, [(1, "at-boundary", D(2020, 1, 1)),
                       (2, "after", D(2020, 1, 2))])
    out = incremental_upsert(spark, b2, t, ["k"], "ts", inclusive=False)
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {1: "a", 2: "after"}  # boundary row excluded under >


def test_high_watermark_missing_table_is_none(spark):
    assert high_watermark(spark, "inc_t_nope", "ts") is None


def test_source_filter_pushes_down(spark):
    """The watermark predicate must reach the parquet scan (at 100 TB
    the delta pull reads the delta, not the table)."""
    import tempfile

    t = "inc_t_pushdown"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    src_path = tempfile.mkdtemp(prefix="inc_src_") + "/src"
    _rows(spark, [(1, "a", D(2020, 1, 1)), (2, "b", D(2021, 1, 1))]).write.parquet(src_path)
    src = spark.read.parquet(src_path)
    incremental_upsert(spark, src.filter(F.col("ts") < D(2020, 6, 1)), t, ["k"], "ts")
    wm = high_watermark(spark, t, "ts")
    fresh = src.filter(F.col("ts") >= F.lit(wm))
    plan = fresh._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(ts), GreaterThanOrEqual(ts" in plan


def test_stream_incremental_merge_lands_cdc_batches(spark, tmp_path):
    """Streaming CDC landing: a change feed split across files, each
    micro-batch MERGEd into the catalog target — the final table holds
    exactly the last version per key EVEN when micro-batches arrive out
    of event-time order. The file source picks files oldest-mtime-first,
    so writing the newest-timestamp rows first forces the adversarial
    order: a watermark-filtering merge would drop (1,a) and (2,b-v2) as
    "stale"; an updates-always-win merge would let the late-arriving
    older (2,b) clobber (2,b-v2)."""
    import datetime as dt
    import time

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
        stream_incremental_merge,
    )

    t = "inc_t_stream"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    src = str(tmp_path / "feed")
    newest_first = spark.createDataFrame(
        [(2, "b-v2", dt.datetime(2020, 1, 3)), (3, "c", dt.datetime(2020, 1, 4))],
        "k int, v string, ts timestamp",
    )
    oldest_last = spark.createDataFrame(
        [(1, "a", dt.datetime(2020, 1, 1)), (2, "b", dt.datetime(2020, 1, 2))],
        "k int, v string, ts timestamp",
    )
    newest_first.coalesce(1).write.parquet(src + "/f1")
    time.sleep(1.1)  # distinct mtimes → deterministic discovery order
    oldest_last.coalesce(1).write.parquet(src + "/f2")
    sdf = (
        spark.readStream.schema("k int, v string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    stream_incremental_merge(
        sdf, t, ("k",), "ts", checkpoint_dir=str(tmp_path / "ck")
    )
    got = {r["k"]: r["v"] for r in spark.table(t).collect()}
    assert got == {1: "a", 2: "b-v2", 3: "c"}


def test_stream_versioned_merge_commits_snapshot_per_batch(spark, tmp_path):
    """Streaming CDC landing into a VersionedTable: each micro-batch is
    ONE committed snapshot (time travel exposes every intermediate
    state), within-batch duplicate keys resolve last-writer-wins by
    order_col before the merge, and out-of-event-time-order batches
    still converge to last-version-per-key."""
    import datetime as dt
    import time

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
        VersionedTable,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
        stream_versioned_merge,
    )

    root = str(tmp_path / "vt")
    src = str(tmp_path / "feed")
    # batch 1 (newest event times first = adversarial arrival order),
    # including an intra-batch duplicate for k=3: ts 04 must win
    b1 = spark.createDataFrame(
        [
            (2, "b-v2", dt.datetime(2020, 1, 3)),
            (3, "c-old", dt.datetime(2020, 1, 2)),
            (3, "c", dt.datetime(2020, 1, 4)),
        ],
        "k int, v string, ts timestamp",
    )
    b2 = spark.createDataFrame(
        [(1, "a", dt.datetime(2020, 1, 1)), (2, "b", dt.datetime(2020, 1, 2))],
        "k int, v string, ts timestamp",
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    time.sleep(1.1)
    b2.coalesce(1).write.parquet(src + "/f2")
    sdf = (
        spark.readStream.schema("k int, v string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    stream_versioned_merge(
        sdf, root, ("k",), "ts", checkpoint_dir=str(tmp_path / "ck")
    )
    vt = VersionedTable(spark, root)
    # one committed version per micro-batch
    assert vt.versions() == [1, 2]
    final = {r["k"]: r["v"] for r in vt.read().collect()}
    assert final == {1: "a", 2: "b-v2", 3: "c"}
    # time travel: version 1 is exactly batch 1 post-dedup
    v1 = {r["k"]: r["v"] for r in vt.read(version=1).collect()}
    assert v1 == {2: "b-v2", 3: "c"}


def test_stream_versioned_merge_schema_evolution(spark, tmp_path):
    """A standing CDC landing must survive an upstream column add
    mid-stream: with allow_new_columns=True a micro-batch carrying a
    brand-new column commits it (older keys read NULL there; time
    travel shows each version's own schema); the DEFAULT fails loudly
    on the new column instead of silently dropping the CDC data."""
    import datetime as dt

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
        VersionedTable,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
        stream_versioned_merge,
    )

    root = str(tmp_path / "vt_evo")
    src = str(tmp_path / "feed_evo")
    b1 = spark.createDataFrame(
        [(1, "a", dt.datetime(2020, 1, 1)), (2, "b", dt.datetime(2020, 1, 1))],
        "k int, v string, ts timestamp",
    )
    b1.coalesce(1).write.parquet(src + "/f1")
    sdf1 = spark.readStream.schema("k int, v string, ts timestamp").parquet(
        src + "/*"
    )
    stream_versioned_merge(
        sdf1, root, ("k",), "ts", checkpoint_dir=str(tmp_path / "ck1"),
        allow_new_columns=True,
    )

    # batch 2 carries a NEW column (upstream ALTER TABLE ADD COLUMN)
    import time

    time.sleep(1.1)
    b2 = spark.createDataFrame(
        [(2, "b2", dt.datetime(2020, 1, 2), "EU"), (3, "c", dt.datetime(2020, 1, 2), "US")],
        "k int, v string, ts timestamp, region string",
    )
    b2.coalesce(1).write.parquet(src + "/f2")
    sdf2 = spark.readStream.schema(
        "k int, v string, ts timestamp, region string"
    ).parquet(src + "/*")
    stream_versioned_merge(
        sdf2, root, ("k",), "ts", checkpoint_dir=str(tmp_path / "ck1"),
        allow_new_columns=True,
    )

    vt = VersionedTable(spark, root)
    cur = {r["k"]: (r["v"], r["region"]) for r in vt.read().collect()}
    # new column committed; pre-evolution key reads NULL there
    assert cur == {1: ("a", None), 2: ("b2", "EU"), 3: ("c", "US")}
    # time travel shows both schemas
    assert "region" not in vt.read(version=1).columns
    assert "region" in vt.read(version=2).columns

    # default (no opt-in): the new column fails the stream loudly
    b3 = spark.createDataFrame(
        [(4, "d", dt.datetime(2020, 1, 3), "APAC", 1.5)],
        "k int, v string, ts timestamp, region string, score double",
    )
    time.sleep(1.1)
    b3.coalesce(1).write.parquet(src + "/f3")
    sdf3 = spark.readStream.schema(
        "k int, v string, ts timestamp, region string, score double"
    ).parquet(src + "/*")
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises((ValueError, StreamingQueryException), match="allow_new_columns"):
        stream_versioned_merge(
            sdf3, root, ("k",), "ts", checkpoint_dir=str(tmp_path / "ck2")
        )
