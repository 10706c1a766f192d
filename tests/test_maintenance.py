"""The one-call maintenance façade: auto-discovery of every standing
table family from recorded metadata, constant-time health reports, and
apply-mode execution of each family's own compaction verb."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

TEXT = (
    "the quick brown fox jumps over the lazy dog and keeps on running "
    "through the quiet field past the old stone wall toward the river"
)


@pytest.fixture()
def standing_tables(spark, tmp_path):
    """One standing table per family (minhash + span indexes, a batch
    sink, distinct state, sessionize state, a versioned root)."""
    import datetime as dt

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
        minhash_build_index,
        span_build_index,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.multimodal import (
        hamming_index_build,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
        VersionedTable,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
        _land_batch_partition,
        _sessionize_merge_batch,
    )

    names = {
        "minhash": "maint_mh_idx",
        "span": "maint_span_idx",
        "sink": "maint_batch_sink",
        "session": "maint_sess_state",
        "hamming": "maint_fp_idx",
        "exact": "maint_exact_seen",
    }
    for t in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    docs = spark.createDataFrame(
        [(i, TEXT + f" tail {i}") for i in range(6)], "doc_id bigint, text string"
    )
    minhash_build_index(docs, names["minhash"])
    span_build_index(docs, names["span"])
    hamming_index_build(
        spark.createDataFrame(
            [(i, i * 257) for i in range(6)], "doc_id long, phash long"
        ),
        names["hamming"],
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.dedup import (
        exact_build_index,
        exact_incremental_dedup,
    )

    exact_build_index(
        docs.select(F.concat(F.lit("http://m/"), "doc_id").alias("url")),
        names["exact"],
        ["url"],
    )
    # a few appends so the seen-set has the small-file creep the
    # sweep measures
    for i in (10, 20):
        exact_incremental_dedup(
            spark, names["exact"],
            spark.createDataFrame(
                [(i, f"http://m/{i}")], "doc_id long, url string"
            ),
            ["url"], order_col="doc_id",
        )
    for bid in range(3):
        _land_batch_partition(
            spark.createDataFrame([(bid, bid * 10)], "event_id long, v long"),
            names["sink"],
            bid,
        )
    _sessionize_merge_batch(
        spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1)), (2, dt.datetime(2024, 1, 1))],
            "user_id long, ts timestamp",
        ),
        0,
        names["session"],
        "user_id",
        "ts",
        1800,
        state_partitions=4,
    )
    root = str(tmp_path / "maint_vt")
    vt = VersionedTable(spark, root)
    # partitioned: merges are partition-scoped COW, whose carried
    # directories/exclusions are the creep health measures
    vt.write(
        spark.createDataFrame([(1, 0, "a"), (2, 1, "b")], "k int, p int, v string"),
        partition_by=["p"],
    )
    for i in range(3):
        vt.merge(
            spark.createDataFrame([(1, 0, f"v{i}")], "k int, p int, v string"),
            ["k"],
        )
    yield names, root
    for t in names.values():
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_health_sweep_discovers_every_family(spark, standing_tables):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.maintenance import (
        health_sweep,
    )

    names, root = standing_tables
    sweep = health_sweep(spark, versioned_roots=(root,))
    # report keys are database-QUALIFIED so apply-mode actions can
    # never resolve against the wrong current database
    q = {k: f"default.{v}" for k, v in names.items()}
    fam = {t: r["family"] for t, r in sweep["tables"].items() if t in q.values()}
    assert fam == {
        q["minhash"]: "minhash",
        q["span"]: "span",
        q["sink"]: "batch_sink",
        q["session"]: "session_state",
        q["hamming"]: "hamming_fp",
        q["exact"]: "exact",
    }
    # every report is the family's own health shape
    assert "files_per_bucket" in sweep["tables"][q["minhash"]]
    assert "files_per_bucket" in sweep["tables"][q["hamming"]]
    assert "files_per_bucket" in sweep["tables"][q["exact"]]
    assert "live_batch_partitions" in sweep["tables"][q["sink"]]
    assert sweep["tables"][q["sink"]]["live_batch_partitions"] == 3
    assert "files_per_partition" in sweep["tables"][q["session"]]
    # a temp view in the session must neither crash nor enter the sweep
    spark.range(3).createOrReplaceTempView("maint_tmp_view")
    sweep2 = health_sweep(spark, versioned_roots=(root,))
    assert all("maint_tmp_view" not in k for k in sweep2["tables"])
    assert root in sweep["versioned"]
    assert "merges_since_compact" in sweep["versioned"][root]


def test_run_maintenance_applies_flagged_actions(spark, standing_tables):
    """apply=True executes each flagged table's own verb: a crashed
    batch-sink fold resumes + folds, and a merge-heavy versioned table
    compacts — while healthy tables are left untouched."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.maintenance import (
        run_maintenance,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
        VersionedTable,
    )
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.streaming.events import (
        _land_batch_partition,
        _set_pending_fold,
    )

    names, root = standing_tables
    # trip the sink: a pending (crashed) fold manifest forces attention
    _set_pending_fold(spark, names["sink"], max_fold=1, archive_id=-1, phase="staged")
    # trip the versioned table: merge until past the creep threshold
    vt = VersionedTable(spark, root)
    for i in range(8):
        vt.merge(
            spark.createDataFrame([(1, 0, f"m{i}")], "k int, p int, v string"),
            ["k"],
        )
    assert vt.health()["compact_recommended"]

    res = run_maintenance(spark, versioned_roots=(root,), apply=True)
    assert res["applied"].get(f'default.{names["sink"]}') == "compact_batch_partitions"
    assert res["applied"].get(root) == "versioned_compact"
    # the fold resumed + completed: manifests clear, data intact
    rows = sorted(r.v for r in spark.table(names["sink"]).collect())
    assert rows == [0, 10, 20]
    assert not VersionedTable(spark, root).health()["compact_recommended"]
    # the healthy indexes were not rewritten
    assert f'default.{names["minhash"]}' not in res["applied"]
    assert f'default.{names["session"]}' not in res["applied"]
    # sweep after: nothing left flagged among our tables
    after = run_maintenance(spark, versioned_roots=(root,))
    flagged = set(after["attention"])
    ours = {f"default.{v}" for v in names.values()} | {root}
    assert not flagged & ours
