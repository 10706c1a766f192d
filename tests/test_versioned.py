"""Snapshot-versioned parquet tables: atomic publish, snapshot isolation,
time travel, partition-scoped copy-on-write MERGE, vacuum."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
    CommitConflictError,
    VersionedTable,
)


@pytest.fixture
def root():
    return tempfile.mkdtemp(prefix="vt-")


def _rows(df):
    # partitioned reads surface partition columns last; normalize order
    return sorted(tuple(r) for r in df.select(*sorted(df.columns)).collect())


def _mk(spark, data, cols=("id", "part", "val")):
    return spark.createDataFrame(data, list(cols))


def test_overwrite_append_time_travel(spark, root):
    vt = VersionedTable(spark, root)
    v1 = vt.write(_mk(spark, [(1, "a", 10), (2, "b", 20)]))
    v2 = vt.write(_mk(spark, [(3, "a", 30)]), mode="append")
    assert (v1, v2) == (1, 2)
    assert _rows(vt.read()) == [(1, "a", 10), (2, "b", 20), (3, "a", 30)]
    # time travel: version 1 unchanged
    assert _rows(vt.read(version=1)) == [(1, "a", 10), (2, "b", 20)]
    # overwrite replaces logical content but v2 stays readable
    vt.write(_mk(spark, [(9, "z", 99)]))
    assert _rows(vt.read()) == [(9, "z", 99)]
    assert _rows(vt.read(version=2)) == [(1, "a", 10), (2, "b", 20), (3, "a", 30)]
    ops = [m["operation"] for m in vt.history()]
    assert ops == ["overwrite", "append", "overwrite"]


def test_append_requires_matching_schema(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10)]))
    bad = spark.createDataFrame([(1, "a")], ["id", "part"])
    with pytest.raises(ValueError, match="schema mismatch"):
        vt.write(bad, mode="append")
    # same columns, different order: fine (order-insensitive check)
    reordered = _mk(spark, [(4, "c", 40)]).select("val", "id", "part")
    vt.write(reordered, mode="append")
    assert _rows(vt.read()) == [(1, "a", 10), (4, "c", 40)]


def test_crashed_write_leaves_old_version_intact(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10)]))
    # simulate a writer that crashed after materializing data but before
    # committing a manifest: orphan directory, no new version
    vt._new_data_dir(_mk(spark, [(2, "b", 20)]), [])
    assert vt.latest_version() == 1
    assert _rows(vt.read()) == [(1, "a", 10)]
    # vacuum reclaims the orphan, latest still readable
    deleted = vt.vacuum(retain_last=1)
    assert len(deleted) == 1
    assert _rows(vt.read()) == [(1, "a", 10)]


def test_concurrent_commit_conflicts_cleanly(spark, root):
    vt_a = VersionedTable(spark, root)
    vt_b = VersionedTable(spark, root)
    vt_a.write(_mk(spark, [(1, "a", 10)]))
    # both writers materialize data against parent=1; first commit wins
    manifest = {
        "parent": 1,
        "operation": "append",
        "partition_by": [],
        "schema": vt_a._load_manifest(1)["schema"],
        "entries": vt_a._load_manifest(1)["entries"],
    }
    vt_a._commit(dict(manifest))
    with pytest.raises(CommitConflictError):
        vt_b._commit(dict(manifest))
    # loser retries against the new parent and succeeds
    manifest["parent"] = 2
    assert vt_b._commit(dict(manifest)) == 3


def test_snapshot_isolation_under_concurrent_overwrite(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (2, "b", 20)]))
    snapshot = vt.read()  # resolved at version 1
    vt.write(_mk(spark, [(7, "q", 70)]))  # version 2 lands mid-read
    # the held snapshot still reads version 1's immutable files
    assert _rows(snapshot) == [(1, "a", 10), (2, "b", 20)]


def test_merge_partition_scoped_rewrites_only_touched(spark, root):
    vt = VersionedTable(spark, root)
    base = _mk(
        spark,
        [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)],
    )
    vt.write(base, partition_by=["part"])
    dirs_v1 = {e["dir"] for e in vt._load_manifest(1)["entries"]}
    # CDC batch: update id=1 (partition a), insert id=5 (partition a)
    batch = _mk(spark, [(1, "a", 11), (5, "a", 50)])
    vt.merge(batch, keys=["id"])
    m2 = vt._load_manifest(2)
    # parent dir carried forward with partition a excluded; one new dir
    carried = [e for e in m2["entries"] if e["dir"] in dirs_v1]
    fresh = [e for e in m2["entries"] if e["dir"] not in dirs_v1]
    assert len(carried) == 1 and len(fresh) == 1
    assert {"part": "a"} in carried[0]["exclude"]
    # the new dir contains ONLY partition a (b/c untouched on disk)
    fresh_parts = {
        r["part"]
        for r in spark.read.parquet(os.path.join(root, fresh[0]["dir"]))
        .select("part").distinct().collect()
    }
    assert fresh_parts == {"a"}
    assert _rows(vt.read()) == [
        (1, "a", 11), (2, "a", 20), (3, "b", 30), (4, "c", 40), (5, "a", 50)
    ]
    # and equals the full-upsert semantics on the unpartitioned twin
    twin = VersionedTable(spark, tempfile.mkdtemp(prefix="vt-twin-"))
    twin.write(base)
    twin.merge(batch, keys=["id"])
    assert _rows(twin.read()) == _rows(vt.read())
    assert twin._load_manifest(2)["operation"] == "merge-full"


def test_merge_over_cap_falls_back_to_full_rewrite(spark, root):
    """A batch touching more partitions than max_touched_partitions must
    NOT build the per-partition exclusion predicate (driver/Catalyst
    blowup at ~10^4 terms) — it takes the full-snapshot rewrite, with
    identical merge semantics and an over-cap marker in health()."""
    vt = VersionedTable(spark, root, max_touched_partitions=3)
    base = _mk(spark, [(i, f"p{i % 6}", i * 10) for i in range(12)])
    vt.write(base, partition_by=["part"])
    dirs_v1 = {e["dir"] for e in vt._load_manifest(1)["entries"]}
    # batch touches 5 partitions > cap of 3
    batch = _mk(spark, [(i, f"p{i % 6}", i * 10 + 1) for i in range(5)])
    vt.merge(batch, keys=["id"])
    m2 = vt._load_manifest(2)
    assert m2["operation"] == "merge-full"
    # full rewrite: no carried dirs, no exclusion lists
    assert all(e["dir"] not in dirs_v1 for e in m2["entries"])
    assert all(e["exclude"] == [] for e in m2["entries"])
    assert m2["touched_partitions"] == 4  # cap + 1 over-cap sentinel
    assert vt.health()["last_merge_touched_partitions"] == 4
    # semantics identical to an uncapped partition-scoped merge
    twin = VersionedTable(spark, tempfile.mkdtemp(prefix="vt-cap-twin-"))
    twin.write(base, partition_by=["part"])
    twin.merge(batch, keys=["id"])
    assert twin._load_manifest(2)["operation"] == "merge"
    assert twin._load_manifest(2)["touched_partitions"] == 5
    assert _rows(vt.read()) == _rows(twin.read())


def test_drift_report_schema_and_stats(spark, root):
    """drift() reports row_count, schema presence (add AND remove via
    overwrite), type changes, null-rate and numeric mean/min/max with
    deltas — manifests for schema, one agg per snapshot for stats."""
    vt = VersionedTable(spark, root)
    v1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", None)], "k bigint, s string, p double"
    )
    vt.write(v1)
    # overwrite: p removed, flag added, k re-typed to int
    v2 = spark.createDataFrame(
        [(1, "a", 7.0), (2, "b", 8.0), (3, "c", None)],
        "k int, s string, flag double",
    )
    vt.write(v2)
    rows = {
        (r["column"], r["metric"]): (r["v_old"], r["v_new"], r["delta"])
        for r in vt.drift(1, 2).collect()
    }
    assert rows[("*", "row_count")] == (2.0, 3.0, 1.0)
    assert rows[("p", "present")] == (1.0, 0.0, -1.0)
    assert rows[("flag", "present")] == (0.0, 1.0, 1.0)
    assert rows[("k", "type_changed")] == (None, None, None)
    assert rows[("s", "null_rate")] == (0.0, 0.0, 0.0)
    # removed/added columns carry no stat rows; re-typed column stops
    # at the type_changed marker
    assert ("p", "mean") not in rows and ("flag", "null_rate") not in rows
    assert ("k", "mean") not in rows


def test_merge_chain_and_compact(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (3, "b", 30)]), partition_by=["part"])
    vt.merge(_mk(spark, [(1, "a", 11)]), keys=["id"])
    vt.merge(_mk(spark, [(3, "b", 31), (6, "b", 60)]), keys=["id"])
    expect = [(1, "a", 11), (3, "b", 31), (6, "b", 60)]
    assert _rows(vt.read()) == expect
    v = vt.compact()
    assert _rows(vt.read(version=v)) == expect
    m = vt._load_manifest(v)
    assert len(m["entries"]) == 1 and m["entries"][0]["exclude"] == []


def test_health_cadence_and_auto_compact(spark, root):
    """A merge chain trips ``compact_recommended``; compaction resets
    it; ``auto_compact_merges`` runs the reset automatically (the
    drift-detection pattern applied to layout creep)."""
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (3, "b", 30)]), partition_by=["part"])
    h0 = vt.health()
    assert h0["merges_since_compact"] == 0 and not h0["compact_recommended"]
    for i in range(3):
        vt.merge(_mk(spark, [(1, "a", 100 + i)]), keys=["id"])
    h = vt.health(max_merges_since_compact=3)
    assert h["merges_since_compact"] == 3
    assert h["n_entries"] == 4 and h["n_exclusions"] > 0
    assert h["compact_recommended"]
    vt.compact()
    h2 = vt.health(max_merges_since_compact=3)
    assert h2["merges_since_compact"] == 0 and not h2["compact_recommended"]
    assert h2["n_entries"] == 1 and h2["n_exclusions"] == 0

    # auto mode: the 2nd merge triggers a follow-on compact commit whose
    # content equals the merge's
    auto = VersionedTable(spark, tempfile.mkdtemp(prefix="vt-auto-"),
                          auto_compact_merges=2)
    auto.write(_mk(spark, [(1, "a", 10), (3, "b", 30)]), partition_by=["part"])
    auto.merge(_mk(spark, [(1, "a", 11)]), keys=["id"])
    assert auto._load_manifest(auto.latest_version())["operation"] == "merge"
    v = auto.merge(_mk(spark, [(3, "b", 31)]), keys=["id"])
    m = auto._load_manifest(v)
    assert m["operation"] == "compact" and m["merges_since_compact"] == 0
    assert _rows(auto.read()) == [(1, "a", 11), (3, "b", 31)]


def test_delete_cow(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (2, "b", 20), (3, "b", 30)]))
    vt.delete(F.col("part") == "b")
    assert _rows(vt.read()) == [(1, "a", 10)]
    vt2 = VersionedTable(spark, root)
    vt2.delete("val = 10")
    assert _rows(vt2.read()) == []


def test_vacuum_retention(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10)]))
    vt.write(_mk(spark, [(2, "b", 20)]))
    vt.write(_mk(spark, [(3, "c", 30)]))
    deleted = vt.vacuum(retain_last=2)
    assert len(deleted) == 1  # version 1's dir gone
    assert vt.versions() == [2, 3]
    assert _rows(vt.read(version=2)) == [(2, "b", 20)]
    assert _rows(vt.read()) == [(3, "c", 30)]
    with pytest.raises(FileNotFoundError):
        vt._load_manifest(1)


def test_manifest_values_are_json_round_trippable(spark, root):
    """Date-typed partition columns survive the manifest (stored as
    isoformat strings, cast back in the exclusion filter)."""
    import datetime

    vt = VersionedTable(spark, root)
    df = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 10), (2, datetime.date(2024, 1, 2), 20)],
        ["id", "day", "val"],
    )
    vt.write(df, partition_by=["day"])
    batch = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1), 99)], ["id", "day", "val"]
    )
    vt.merge(batch, keys=["id"])
    with open(vt._manifest_path(2)) as f:
        json.load(f)  # must not raise
    assert _rows(vt.read().select("id", "val")) == [(1, 99), (2, 20)]


def test_additive_schema_evolution(spark, root):
    """allow_new_columns: append/merge may ADD columns; older rows
    surface them as typed NULLs; drops and type changes still raise."""
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (2, "b", 20)]))
    widened = spark.createDataFrame(
        [(3, "c", 30, "extra")], "id bigint, part string, val bigint, note string"
    )
    # strict append still rejects
    with pytest.raises(ValueError, match="schema mismatch"):
        vt.write(widened, mode="append")
    vt.write(widened, mode="append", allow_new_columns=True)
    got = {r["id"]: r["note"] for r in vt.read().collect()}
    assert got == {1: None, 2: None, 3: "extra"}
    # merge with the widened schema updates and inserts
    batch = spark.createDataFrame(
        [(1, "a", 11, "upd"), (4, "d", 40, "new")],
        "id bigint, part string, val bigint, note string",
    )
    vt.merge(batch, keys=["id"], allow_new_columns=True)
    rows = {r["id"]: (r["val"], r["note"]) for r in vt.read().collect()}
    assert rows == {1: (11, "upd"), 2: (20, None), 3: (30, "extra"), 4: (40, "new")}
    # a second widening on merge works too
    wider = spark.createDataFrame(
        [(2, "b", 21, None, 7.5)],
        "id bigint, part string, val bigint, note string, score double",
    )
    vt.merge(wider, keys=["id"], allow_new_columns=True)
    r2 = {r["id"]: r["score"] for r in vt.read().collect()}
    assert r2 == {1: None, 2: 7.5, 3: None, 4: None}
    # type change rejected even with evolution on
    bad_type = spark.createDataFrame(
        [(9, "z", "NaN", None, 1.0)],
        "id bigint, part string, val string, note string, score double",
    )
    with pytest.raises(ValueError, match="type conflicts"):
        vt.merge(bad_type, keys=["id"], allow_new_columns=True)
    # dropping a column rejected
    narrower = _mk(spark, [(9, "z", 90)])
    with pytest.raises(ValueError, match="drops columns"):
        vt.merge(narrower, keys=["id"], allow_new_columns=True)
    # time travel to the pre-evolution snapshot keeps the old schema
    assert sorted(vt.read(version=1).columns) == ["id", "part", "val"]


def test_compact_with_zorder_improves_pruning(spark):
    """compact(zorder=...) = OPTIMIZE ZORDER: same content, same
    snapshot semantics, but the rewritten files carry tight min/max
    ranges on the clustered column."""
    import tempfile as _tf

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.layout import (
        pruning_stats,
    )

    o = load(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    r = _tf.mkdtemp(prefix="vt-zc-")
    vt = VersionedTable(spark, r)
    vt.write(o.repartition(16))  # shuffled baseline layout
    before = pruning_stats(
        os.path.join(r, vt._load_manifest(1)["entries"][0]["dir"]), "o_custkey"
    )
    v = vt.compact(zorder=["o_custkey"], target_partitions=16)
    after = pruning_stats(
        os.path.join(r, vt._load_manifest(v)["entries"][0]["dir"]), "o_custkey"
    )
    assert after["avg_overlap_fraction"] < 0.5 * before["avg_overlap_fraction"]
    assert _rows(vt.read()) == _rows(vt.read(version=1))


def test_merge_retry_rederives_against_winner(spark, root):
    """A merge losing the optimistic-concurrency race with retries>0
    must re-derive against the winner's snapshot — the winner's rows
    survive unless the retried batch overwrites their keys."""
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (2, "b", 20)]), partition_by=["part"])

    # sabotage the first commit attempt: another writer lands version 2
    # between this merge's derivation and its commit
    real_commit = vt._commit
    state = {"raced": False}

    def racing_commit(manifest):
        if not state["raced"]:
            state["raced"] = True
            other = VersionedTable(spark, root)
            other.merge(_mk(spark, [(2, "b", 99)]), keys=["id"])
        return real_commit(manifest)

    vt._commit = racing_commit
    vt.merge(_mk(spark, [(1, "a", 11)]), keys=["id"], retries=2)
    vt._commit = real_commit
    # both the winner's update (2->99) and the retried one (1->11) hold
    assert _rows(vt.read()) == [(1, "a", 11), (2, "b", 99)]
    # without retries the same race raises
    state["raced"] = False
    vt._commit = racing_commit
    with pytest.raises(CommitConflictError):
        vt.merge(_mk(spark, [(1, "a", 12)]), keys=["id"])


def test_restore_rolls_back_as_new_commit(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10)]))
    vt.merge(_mk(spark, [(1, "a", 11), (2, "b", 20)]), keys=["id"])
    v3 = vt.restore(1)
    assert v3 == 3
    assert _rows(vt.read()) == [(1, "a", 10)]
    # history preserved: version 2 still readable
    assert _rows(vt.read(version=2)) == [(1, "a", 11), (2, "b", 20)]
    # restored dirs survive vacuum because the new manifest references them
    vt.vacuum(retain_last=1)
    assert _rows(vt.read()) == [(1, "a", 10)]
    with pytest.raises(FileNotFoundError):
        vt.restore(2)  # vacuumed manifest is gone


def test_read_as_of_timestamp(spark, tmp_path):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.versioned import (
        VersionedTable,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.write(spark.createDataFrame([(1,)], "id long"))
    t1 = vt._load_manifest(1)["timestamp"]
    vt.write(spark.createDataFrame([(2,)], "id long"))
    t2 = vt._load_manifest(2)["timestamp"]
    # at t1 (inclusive) the table held [1]; after t2 it holds [2]
    assert [r.id for r in vt.read(as_of=t1).collect()] == [1]
    assert [r.id for r in vt.read(as_of=t2 + 1).collect()] == [2]
    assert vt.version_as_of((t1 + t2) / 2) == 1
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="at or before"):
        vt.read(as_of=t1 - 10)
    with _pytest.raises(ValueError, match="not both"):
        vt.read(version=1, as_of=t1)


def test_changes_classifies_insert_update_delete(spark, root):
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]))
    vt.merge(_mk(spark, [(2, "a", 21), (4, "c", 40)]), keys=["id"])  # v2
    vt.delete(F.col("id") == 1)                                      # v3
    ch = {
        (r.id, r._change): (r.part, r.val)
        for r in vt.changes(1, 3, keys=["id"]).collect()
    }
    assert ch == {
        (4, "insert"): ("c", 40),
        (2, "update_preimage"): ("a", 20),
        (2, "update_postimage"): ("a", 21),
        (1, "delete"): ("a", 10),
    }
    # unchanged key 3 emits nothing; adjacent-pair feed sees only v2's
    # changes
    ch2 = {(r.id, r._change) for r in vt.changes(1, 2, keys=["id"]).collect()}
    assert ch2 == {(4, "insert"), (2, "update_preimage"),
                   (2, "update_postimage")}
    # same-version diff is empty; keys are required
    assert vt.changes(2, 2, keys=["id"]).count() == 0
    with pytest.raises(ValueError, match="key columns"):
        vt.changes(1, 3)


def test_changes_null_safe_value_compare(spark, root):
    """NULL→value and value→NULL transitions are updates (the md5
    length-prefix encoding is NULL-safe and injective)."""
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, None, 10), (2, "x", None)]))
    vt.merge(_mk(spark, [(1, "now", 10), (2, "x", 5)]), keys=["id"])
    ch = {(r.id, r._change) for r in vt.changes(1, 2, keys=["id"]).collect()}
    assert ch == {(1, "update_preimage"), (1, "update_postimage"),
                  (2, "update_preimage"), (2, "update_postimage")}


def test_changes_feed_tags_each_commit(spark, root):
    """The per-commit feed exposes intermediate states the netted diff
    hides: an insert-then-delete key appears in the feed (both ops,
    different commits) but not in changes(1, 3)."""
    vt = VersionedTable(spark, root)
    vt.write(_mk(spark, [(1, "a", 10)]))
    vt.merge(_mk(spark, [(5, "b", 50)]), keys=["id"])   # v2: insert 5
    vt.delete(F.col("id") == 5)                          # v3: delete 5
    feed = {
        (r.id, r._change, r._commit_version)
        for r in vt.changes_feed(1, keys=["id"]).collect()
    }
    assert feed == {(5, "insert", 2), (5, "delete", 3)}
    assert vt.changes(1, 3, keys=["id"]).count() == 0  # netted out
    with pytest.raises(ValueError, match="to_version"):
        vt.changes_feed(3, 3, keys=["id"])
