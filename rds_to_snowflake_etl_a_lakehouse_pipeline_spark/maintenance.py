"""One-call operability for every standing-state surface the engine
maintains. Each index/state family already ships its own
build/probe/append/compact/health verbs; a long-running deployment
accumulates MANY of them (minhash + span + IVF indexes, ER indexes,
sessionize state, incremental-distinct state, batch-partitioned
quarantine/span sinks, versioned tables), and the runbook question is
always the same: *which of my standing tables need attention, and do
it*. :func:`health_sweep` answers the first half in one call by
auto-discovering the engine's tables from the catalog (every standing
index records its family under the ``spark_graft.index.kind`` table
property; state tables are recognized by their recorded contract keys
and partition layout); :func:`run_maintenance` optionally executes the
recommended compactions.

Everything here is CONSTANT-TIME per table relative to data size —
manifest reads, file listings, partition listings, one-row stats reads
— so the sweep is safe to run on a schedule against a lake with
thousands of standing tables. The only data-sized work is inside the
``apply=True`` compactions themselves, each of which is the family's
own documented maintenance verb with its own bounded-cost story.

What each family reports / applies:

========================  ==========================================  ==============================
family (how recognized)    health                                      apply action
========================  ==========================================  ==============================
minhash / span / ivf /     ``io.index_table_health`` (files per        ``io.compact_index_table``
hamming_fp / exact         bucket/cell); ivf adds quantizer drift
(``kind`` property)        from the ``*_drift_stats`` companion
er (``kind='er'``)         the above + ``entity.er_index_health``      ``entity.er_compact_index``
                           (relabel-log size)
sessionize state           partition count + files per partition       — (state compacts itself as
(``state_partitions``)                                                 sessions fuse; report only)
distinct state             files per bucket                            ``io.compact_index_table``
(``state_buckets``)                                                    semantics via bucket rewrite
batch sinks                live ``_batch_id`` partitions + a pending   ``events.compact_batch_
(``_batch_id`` partition)  crashed-fold manifest                       partitions`` (+ fold resume)
versioned tables           ``VersionedTable.health`` (manifest creep)  ``VersionedTable.compact``
(explicit ``roots``)
========================  ==========================================  ==============================

Versioned tables live at filesystem roots, not in the catalog, so they
are passed explicitly; everything else is discovered.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# batch sinks: recommend folding once this many live micro-batch
# partitions accrete (coarse — one fold per sweep keeps it bounded)
MAX_LIVE_BATCH_PARTITIONS = 16
MAX_FILES_PER_BUCKET = 8.0


def _partition_cols(spark: SparkSession, table: str) -> list[str]:
    return [c.name for c in spark.catalog.listColumns(table) if c.isPartition]


def classify_table(spark: SparkSession, table: str) -> str | None:
    """The standing-state family of a catalog table, or None for tables
    this engine doesn't maintain (user data, sinks without state
    contracts). Constant-time: one SHOW TBLPROPERTIES + column listing."""
    from .sources.io import get_table_meta

    meta = get_table_meta(spark, table)
    kind = meta.get("kind")
    if kind in ("minhash", "span", "ivf", "er", "hamming_fp", "exact"):
        return kind
    if "state_partitions" in meta:
        return "session_state"
    if "state_buckets" in meta:
        return "distinct_state"
    if "_batch_id" in _partition_cols(spark, table):
        return "batch_sink"
    return None


def table_health(spark: SparkSession, table: str, family: str) -> dict:
    """One table's health report (family from :func:`classify_table`)."""
    from .sources.io import get_table_meta, index_table_health
    from .streaming.events import _batch_partition_ids, _pending_fold

    if family in ("minhash", "span", "ivf", "hamming_fp", "exact"):
        rep = index_table_health(spark, table, MAX_FILES_PER_BUCKET)
        if family == "ivf" and spark.catalog.tableExists(f"{table}_drift_stats"):
            # the build-time quantizer baseline; per-append drift ratios
            # are measured (and reported) by ivf_append_index itself
            row = spark.table(f"{table}_drift_stats").first()
            rep["build_stats"] = row.asDict() if row is not None else None
        if family == "ivf":
            # per-append drift reports persist in the {table}_drift_log
            # companion (ivf_append_index log_drift=True — the default,
            # so streamed ingests leave a trail); the flag resets when
            # ivf_retrain_index clears the log. Constant-time: the log
            # is one row per append, aggregated, never a data scan.
            rep["retrain_recommended"] = False
            if spark.catalog.tableExists(f"{table}_drift_log"):
                from pyspark.sql import functions as F

                agg = (
                    spark.table(f"{table}_drift_log")
                    .agg(
                        F.count("*").alias("n_appends"),
                        F.max("drift_ratio").alias("max_drift_ratio"),
                        F.max(
                            F.col("rebuild_recommended").cast("int")
                        ).alias("any_flagged"),
                    )
                    .first()
                )
                rep["n_appends_logged"] = agg["n_appends"]
                rep["max_drift_ratio"] = agg["max_drift_ratio"]
                rep["retrain_recommended"] = bool(agg["any_flagged"])
        return rep
    if family == "er":
        from .operators.entity import er_index_health

        rep = index_table_health(spark, table, MAX_FILES_PER_BUCKET)
        # save BEFORE update(): er_index_health carries its own
        # compact_recommended, and update() would clobber the index
        # file-creep verdict, turning the OR into er-OR-er
        files_flag = rep["compact_recommended"]
        er = er_index_health(spark, table)
        rep.update(er)
        rep["compact_recommended"] = files_flag or er["compact_recommended"]
        return rep
    if family == "session_state":
        meta = get_table_meta(spark, table)
        df = spark.table(table)
        n_parts = int(meta.get("state_partitions", 0)) or 1
        n_files = len(df.inputFiles())
        return {
            "state_partitions": n_parts,
            "n_files": n_files,
            "files_per_partition": round(n_files / n_parts, 2),
            # sessionize state rewrites touched partitions whole each
            # batch, so files never accrete per partition — flag only
            # the pathological case
            "compact_recommended": n_files / n_parts > MAX_FILES_PER_BUCKET,
        }
    if family == "distinct_state":
        meta = get_table_meta(spark, table)
        df = spark.table(table)
        n_buckets = int(meta.get("state_buckets", 0)) or 1
        n_files = len(df.inputFiles())
        return {
            "n_buckets": n_buckets,
            "n_files": n_files,
            "files_per_bucket": round(n_files / n_buckets, 2),
            "compact_recommended": n_files / n_buckets > MAX_FILES_PER_BUCKET,
        }
    if family == "batch_sink":
        live = _batch_partition_ids(spark, table)
        pending = _pending_fold(spark, table)
        return {
            "live_batch_partitions": len(live),
            "pending_fold": (
                {"max_fold": pending[0], "archive_id": pending[1], "phase": pending[2]}
                if pending
                else None
            ),
            "compact_recommended": (
                pending is not None or len(live) > MAX_LIVE_BATCH_PARTITIONS
            ),
        }
    raise ValueError(f"unknown standing-state family {family!r}")


def health_sweep(
    spark: SparkSession,
    versioned_roots: tuple[str, ...] = (),
    database: str | None = None,
) -> dict:
    """Health of EVERY standing table the engine maintains, one call:
    ``{"tables": {name: {"family", **health}}, "versioned": {root:
    health}, "attention": [names whose report recommends action]}``.
    Discovery walks the catalog (``database`` or the current one) and
    classifies by recorded metadata — user tables are skipped, never
    scanned. Constant-time per table (see module docstring)."""
    reports: dict[str, dict] = {}
    attention: list[str] = []
    # qualify with the listed table's own database: unqualified names
    # would resolve against the CURRENT database, so sweeping (let
    # alone compacting) database="analytics" from "default" would
    # read/rewrite same-named tables in the wrong database. Temporary
    # views (tableType TEMPORARY, not VIEW) are excluded too — SHOW
    # TBLPROPERTIES on a temp view raises and would abort the sweep.
    names = [
        f"{t.namespace[-1]}.{t.name}" if t.namespace else t.name
        for t in spark.catalog.listTables(database)
        if t.tableType not in ("VIEW", "TEMPORARY") and not t.isTemporary
    ]
    for name in sorted(names):
        family = classify_table(spark, name)
        if family is None:
            continue
        rep = {"family": family, **table_health(spark, name, family)}
        reports[name] = rep
        if rep.get("compact_recommended") or rep.get("retrain_recommended"):
            attention.append(name)
    versioned: dict[str, dict] = {}
    for root in versioned_roots:
        from .sources.versioned import VersionedTable

        h = VersionedTable(spark, root).health()
        versioned[root] = h
        if h.get("compact_recommended"):
            attention.append(root)
    return {"tables": reports, "versioned": versioned, "attention": attention}


def run_maintenance(
    spark: SparkSession,
    versioned_roots: tuple[str, ...] = (),
    database: str | None = None,
    apply: bool = False,
    keep_last: int = 1,
    retrain_ivf: bool = False,
) -> dict:
    """The runbook: :func:`health_sweep`, then (``apply=True``) execute
    each flagged table's own maintenance verb — index compaction
    (minhash/span/ivf/er), batch-sink folding (including resuming a
    crashed fold from its manifest), versioned-table compaction. Each
    action is the family's documented, bounded-cost operation. Run
    while the owning streams are stopped. Returns the sweep plus
    ``{"applied": {name: action}}``.

    IVF quantizer drift: flagged tables (``retrain_recommended`` from
    the persisted per-append drift log) are retrained via
    ``similarity.ivf_retrain_index`` only when ``retrain_ivf=True`` —
    it is a data-sized rebuild (one bounded fit + one assignment pass
    over the index), not a constant-cost compaction, and it ROTATES the
    centroid matrix (probes holding the old matrix are rejected until
    they pick up the new one), so it stays opt-in rather than riding
    the generic ``apply``. The index carries everything the retrain
    needs; PQ-coded indexes are skipped with a note (the rebuild needs
    the caller-held codebook — call ``ivf_retrain_index`` directly).
    When the drift is one or two overfull cells rather than a globally
    stale quantizer, ``similarity.ivf_split_hot_cells`` is the cheaper
    surgical alternative (rewrites only the hot partitions) — invoked
    directly, not through this generic sweep."""
    sweep = health_sweep(spark, versioned_roots, database)
    applied: dict[str, str] = {}
    if apply:
        for name in sweep["attention"]:
            if name in sweep["versioned"]:
                from .sources.versioned import VersionedTable

                VersionedTable(spark, name).compact()
                applied[name] = "versioned_compact"
                continue
            family = sweep["tables"][name]["family"]
            if family == "ivf" and sweep["tables"][name].get(
                "retrain_recommended"
            ):
                if not retrain_ivf:
                    applied[name] = "retrain_skipped (pass retrain_ivf=True)"
                    continue
                from .sources.io import get_table_meta

                if get_table_meta(spark, name).get("pq") == "true":
                    applied[name] = (
                        "retrain_skipped (PQ index needs its codebook; "
                        "call ivf_retrain_index directly)"
                    )
                    continue
                from .operators.similarity import ivf_retrain_index

                ivf_retrain_index(spark, name)
                applied[name] = "ivf_retrain_index"
            elif family in ("minhash", "span", "ivf", "hamming_fp", "exact"):
                from .sources.io import compact_index_table

                compact_index_table(spark, name)
                applied[name] = "compact_index_table"
            elif family == "distinct_state":
                # same stage-and-swap as compact_index_table, with the
                # bucket spec from the distinct-state contract (bucketed
                # on ALL columns — the tuple IS the key)
                from .sources.io import get_table_meta, set_table_meta, write_table

                meta = get_table_meta(spark, name)
                n = int(meta.get("state_buckets", 0))
                rows = spark.table(name).distinct().localCheckpoint(eager=True)
                write_table(
                    rows, name,
                    bucket_by=(n, rows.columns) if n else None,
                )
                set_table_meta(spark, name, **meta)
                applied[name] = "distinct_state_rewrite"
            elif family == "er":
                from .operators.entity import er_compact_index

                er_compact_index(spark, name)
                applied[name] = "er_compact_index"
            elif family == "batch_sink":
                from .streaming.events import compact_batch_partitions

                compact_batch_partitions(spark, name, keep_last=keep_last)
                applied[name] = "compact_batch_partitions"
            # session_state: no action (self-compacting), report only
    sweep["applied"] = applied
    return sweep
