"""Sources and sinks (SURVEY.md §2.1, S1–S8).

The reference reads RDS tables through the Glue Catalog and writes
S3 Parquet with catalog registration (bronze/crm_cust_info_bronze.py:24-47)
plus a Snowflake sink for gold (dim_customers_gold.py:72-81). Here the
Spark session catalog plays the Glue Catalog's role: ``saveAsTable``
registers, ``spark.table`` resolves. JDBC reads are partitioned so a
1000-executor cluster ingests in parallel instead of through one
connection.

Standing-index contract (shared by every incremental index family —
``minhash_*_index``, ``span_*_index``, ``ivf_*_index``, ``er_*_index``):

- **build** writes the bucketed/partitioned table, then records its
  immutable parameters via :func:`set_table_meta` (``kind`` plus the
  layout/signature params: ``k``, ``n_buckets``, ``num_hashes``,
  ``bands``, ``shingle_n``, ``n_clusters``, ``centroid_fp``, …);
- **probe / append** call :func:`check_table_meta` first — explicit
  parameters must MATCH the recorded contract (mismatches raise,
  because a silent mismatch deduplicates/probes nothing), and layout
  parameters left as ``None`` DEFAULT from it;
- **compact / rebuild** re-record the contract after rewriting;
- **health** is a cheap dict (``*_index_health`` / ``health()`` /
  the append's returned drift dict) with a ``*_recommended`` flag the
  pipeline can act on (or an ``auto_*`` knob that acts on it).

A new index family implements those verbs against these helpers — the
lifecycle itself is not re-invented per family.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S5: path-based parquet scan (recursive; pushdown/pruning free)."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Path-based ORC scan. Same columnar pushdown/pruning class as
    parquet (ORC ships min/max stripe stats and optional bloom
    filters); the lake interchange format when the surrounding stack is
    Hive/Trino-flavored rather than parquet-flavored."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """S4: CSV with explicit schema (no inference job at 100 TB — pass the
    DDL; inference reads the data twice). Mirrors the reference's headered
    bulk loads (crm_data_load.sql:2-20, ``IGNORE 1 LINES``).
    """
    reader = spark.read.options(header=str(header).lower(), **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines source with explicit schema (inference = a full extra
    pass at 100 TB; always pass the DDL in production)."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """S2/S3: JDBC source (MySQL ``jdbc:mysql://``, Postgres
    ``jdbc:postgresql://``). With ``partition_column``, Spark opens
    ``num_partitions`` parallel cursors — the scale path for RDS
    ingest; without it the read is single-connection (dev only).

    Bounds are AUTO-DERIVED when omitted (round 12): giving
    ``partition_column`` with EITHER bound missing runs ONE pushed-down
    ``SELECT MIN(col), MAX(col)`` probe over the same connection and
    fills the missing side(s) — an explicitly passed bound is kept and
    only its counterpart comes from the probe; the probe is skipped
    only when BOTH bounds are passed (use that when the table is hot
    and an index-backed MIN/MAX would still be a scan). These are the
    numbers the reference's Glue catalog supplied implicitly
    (bronze/crm_cust_info_bronze.py:24-27). An empty table falls back
    to a single-connection read (no rows to stride over).

    Because the probe interpolates ``table`` and ``partition_column``
    into SQL text, the auto-bounds path REQUIRES both to be
    identifier-shaped (dotted ``schema.table`` allowed) and raises
    ``ValueError`` otherwise — the injection surface is closed rather
    than trusted. Callers with exotic names (quoted specials) or
    subquery dbtables must pass both bounds explicitly; the non-probe
    path hands ``table`` to Spark's JDBC reader untouched.

    Requires the matching JDBC driver jar on the classpath. Round-trip
    (write + 4-cursor partitioned read, manual AND auto bounds) is
    exercised against embedded Derby — the driver Spark ships — in
    ``tests/test_io.py``; only the URL/driver differ for
    MySQL/Postgres.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None and (
        lower_bound is None or upper_bound is None
    ):
        # identifier gate BEFORE interpolating into the probe SQL:
        # table/partition_column may carry catalog-config strings, and
        # an unvalidated value would splice arbitrary SQL into the
        # probe connection. $ and # cover Oracle/temp-table idioms.
        _ident = re.compile(r"[A-Za-z_][A-Za-z0-9_$#]*")
        if not all(_ident.fullmatch(seg) for seg in table.split(".")) or not table:
            raise ValueError(
                "read_jdbc auto-bounds probe requires an identifier-"
                f"shaped table (got {table!r}); pass lower_bound and "
                "upper_bound explicitly for quoted/subquery dbtables"
            )
        if not _ident.fullmatch(partition_column):
            raise ValueError(
                "read_jdbc auto-bounds probe requires an identifier-"
                f"shaped partition_column (got {partition_column!r}); "
                "pass both bounds explicitly to skip the probe"
            )
        # one-row, one-connection bounds probe, computed BY the
        # database (MIN/MAX push down; nothing but two values move).
        # Quote the column through Spark's own dialect registry so
        # case-sensitive identifiers survive (Spark's JDBC writer
        # quotes column names at CREATE, so an unquoted probe would
        # get case-folded by the database — backticks on MySQL,
        # double quotes on Postgres/Derby).
        try:
            qcol = (
                spark._jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
                .quoteIdentifier(partition_column)
            )
        except Exception:  # non-JVM session stub: fall back unquoted
            qcol = partition_column
        probe = (
            spark.read.format("jdbc")
            .option("url", url)
            .option(
                "dbtable",
                f"(SELECT MIN({qcol}) AS lo, "
                f"MAX({qcol}) AS hi FROM {table}) bounds_probe",
            )
        )
        for k, v in options.items():
            probe = probe.option(k, v)
        row = probe.load().first()
        lo = row[0] if lower_bound is None else lower_bound
        hi = row[1] if upper_bound is None else upper_bound
        if lo is None or hi is None:  # empty table: nothing to stride
            partition_column = None
        else:
            lower_bound, upper_bound = lo, hi
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


# tables whose pre-write crash-recovery probe already ran this
# process (see write_table); keyed by the caller's table string, so a
# qualified/unqualified alias costs at most one duplicate probe
_HEAL_CHECKED: set[str] = set()


def write_table(
    df: DataFrame,
    table: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bucket_by: tuple[int, list[str]] | None = None,
    compression: str = "snappy",
    bloom_filter_cols: list[str] | None = None,
    format: str = "parquet",
) -> None:
    """S6: Parquet+Snappy table write with catalog registration — the
    Spark-native form of the reference's ``getSink(...glueparquet,
    snappy) + setCatalogInfo`` (bronze/crm_cust_info_bronze.py:37-47).

    The reference writes unpartitioned (``partitionKeys=[]``); pass
    ``partition_by`` (e.g. order-date month on facts) to get partition
    pruning at scale, and/or ``bucket_by=(n, cols)`` to hash-bucket +
    sort on the join key: two tables bucketed the same way join with
    ZERO exchanges (the shuffle is paid once at write time, amortized
    over every later join — the co-located-join strategy for repeated
    fact⋈fact joins at 100 TB).

    Overwrite is fail-safe (write-then-swap): when the target already
    exists, the new data is fully materialized into a ``__stage`` table
    first, and only then is the old table dropped and the stage renamed
    into place (``ALTER TABLE RENAME`` moves the managed location). A
    failed write therefore never destroys existing data, and a plan that
    READS the target table overwrites it correctly — the read is consumed
    by the stage write before the drop. The only destructive-before-write
    path left is the LOCATION_ALREADY_EXISTS retry, which clears a stale
    directory that is provably unregistered (an orphan from a previous
    session whose in-memory catalog is gone).

    ``format``: ``"parquet"`` (default) or ``"orc"`` — both columnar
    with snappy compression, stats-based skipping, and per-column bloom
    filters (ORC spells them ``orc.bloom.filter.columns``); the
    stage-and-swap / partition / bucket semantics are identical.
    """
    if format not in ("parquet", "orc"):
        raise ValueError(f"unsupported table format {format!r} (parquet|orc)")
    spark = df.sparkSession
    writer = df.write.mode(mode).format(format).option("compression", compression)
    if bloom_filter_cols and format == "orc":
        writer = writer.option(
            "orc.bloom.filter.columns", ",".join(bloom_filter_cols)
        )
    elif format == "parquet":
        for c in bloom_filter_cols or []:
            # point-lookup row-group skipping on unsorted high-cardinality
            # keys (see sources/layout.py::bloom_filtered_write for the
            # rationale + the reader-level proof test)
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bucket_by:
        n, cols = bucket_by
        writer = writer.bucketBy(n, *cols).sortBy(*cols)
    # self-heal a swap interrupted between its DROP and RENAME: the
    # stage holds the fully-materialized new data (saveAsTable
    # registers the stage only on commit) and the table name dangles —
    # complete the rename so this write (and any reader racing it)
    # sees the committed table again. EVERY mode heals first: an
    # append to a dangling base would otherwise create a fresh table
    # of just the appended rows and flip the committed stage into
    # "stale" — exactly the content the sweep would then reclaim.
    # Memoized per process: the interrupted states the heal repairs
    # can only PREDATE this session (a crash killed the session that
    # created them; our own completed writes below leave the catalog
    # consistent, and a write that raises mid-swap un-memoizes so its
    # retry re-probes) — so one catalog probe per table amortizes the
    # per-write cost to zero on the streaming append hot path.
    # maintenance.health_sweep flags the same state for tables that
    # are never written again.
    if table not in _HEAL_CHECKED:
        heal_interrupted_swap(spark, table)
        _HEAL_CHECKED.add(table)
    try:
        if mode == "overwrite" and spark.catalog.tableExists(table):
            stage = f"{table}__stage"
            spark.sql(f"DROP TABLE IF EXISTS {stage}")
            _save_with_orphan_retry(spark, writer, stage)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
            if partition_by:
                # the rename moves the managed directory but NOT the
                # catalog's partition entries — without recovery a
                # swapped partitioned table lists zero partitions and
                # reads empty
                spark.sql(f"MSCK REPAIR TABLE {table}")
        else:
            _save_with_orphan_retry(spark, writer, table)
    except BaseException:
        # the write may have died inside the swap (stage committed,
        # base dropped) — a caught-and-retried write must re-probe
        _HEAL_CHECKED.discard(table)
        raise


def heal_interrupted_swap(spark: SparkSession, table: str) -> bool:
    """Complete a :func:`write_table` overwrite that crashed between
    dropping the old table and renaming ``{table}__stage`` into place:
    the stage is the COMMITTED new content (``saveAsTable`` registers
    it only after the write succeeds), so when the base name dangles
    the rename is strictly recovery — without it the data is
    unreachable and every read of ``table`` fails. Partition entries
    are re-derived after the move (the rename relocates the managed
    directory but not the catalog's partition list). Returns True when
    a swap was completed. The OTHER interrupted state — base AND stage
    both present (crash between the stage commit and the drop) — is
    deliberately NOT completed here: the overwrite never returned to
    its caller, so the current base table stays authoritative and the
    next overwrite (or ``maintenance.run_maintenance``) discards the
    stale stage. When nothing is pending, the call still repairs a
    half-completed PREVIOUS heal/swap (renamed but killed before its
    MSCK): a partitioned base listing zero partition entries is
    re-repaired, closing the recovery verb's own crash window."""
    stage = f"{table}__stage"
    if spark.catalog.tableExists(table) or not spark.catalog.tableExists(stage):
        # also repair the heal's OWN crash window: a heal (or swap)
        # killed between its RENAME and MSCK leaves a partitioned base
        # whose partition entries still point into the retired
        # ``__stage`` directory (the rename moves the managed dir and
        # retargets the TABLE location, but each partition keeps its
        # old absolute path) — reads silently return empty until
        # repaired. Detect-and-repair here, which every write_table
        # call (any mode) routes through, so the table self-repairs on
        # its next touch. Catalog-only cost: one listColumns, and for
        # partitioned tables one SHOW PARTITIONS + two DESCRIBEs.
        if spark.catalog.tableExists(table) and any(
            c.isPartition for c in spark.catalog.listColumns(table)
        ):
            if _partitions_stale(spark, table):
                spark.sql(f"MSCK REPAIR TABLE {table}")
        return False
    spark.sql(f"ALTER TABLE {stage} RENAME TO {table}")
    if any(c.isPartition for c in spark.catalog.listColumns(table)):
        spark.sql(f"MSCK REPAIR TABLE {table}")
    return True


def _partitions_stale(spark: SparkSession, table: str) -> bool:
    """True when a partitioned table's entries need MSCK: zero entries
    registered, or the FIRST entry's location is not under the table's
    root directory (a crashed rename leaves EVERY entry pointing into
    the retired ``__stage`` path, so one probe decides). Best-effort:
    an unparsable partition spec (exotic escaped values) falls back to
    "stale" — MSCK is idempotent and merely re-lists the table dir."""
    first = spark.sql(f"SHOW PARTITIONS {table}").head(1)
    if not first:
        return True
    try:
        from urllib.parse import unquote

        spec = ", ".join(
            "{}='{}'".format(k, unquote(v).replace("'", "\\'"))
            for k, v in (
                kv.split("=", 1) for kv in first[0][0].split("/")
            )
        )
        part_loc = next(
            r["data_type"]
            for r in spark.sql(
                f"DESCRIBE FORMATTED {table} PARTITION ({spec})"
            ).collect()
            if r["col_name"] == "Location"
        )
        root = next(
            r["data_type"]
            for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
            if r["col_name"] == "Location"
        )
        # trailing slash on the root avoids the "{table}__stage is a
        # string-prefix of {table}" trap
        return not part_loc.startswith(root.rstrip("/") + "/")
    except Exception:  # noqa: BLE001 — detection only; repair is safe
        return True


def _save_with_orphan_retry(spark: SparkSession, writer, table: str) -> None:
    """``saveAsTable`` with one retry for LOCATION_ALREADY_EXISTS: the
    table is absent from the catalog but its managed directory survives on
    local disk (previous session's in-memory catalog is gone). Clear
    exactly that stale directory and retry; every other error re-raises
    untouched with no deletion.
    """
    try:
        writer.saveAsTable(table)
        return
    except Exception as e:  # noqa: BLE001 — re-raised unless the orphan case
        error_class = getattr(e, "getErrorClass", lambda: None)() or ""
        if "LOCATION_ALREADY_EXISTS" not in error_class and (
            "LOCATION_ALREADY_EXISTS" not in str(e)
        ):
            raise
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    parts = table.split(".")
    db = parts[-2] if len(parts) >= 2 else spark.catalog.currentDatabase()
    loc = urlparse(spark.catalog.getDatabase(db).locationUri)
    if loc.scheme in ("", "file"):
        stale = os.path.join(loc.path, parts[-1])
        if os.path.exists(stale):
            shutil.rmtree(stale)
    writer.saveAsTable(table)


_INDEX_META_PREFIX = "spark_graft.index."


def set_table_meta(spark: SparkSession, table: str, **props) -> None:
    """Record index-contract parameters (k, n_buckets, num_hashes, …) as
    table properties on a catalog table, namespaced under
    ``spark_graft.index.*``. Standing-index builders call this at build
    time so probes/appends can validate their parameters against the
    table's actual contract instead of trusting the caller (a ``k``
    mismatch on a fingerprint index is otherwise SILENTLY wrong: the
    grams never match and everything passes through undeduped)."""
    kv = ", ".join(f"'{_INDEX_META_PREFIX}{k}'='{v}'" for k, v in props.items())
    spark.sql(f"ALTER TABLE {table} SET TBLPROPERTIES ({kv})")


def get_table_meta(spark: SparkSession, table: str) -> dict[str, str]:
    """Read back the ``spark_graft.index.*`` properties set by
    :func:`set_table_meta`. Empty dict for tables that predate metadata
    (or were built elsewhere) — callers treat missing keys as
    unvalidatable, not as a mismatch."""
    rows = spark.sql(f"SHOW TBLPROPERTIES {table}").collect()
    plen = len(_INDEX_META_PREFIX)
    return {
        r["key"][plen:]: r["value"]
        for r in rows
        if r["key"].startswith(_INDEX_META_PREFIX)
    }


def mark_layout_pending(
    spark: SparkSession,
    table: str,
    verb: str,
    target: str,
    snapshot: dict | None = None,
) -> None:
    """Persist a one-row ``{table}_retune_pending`` marker BEFORE a
    layout-deriving rewrite (index build / reband / reblock) mutates
    the table. The rewrite's stage-and-swap is old-or-new per table,
    but the CONTRACT update (``set_table_meta``) is a separate
    statement — a crash between them leaves data derived under the new
    parameters with the old parameters still recorded, and every later
    probe then joins DISJOINT key spaces (old-width bands vs new-width
    buckets, right-6 vs right-8 blocks) and silently returns nothing:
    dedup passes everything through, ER resolves records standalone.
    While the marker exists, :func:`check_table_meta` — the gate every
    probe/append already passes through — refuses with recovery
    advice, and :func:`clear_layout_pending` is called only after the
    contract commit, so the window is fail-loud instead of
    fail-silent. The verbs re-derive from state that survives both
    the old and new layout (band-0 signature slice / stored
    fingerprints / stored text), so a re-run from ANY window converges.

    ``snapshot`` carries the table's PRE-rewrite contract metadata:
    the swap destroys the table's properties along with the table, so
    without the snapshot a resume could not recover the invariant
    parameters (num_hashes, n_buckets, shingle_n, …) the re-run needs.
    """
    import json

    spark.createDataFrame(
        [(verb, target, json.dumps(snapshot or {}))],
        "verb string, target string, snapshot string",
    ).write.mode("overwrite").saveAsTable(f"{table}_retune_pending")


def clear_layout_pending(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}_retune_pending")


def get_layout_pending(spark: SparkSession, table: str) -> dict | None:
    """The pending layout rewrite recorded for ``table``, or None:
    ``{"verb", "target", "snapshot"}`` with ``snapshot`` the
    pre-rewrite contract metadata (empty dict on legacy markers)."""
    import json

    t = f"{table}_retune_pending"
    if not spark.catalog.tableExists(t):
        return None
    row = spark.table(t).first()
    if row is None:
        return None
    snap = {}
    if "snapshot" in row.__fields__:
        try:
            snap = json.loads(row["snapshot"])
        except Exception:  # noqa: BLE001 — diagnostics only
            snap = {}
    return {"verb": row["verb"], "target": row["target"], "snapshot": snap}


def check_table_meta(spark: SparkSession, table: str, **expected) -> dict[str, str]:
    """Validate probe/append parameters against a standing index's
    recorded contract. Raises ``ValueError`` listing every mismatching
    key; keys absent from the table's metadata are skipped (pre-metadata
    indexes stay usable). Returns the full recorded metadata so callers
    can default unspecified parameters (e.g. ``n_buckets``) from it.

    Also refuses (``RuntimeError``) while a ``{table}_retune_pending``
    marker exists: an index build/reband/reblock crashed between its
    data swap and its contract commit, so the recorded parameters may
    not describe the data — probing would silently join disjoint key
    spaces (see :func:`mark_layout_pending`). Re-run the recorded verb
    (or ``maintenance.run_maintenance(apply=True)``, which resumes
    integer retune targets automatically) to converge."""
    pending = get_layout_pending(spark, table)
    if pending is not None:
        raise RuntimeError(
            f"index {table!r} has an interrupted layout rewrite "
            f"({pending['verb']}, target {pending['target']!r}): its data "
            "and recorded contract may disagree, and probing would "
            "silently join disjoint key spaces. Re-run the verb (or "
            "maintenance.run_maintenance(apply=True)) to converge."
        )
    meta = get_table_meta(spark, table)
    bad = {
        k: (meta[k], str(v))
        for k, v in expected.items()
        if v is not None and k in meta and meta[k] != str(v)
    }
    if bad:
        detail = ", ".join(
            f"{k}: index has {have!r}, caller passed {want!r}"
            for k, (have, want) in sorted(bad.items())
        )
        raise ValueError(
            f"index contract mismatch on table {table!r}: {detail} "
            "(parameters are fixed at build time; rebuild the index or "
            "match its recorded values)"
        )
    return meta


def index_table_health(
    spark: SparkSession, table: str, max_files_per_bucket: float = 8.0
) -> dict:
    """Small-file health for a bucketed or cell-partitioned standing
    index: every append adds one file per bucket (or touched cell
    directory), so a long append chain turns each into dozens of small
    files and probe-side scan cost creeps. Returns ``{n_files,
    n_buckets, files_per_bucket, compact_recommended}`` (for the IVF
    family ``n_buckets`` is the recorded cell count) — the
    minhash/span/IVF twin of ``VersionedTable.health`` /
    ``er_index_health``, completing the contract's health verb for
    every index family. Constant-time metadata: a file listing, no
    data scan."""
    df = spark.table(table)
    n_files = len(df.inputFiles())
    meta = get_table_meta(spark, table)
    # bucketed families record n_buckets; the cell-partitioned IVF
    # family records n_clusters — the per-append file fanout is the
    # one recorded, or their PRODUCT for the combined layout (IVF is
    # cell-partitioned AND id-bucketed since the flat-probe fix)
    _b = int(meta.get("n_buckets", 0) or 0)
    _c = int(meta.get("n_clusters", 0) or 0)
    n_buckets = (_b * _c if _b and _c else _b or _c) or 1
    ratio = n_files / n_buckets
    return {
        "n_files": n_files,
        "n_buckets": n_buckets,
        "files_per_bucket": round(ratio, 2),
        "compact_recommended": ratio > max_files_per_bucket,
    }


def compact_index_table(spark: SparkSession, table: str) -> None:
    """Rewrite a bucketed standing index as one file set: same bucket
    spec (read from the recorded ``spark_graft.index.*`` metadata),
    rows deduplicated (appends may have raced identical fingerprints),
    metadata re-recorded after the stage-and-swap. Resets the
    small-file creep :func:`index_table_health` measures; semantics
    are unchanged — existence-set indexes (span) and signature indexes
    (minhash) both tolerate row dedup by construction.

    Crash-safe via the ``{table}_retune_pending`` marker: the swap
    destroys the table's properties, so a crash before the re-record
    would otherwise leave a contract-less index — probes would skip
    validation, appends would fall back to default bucket counts, and
    the sweep could no longer classify the table. While the marker is
    pending probes refuse, and a re-run (or the maintenance sweep's
    auto-resume) restores the contract from the marker's snapshot —
    the layout is unchanged by compaction, so the resume is exact."""
    meta = get_table_meta(spark, table)
    if not meta:
        pending = get_layout_pending(spark, table)
        if pending is not None:
            meta = dict(pending["snapshot"])
    rows = spark.table(table).distinct()
    bucket_by = (
        (int(meta["n_buckets"]), meta["bucket_cols"].split(","))
        if "bucket_cols" in meta and "n_buckets" in meta
        else None
    )
    partition_by = (
        meta["partition_cols"].split(",") if "partition_cols" in meta else None
    )
    if bucket_by or partition_by:
        # the IVF family records BOTH (cell-partitioned for probe
        # pruning, id-bucketed for the flat streaming replay probe) —
        # a compaction that dropped either half would silently change
        # the layout contract the probes rely on
        mark_layout_pending(
            spark, table, "compact_index_table", "", snapshot=meta
        )
        write_table(
            rows, table, partition_by=partition_by, bucket_by=bucket_by
        )
    else:
        raise ValueError(
            f"{table!r} records no bucket/partition layout metadata; only "
            "indexes built by this library's *_build_index functions are "
            "compactable generically"
        )
    set_table_meta(spark, table, **meta)
    clear_layout_pending(spark, table)


def connection_config(prefix: str, keys: tuple[str, ...]) -> dict[str, str]:
    """S8: env-backed connection config (offline stand-in for the
    reference's Secrets Manager fetch, utils.py:5-16). Reads
    ``{PREFIX}_{KEY}`` env vars; missing keys are omitted.
    """
    out = {}
    for k in keys:
        v = os.environ.get(f"{prefix}_{k}".upper())
        if v is not None:
            out[k.lower()] = v
    return out


def snowflake_options(prefix: str = "snowflake") -> dict[str, str]:
    """The Snowflake connector option dict the reference builds by hand
    (dim_customers_gold.py:72-78 / fact_sales_gold.py:78-84):
    ``{PREFIX}_URL/USER/PASSWORD/DATABASE/WAREHOUSE`` env vars mapped to
    the connector's ``sfURL/sfUser/sfPassword/sfDatabase/sfWarehouse``
    keys. The env fetch of user+password stands in for the reference's
    Secrets Manager call (utils.py:5-16) — same sourcing contract,
    offline-testable. Missing vars are omitted so the connector's own
    validation names what's absent."""
    key_map = {
        "url": "sfURL",
        "user": "sfUser",
        "password": "sfPassword",
        "database": "sfDatabase",
        "warehouse": "sfWarehouse",
    }
    cfg = connection_config(prefix, tuple(key_map))
    return {key_map[k]: v for k, v in cfg.items()}


@dataclass
class WarehouseSink:
    """S7: warehouse sink abstraction (the reference's Snowflake writer,
    dim_customers_gold.py:72-81, with the intended ``.option("dbtable",…)``
    semantics — the original chained ``.options(...)`` positionally, which
    is invalid PySpark).

    backend="catalog" (default) writes to the session catalog via
    ``saveAsTable`` — the locally-testable stand-in. backend="jdbc" is
    tested against embedded Derby
    (``tests/test_io.py::test_jdbc_roundtrip_embedded_derby``);
    backend="snowflake" builds the real connector write. The live
    Snowflake write needs the connector jar + network, but its EXACT
    contract — format, ``dbtable``, mode, secret-sourced credential
    options — is pinned offline by :meth:`plan` plus
    ``tests/test_io.py::test_warehouse_sink_snowflake_contract``
    (a recording fake drives :meth:`write` end to end).
    """

    backend: str = "catalog"
    options: dict[str, str] = field(default_factory=dict)

    def plan(self, table: str, mode: str = "overwrite") -> dict:
        """The exact write the backend will issue, as data:
        ``{"format", "mode", "options"}`` with ``dbtable`` folded into
        options for connector backends. This IS the contract the live
        write executes (``write`` consumes it verbatim), so tests pin
        connector semantics without a jar or network."""
        if self.backend == "catalog":
            return {"format": "catalog", "mode": mode, "options": {"table": table}}
        if self.backend not in ("jdbc", "snowflake"):
            raise ValueError(f"unknown warehouse backend: {self.backend}")
        return {
            "format": self.backend,
            "mode": mode,
            "options": {**self.options, "dbtable": table},
        }

    def write(self, df: DataFrame, table: str, mode: str = "overwrite") -> None:
        p = self.plan(table, mode)
        if p["format"] == "catalog":
            write_table(df, table, mode=mode)
            return
        writer = df.write.format(p["format"]).mode(p["mode"])
        for k, v in p["options"].items():
            writer = writer.option(k, v)
        writer.save()
