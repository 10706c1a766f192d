"""Snapshot-versioned parquet tables (transactional-lite lakehouse layout).

The reference overwrites its S3 Parquet tables in place on every run
(bronze/crm_cust_info_bronze.py:37-47 — ``getSink`` with no staging), so
a reader that lists the prefix mid-write sees a half-written table, and
a failed job destroys the previous state. ``write_table``'s
stage-and-swap (io.py) fixes the *failure* half of that but still leaves
a window where the catalog has no table at all, and MERGE is a full
rewrite.

:class:`VersionedTable` closes both gaps with the manifest-pointer
design Delta Lake / Iceberg use, reduced to what plain parquet + an
atomic filesystem rename can provide:

- every commit writes its data files into a **fresh immutable directory**
  (``d-<uuid>/``), then publishes a JSON **manifest**
  (``_versions/%012d.json``) listing exactly which directories (minus
  which partitions) make up that version;
- the manifest file is created with ``O_EXCL`` — two concurrent writers
  racing for the same version number conflict explicitly
  (:class:`CommitConflictError`) instead of silently interleaving
  (optimistic concurrency, one winner);
- **readers never block and never see partial state**: a snapshot is
  resolved from committed manifests only, and the directories it
  references are immutable, so a reader holding version N keeps a
  consistent view while any number of later commits land;
- a crash before the manifest rename leaves an orphan data directory
  (space, not correctness — reclaimed by :meth:`vacuum`) and the
  previous version intact;
- old versions stay readable (**time travel**) until vacuumed.

MERGE is copy-on-write. On a table partitioned by ``partition_by``, a
merge whose source carries the partition columns rewrites **only the
touched partitions**: untouched data directories are carried into the
new manifest with the touched partition values added to their exclusion
list, so a 10-row late-arriving batch against a 100 TB table rewrites
one partition, not the table. The exclusion filters are equality
predicates on partition columns — Catalyst turns them into partition
pruning, so excluded directories are never scanned for those values.

Schema evolution is ADDITIVE only (``allow_new_columns=True`` on
append/merge): the manifest records the widened schema and readers
surface pre-evolution rows with typed NULLs for the new columns —
the one evolution plain parquet supports without rewrites. Renames,
drops, and type changes require an overwrite.

This is deliberately NOT Delta/Iceberg (no file-level stats, no
distributed commit service): it is the smallest layout that gives
atomic publish + snapshot isolation + time travel + bounded MERGE on
any filesystem with atomic rename (HDFS, local; on S3 use a
rename-capable layer or a real table format).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSIONS_DIR = "_versions"
_MANIFEST_FMT = "%012d.json"


def _json_safe(v):
    """Partition values travel through JSON manifests; dates/decimals
    become strings and are cast back to the partition column's type when
    the exclusion filter is rebuilt."""
    import datetime
    import decimal

    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return str(v)
    return v


def _eq_or_null(c: str, v, dtype):
    return F.col(c).isNull() if v is None else F.col(c) == F.lit(v).cast(dtype)


class CommitConflictError(RuntimeError):
    """Another writer committed this version first (optimistic
    concurrency): re-read the latest snapshot, reapply, retry."""


class VersionedTable:
    """A snapshot-versioned parquet table rooted at ``root``.

    Usage::

        vt = VersionedTable(spark, "/lake/gold/dim_customers")
        vt.write(df)                      # version 1 (overwrite)
        vt.write(delta, mode="append")    # version 2, old files reused
        vt.merge(cdc_batch, keys=["id"])  # version 3, COW upsert
        vt.read()                         # latest snapshot
        vt.read(version=1)                # time travel
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        auto_compact_merges: int | None = None,
        max_touched_partitions: int = 4096,
    ):
        self.spark = spark
        self.root = root
        # partition-scoped-merge guard: the touched-partition list is a
        # driver collect AND becomes an OR-of-ANDs exclusion predicate
        # evaluated per carried directory — both degrade past ~10^4
        # values. Past the cap, merge falls back to a full-snapshot
        # rewrite (the honest cost; same contract as an unpartitioned
        # table) instead of stressing the driver/Catalyst. The collect
        # itself is bounded by limit(cap + 1), never by batch width.
        self.max_touched_partitions = max_touched_partitions
        # merge-cadence guard: SCALE.md measures ~+70% per-merge cost by
        # merge 8 from exclusion-list + directory accretion, linear and
        # reset by compact(). auto_compact_merges=N compacts
        # automatically once N consecutive layout-dirtying commits have
        # accreted; None leaves maintenance manual but
        # :meth:`health` still reports ``compact_recommended``.
        self.auto_compact_merges = auto_compact_merges
        os.makedirs(os.path.join(root, _VERSIONS_DIR), exist_ok=True)

    # ------------------------------------------------------------- manifests

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.root, _VERSIONS_DIR, _MANIFEST_FMT % version)

    def versions(self) -> list[int]:
        """Committed versions, ascending. Source of truth is the manifest
        listing — there is no mutable 'latest' pointer to corrupt."""
        out = []
        for name in os.listdir(os.path.join(self.root, _VERSIONS_DIR)):
            if name.endswith(".json"):
                try:
                    out.append(int(name[: -len(".json")]))
                except ValueError:
                    continue
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _load_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        """All committed manifests, ascending by version."""
        return [self._load_manifest(v) for v in self.versions()]

    def _commit(self, manifest: dict) -> int:
        """Atomically publish a manifest as ``parent + 1``.

        The payload is staged to a temp file then linked into place with
        ``O_EXCL`` semantics: ``os.link`` fails with EEXIST if another
        writer committed the same version first, so exactly one of two
        racing writers wins and the loser gets a clean
        :class:`CommitConflictError` (no torn manifest is ever visible
        under the committed name — the temp file carries a uuid).
        """
        version = (manifest["parent"] if manifest["parent"] is not None else 0) + 1
        manifest["version"] = version
        manifest["timestamp"] = time.time()
        # layout-creep counter (the compaction-cadence metric): a commit
        # whose layout is clean — one directory, no exclusions — resets
        # it; anything else (merge, append, restore to a dirty version)
        # inherits parent + 1. Recorded IN the manifest so health() is a
        # constant-time read, not a history walk.
        clean = len(manifest["entries"]) == 1 and not manifest["entries"][0]["exclude"]
        parent_creep = 0
        if manifest["parent"] is not None:
            parent_creep = self._load_manifest(manifest["parent"]).get(
                "merges_since_compact", 0
            )
        manifest["merges_since_compact"] = 0 if clean else parent_creep + 1
        final = self._manifest_path(version)
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, final)  # atomic create-exclusive publish
        except FileExistsError:
            raise CommitConflictError(
                f"version {version} of {self.root} was committed concurrently; "
                "re-read the latest snapshot and retry"
            ) from None
        finally:
            os.unlink(tmp)
        return version

    # ------------------------------------------------------------- data dirs

    def _new_data_dir(self, df: DataFrame, partition_by: list[str]) -> str:
        name = f"d-{uuid.uuid4().hex}"
        writer = df.write.mode("errorifexists").format("parquet")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(os.path.join(self.root, name))
        return name

    @staticmethod
    def _schema_fingerprint(df: DataFrame) -> list[list[str]]:
        # partition columns land last in the on-disk schema; normalize by
        # name so append/merge schema checks are order-insensitive
        return sorted(
            [f.name, f.dataType.simpleString()] for f in df.schema.fields
        )

    def _check_schema(
        self, df: DataFrame, manifest: dict, allow_new_columns: bool = False
    ) -> list[list[str]]:
        """Validate ``df`` against the manifest schema; returns the
        (possibly widened) schema the new commit should record.

        Default: exact match (order-insensitive). With
        ``allow_new_columns`` (additive schema evolution — the only
        evolution plain parquet supports safely): incoming may carry
        NEW columns (recorded in the new manifest; older directories
        surface them as NULL on read), existing columns must keep
        their types, and dropping columns is still a mismatch."""
        got = self._schema_fingerprint(df)
        if got == manifest["schema"]:
            return got
        if allow_new_columns:
            table = dict(map(tuple, manifest["schema"]))
            incoming = dict(map(tuple, got))
            conflicts = {
                n for n, t in incoming.items()
                if n in table and table[n] != t
            }
            missing = set(table) - set(incoming)
            if not conflicts and not missing:
                return sorted([n, t] for n, t in {**table, **incoming}.items())
            detail = (
                f"type conflicts on {sorted(conflicts)}" if conflicts
                else f"incoming drops columns {sorted(missing)}"
            )
            raise ValueError(
                f"schema evolution rejected vs version "
                f"{manifest['version']}: {detail} (only ADDING columns "
                "is supported)"
            )
        raise ValueError(
            f"schema mismatch vs version {manifest['version']}: "
            f"table has {manifest['schema']}, incoming {got}. "
            "Pass allow_new_columns=True for additive evolution, or "
            "overwrite to change the schema."
        )

    def _align(self, df: DataFrame, schema: list[list[str]]) -> DataFrame:
        """Project ``df`` onto the manifest schema: missing columns
        (written before an additive evolution) become typed NULLs;
        column order normalizes to the manifest's."""
        have = set(df.columns)
        return df.select(
            *[
                F.col(n) if n in have else F.lit(None).cast(t).alias(n)
                for n, t in schema
            ]
        )

    # ----------------------------------------------------------------- write

    def write(
        self,
        df: DataFrame,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
        allow_new_columns: bool = False,
    ) -> int:
        """Commit ``df`` as a new version. ``mode="overwrite"`` replaces
        the logical content (old files stay for time travel);
        ``mode="append"`` adds a data directory and REUSES every parent
        file — an atomic append, unlike ``saveAsTable(mode=append)``
        which is visible file-by-file. ``allow_new_columns`` permits
        additive schema evolution on append: the new manifest records
        the widened schema, and rows in older directories surface the
        new columns as NULL on read. Returns the committed version."""
        parent = self.latest_version()
        if mode == "overwrite":
            part = list(partition_by or [])
            schema = self._schema_fingerprint(df)
        elif mode == "append":
            if parent is None:
                raise ValueError("append to a table with no versions; write overwrite first")
            pm = self._load_manifest(parent)
            if partition_by is not None and list(partition_by) != pm["partition_by"]:
                raise ValueError(
                    f"append partition_by {partition_by} != table's {pm['partition_by']}"
                )
            part = pm["partition_by"]
            schema = self._check_schema(df, pm, allow_new_columns)
        else:
            raise ValueError(f"unknown mode: {mode!r} (overwrite|append)")
        data_dir = self._new_data_dir(df, part)
        entries = [{"dir": data_dir, "exclude": []}]
        if mode == "append":
            entries = self._load_manifest(parent)["entries"] + entries
        return self._commit(
            {
                "parent": parent,
                "operation": mode,
                "partition_by": part,
                "schema": schema,
                "entries": entries,
            }
        )

    # ------------------------------------------------------------------ read

    def _exclusion_filter(self, df: DataFrame, exclude: list[dict]):
        """NOT(any excluded partition tuple) as equality predicates on
        partition columns — pure partition pruning, no data scan for the
        excluded values."""
        clauses = []
        for tup in exclude:
            eqs = [_eq_or_null(c, v, df.schema[c].dataType) for c, v in tup.items()]
            clauses.append(reduce(lambda a, b: a & b, eqs))
        if not clauses:
            return df
        return df.filter(~reduce(lambda a, b: a | b, clauses))

    def version_as_of(self, timestamp: float) -> int:
        """The latest version committed at or before ``timestamp``
        (unix seconds) — Delta's ``TIMESTAMP AS OF`` lookup. Raises if
        the table has no commit that old (earlier manifests may also
        have been vacuumed away — the retention contract)."""
        best = None
        for v in self.versions():
            if self._load_manifest(v)["timestamp"] <= timestamp:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no version of {self.root} committed at or before "
                f"{timestamp} (older versions may have been vacuumed)"
            )
        return best

    def read(
        self, version: int | None = None, as_of: float | None = None
    ) -> DataFrame:
        """The committed snapshot at ``version`` (default: latest), or —
        with ``as_of`` (unix seconds) — at the newest version committed
        by that wall-clock time. The returned DataFrame stays consistent
        under concurrent commits — it references immutable
        directories."""
        if version is not None and as_of is not None:
            raise ValueError("pass version OR as_of, not both")
        if as_of is not None:
            version = self.version_as_of(as_of)
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed versions under {self.root}")
        m = self._load_manifest(v)
        # Read with the MANIFEST schema, not inference: a commit whose
        # result was empty (delete-all, merge of an empty partition set)
        # produces a data directory with no parquet footers, which
        # inference cannot read; the manifest is the source of truth for
        # the snapshot schema anyway (simpleString is DDL round-trippable),
        # and by-name parquet resolution also surfaces pre-evolution
        # directories' missing columns as typed NULLs.
        ddl = ", ".join(f"`{n}` {t}" for n, t in m["schema"])
        parts = []
        for entry in m["entries"]:
            d = self.spark.read.schema(ddl).parquet(
                os.path.join(self.root, entry["dir"])
            )
            parts.append(
                self._align(self._exclusion_filter(d, entry["exclude"]), m["schema"])
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ----------------------------------------------------------------- merge

    def merge(
        self, source: DataFrame, keys: list[str],
        allow_new_columns: bool = False,
        retries: int = 0,
    ) -> int:
        """Copy-on-write upsert: source rows replace current rows with the
        same key tuple; unmatched source rows insert.

        ``retries`` > 0 resolves optimistic-concurrency losses
        automatically: on :class:`CommitConflictError` the merge is
        RE-DERIVED against the winner's snapshot (re-read, re-merge,
        re-write — never a blind re-commit of stale data) up to that
        many times. The losing attempt's data directory becomes an
        orphan, reclaimed by :meth:`vacuum`.

        If the table is partitioned and the source carries the partition
        columns, only the partitions present in the source are rewritten
        — the manifest carries every untouched parent directory forward
        with the touched partition values excluded. The touched-partition
        list is a driver-side collect, bounded by
        ``min(distinct partitions in the BATCH, max_touched_partitions
        + 1)`` via a pushed-down LIMIT — never by table size. A batch
        touching more than ``max_touched_partitions`` (default 4096)
        falls back to a full-snapshot rewrite: past that width the
        OR-of-ANDs exclusion predicate is slower than rewriting, and the
        collect would stress the driver. Unpartitioned tables always
        take the full rewrite (the honest cost — partition your 100 TB
        tables).

        Contract of the partition-scoped path (same as a Delta MERGE
        whose condition pins the partition): a key's partition value must
        be immutable — a source row that moves key K from partition A to
        partition B only rewrites B, so K's old row in A would survive as
        a duplicate. If keys can migrate across partitions, leave the
        table unpartitioned or route those keys through delete+merge.

        With ``auto_compact_merges=N`` on the table, a merge that brings
        ``merges_since_compact`` to N triggers :meth:`compact` as a
        follow-on commit (readers never block — it is just another
        snapshot); the returned version is then the compaction's, whose
        content equals the merge's."""
        attempt = 0
        while True:
            try:
                v = self._merge_once(source, keys, allow_new_columns)
                break
            except CommitConflictError:
                if attempt >= retries:
                    raise
                attempt += 1
        if (
            self.auto_compact_merges is not None
            and self._load_manifest(v).get("merges_since_compact", 0)
            >= self.auto_compact_merges
        ):
            v = self.compact()
        return v

    def _merge_once(
        self, source: DataFrame, keys: list[str], allow_new_columns: bool
    ) -> int:
        parent = self.latest_version()
        if parent is None:
            raise ValueError("merge into a table with no versions; write first")
        pm = self._load_manifest(parent)
        schema = self._check_schema(source, pm, allow_new_columns)
        part = pm["partition_by"]
        current = self._align(self.read(parent), schema)
        source = self._align(source, schema)
        if part:
            # bound the driver round-trip: collect at most cap+1 rows to
            # DETECT overflow without ever materializing a huge list
            cap = self.max_touched_partitions
            touched_rows = (
                source.select(*part).distinct().limit(cap + 1).collect()
            )
            if len(touched_rows) > cap:
                # wide batch: partition scoping would build a >cap-term
                # exclusion predicate; a full-snapshot rewrite is cheaper
                # and driver-safe (mirrors the ER relabel-log guard)
                merged = current.join(source, keys, "left_anti").unionByName(
                    source
                )
                data_dir = self._new_data_dir(merged, part)
                return self._commit(
                    {
                        "parent": parent,
                        "operation": "merge-full",
                        "partition_by": part,
                        "schema": schema,
                        "entries": [{"dir": data_dir, "exclude": []}],
                        # over-cap sentinel: health() surfaces this so
                        # operators see the batch width that forced a
                        # full rewrite
                        "touched_partitions": cap + 1,
                    }
                )
            touched = [
                {c: _json_safe(row[c]) for c in part} for row in touched_rows
            ]
            cond = reduce(
                lambda a, b: a | b,
                [
                    reduce(
                        lambda a, b: a & b,
                        [_eq_or_null(c, v, source.schema[c].dataType)
                         for c, v in tup.items()],
                    )
                    for tup in touched
                ],
            )
            affected = current.filter(cond)
            merged = affected.join(source, keys, "left_anti").unionByName(source)
            data_dir = self._new_data_dir(merged, part)
            entries = [
                {"dir": e["dir"], "exclude": e["exclude"] + touched}
                for e in pm["entries"]
            ] + [{"dir": data_dir, "exclude": []}]
            op = "merge"
            n_touched = len(touched)
        else:
            merged = current.join(source, keys, "left_anti").unionByName(source)
            data_dir = self._new_data_dir(merged, part)
            entries = [{"dir": data_dir, "exclude": []}]
            op = "merge-full"
            n_touched = 0
        return self._commit(
            {
                "parent": parent,
                "operation": op,
                "partition_by": part,
                "schema": schema,
                "entries": entries,
                "touched_partitions": n_touched,
            }
        )

    def delete(self, condition) -> int:
        """COW delete: rewrite the table without rows matching
        ``condition`` (a Column or SQL string). Full rewrite — use
        partition-aligned predicates + merge for surgical changes."""
        parent = self.latest_version()
        if parent is None:
            raise ValueError("delete from a table with no versions")
        pm = self._load_manifest(parent)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        kept = self.read(parent).filter(~cond)
        data_dir = self._new_data_dir(kept, pm["partition_by"])
        return self._commit(
            {
                "parent": parent,
                "operation": "delete",
                "partition_by": pm["partition_by"],
                "schema": pm["schema"],
                "entries": [{"dir": data_dir, "exclude": []}],
            }
        )

    def restore(self, version: int) -> int:
        """Roll the table back (or forward) to an earlier version's
        content as a NEW commit (Delta RESTORE): metadata-only — the new
        manifest simply re-references the target version's directories,
        which also re-protects them from :meth:`vacuum`. History is
        preserved; a restore of a vacuumed version raises (its manifest
        is gone)."""
        target = self._load_manifest(version)
        return self._commit(
            {
                "parent": self.latest_version(),
                "operation": f"restore({version})",
                "partition_by": target["partition_by"],
                "schema": target["schema"],
                "entries": target["entries"],
            }
        )

    def changes(
        self,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Row-level change feed between two committed versions (the
        Delta CDF / Iceberg changelog read, derived rather than stored —
        this format keeps no per-commit change files, so the feed is
        computed as a keyed diff of the two snapshots it references).

        Requires ``keys`` (the table's logical key — same contract as
        :meth:`merge`). Returns one row per changed key with ``_change``
        ∈ {``insert``, ``update_preimage``, ``update_postimage``,
        ``delete``}: inserts/postimages carry the ``to`` snapshot's
        values, preimages/deletes the ``from`` snapshot's. Unchanged
        rows (key present in both with identical non-key values) are
        omitted.

        Scale: one full-outer join keyed on ``keys`` — both snapshots
        shuffle once on the key; the value comparison is an md5 over a
        length-prefixed encoding (NULL-safe, injective), computed
        scan-side. Derived CDF costs two snapshot reads; a pipeline
        that needs per-commit feeds cheaply should consume the MERGE
        batches themselves upstream.

        Columns are the FROM version's schema: across an additive
        schema evolution, columns added after ``from_version`` are not
        surfaced in the feed (diff the evolved range from the first
        post-evolution version to see them).
        """
        if not keys:
            raise ValueError("changes() requires the table's key columns")
        to_version = self.latest_version() if to_version is None else to_version
        old = self.read(from_version)
        new = self.read(to_version)
        cols = old.columns
        val_cols = [c for c in cols if c not in keys]

        def fp(df):
            enc = [
                F.when(F.col(c).isNull(), F.lit("N")).otherwise(
                    F.concat(
                        F.length(F.col(c).cast("string")).cast("string"),
                        F.lit(":"),
                        F.col(c).cast("string"),
                    )
                )
                for c in val_cols
            ]
            return F.md5(F.concat(*enc)) if enc else F.lit("")

        o = old.select(
            *[F.col(c).alias(f"_o_{c}") for c in cols],
            *[F.col(k).alias(k) for k in keys],
            fp(old).alias("_o_fp"),
        )
        n = new.select(
            *[F.col(c).alias(f"_n_{c}") for c in cols],
            *[F.col(k).alias(k) for k in keys],
            fp(new).alias("_n_fp"),
        )
        j = o.join(n, on=keys, how="full_outer")
        ins = j.filter(F.col("_o_fp").isNull() & F.col("_n_fp").isNotNull())
        del_ = j.filter(F.col("_n_fp").isNull() & F.col("_o_fp").isNotNull())
        upd = j.filter(
            F.col("_o_fp").isNotNull()
            & F.col("_n_fp").isNotNull()
            & (F.col("_o_fp") != F.col("_n_fp"))
        )

        def pick(side, df, change):
            return df.select(
                *[F.col(f"_{side}_{c}").alias(c) for c in cols],
                F.lit(change).alias("_change"),
            )

        return (
            pick("n", ins, "insert")
            .unionByName(pick("o", upd, "update_preimage"))
            .unionByName(pick("n", upd, "update_postimage"))
            .unionByName(pick("o", del_, "delete"))
        )

    def changes_feed(
        self,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
    ) -> DataFrame:
        """Per-commit change feed: :meth:`changes` of every adjacent
        version pair in ``(from_version, to_version]``, unioned with a
        ``_commit_version`` column — the consumable CDC stream form
        (each row says WHICH commit changed it), where :meth:`changes`
        alone nets out intermediate states. Cost is one keyed diff per
        commit in the range; bounded by the version count, which
        :meth:`vacuum` retention keeps finite."""
        to_version = self.latest_version() if to_version is None else to_version
        if to_version <= from_version:
            raise ValueError("to_version must be > from_version")
        out = None
        for v in range(from_version, to_version):
            step = self.changes(v, v + 1, keys=keys).withColumn(
                "_commit_version", F.lit(v + 1)
            )
            out = step if out is None else out.unionByName(step)
        return out

    # ----------------------------------------------------------- maintenance

    def drift(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Snapshot drift report between two committed versions — the
        schema/statistics twin of :meth:`changes` (which is row-level):
        one row per (column, metric) with the old value, new value and
        delta, answering "what changed about this table's SHAPE between
        v1 and v2" without a keyed diff.

        Metrics: ``row_count`` (column ``*``); per-column ``present``
        (0/1 — schema add/remove) and ``type_changed`` (1 when the
        declared type differs; values NULL); for columns present in
        both, ``null_rate``; for numeric columns, ``mean``/``min``/
        ``max``. All values rounded to 6 dp.

        Scale: schema metrics come from the two MANIFESTS (no scan);
        stats are ONE full-scan aggregate per snapshot (all columns in
        a single agg — map-side combined, metadata-sized result), then
        the report assembles driver-side into a column-count-bounded
        frame. No join, no shuffle beyond the two 1-row aggs."""
        to_version = self.latest_version() if to_version is None else to_version
        old_schema = dict(self._load_manifest(from_version)["schema"])
        new_schema = dict(self._load_manifest(to_version)["schema"])
        numeric = {
            "tinyint", "smallint", "int", "bigint", "float", "double",
        }

        def stats(version, schema):
            df = self.read(version)
            aggs = [F.count(F.lit(1)).alias("__n")]
            for c in sorted(schema):
                aggs.append(
                    F.avg(F.col(c).isNull().cast("double")).alias(f"__null_{c}")
                )
                if schema[c] in numeric or schema[c].startswith("decimal"):
                    aggs.append(F.avg(F.col(c).cast("double")).alias(f"__mean_{c}"))
                    aggs.append(F.min(F.col(c).cast("double")).alias(f"__min_{c}"))
                    aggs.append(F.max(F.col(c).cast("double")).alias(f"__max_{c}"))
            return df.agg(*aggs).first().asDict()

        s_old = stats(from_version, old_schema)
        s_new = stats(to_version, new_schema)

        def r6(x):
            return None if x is None else round(float(x), 6)

        rows = [("*", "row_count", float(s_old["__n"]), float(s_new["__n"]))]
        for c in sorted(set(old_schema) | set(new_schema)):
            in_old, in_new = c in old_schema, c in new_schema
            rows.append((c, "present", float(in_old), float(in_new)))
            if in_old and in_new and old_schema[c] != new_schema[c]:
                rows.append((c, "type_changed", None, None))
                continue
            if not (in_old and in_new):
                continue
            rows.append((c, "null_rate", r6(s_old[f"__null_{c}"]), r6(s_new[f"__null_{c}"])))
            if f"__mean_{c}" in s_old and f"__mean_{c}" in s_new:
                for m in ("mean", "min", "max"):
                    rows.append(
                        (c, m, r6(s_old[f"__{m}_{c}"]), r6(s_new[f"__{m}_{c}"]))
                    )
        out = self.spark.createDataFrame(
            rows, "column string, metric string, v_old double, v_new double"
        )
        return out.withColumn(
            "delta", F.round(F.col("v_new") - F.col("v_old"), 6)
        )

    def health(
        self,
        max_merges_since_compact: int = 8,
        max_entries: int = 16,
        max_exclusions: int = 64,
    ) -> dict:
        """Layout-health metrics for the latest snapshot, the
        versioned-table twin of ``ivf_append_index``'s drift report:
        merge-heavy tables accrete carried directories and exclusion
        predicates linearly per merge (~+70% per-merge cost by merge 8,
        SCALE.md), all reset by :meth:`compact`. Returns
        ``{version, n_entries, n_exclusions, merges_since_compact,
        compact_recommended}`` — ``compact_recommended`` trips when any
        metric exceeds its threshold. Constant-time: reads one manifest,
        never walks history or data."""
        v = self.latest_version()
        if v is None:
            raise FileNotFoundError(f"no committed versions under {self.root}")
        m = self._load_manifest(v)
        n_entries = len(m["entries"])
        n_exclusions = sum(len(e["exclude"]) for e in m["entries"])
        creep = m.get("merges_since_compact", 0)
        return {
            "version": v,
            "n_entries": n_entries,
            "n_exclusions": n_exclusions,
            "merges_since_compact": creep,
            # width of the most recent merge's partition scope; a value
            # of max_touched_partitions + 1 marks an over-cap batch that
            # forced a full-snapshot rewrite (see merge())
            "last_merge_touched_partitions": m.get("touched_partitions"),
            "compact_recommended": (
                creep >= max_merges_since_compact
                or n_entries > max_entries
                or n_exclusions > max_exclusions
            ),
        }

    def compact(
        self,
        zorder: list[str] | None = None,
        zorder_bits: int = 4,
        target_partitions: int | None = None,
    ) -> int:
        """Rewrite the latest snapshot into one fresh directory with empty
        exclusion lists. Run periodically on merge-heavy tables: exclusion
        lists and carried directories grow per merge; compaction resets
        both (and re-packs small files from append batches).

        ``zorder`` additionally clusters the rewrite on those columns
        (:func:`.layout.zorder_by`) — the ``OPTIMIZE ... ZORDER BY``
        maintenance form: the same commit that resets the manifest also
        lays files out for multi-dimensional footer-stat pruning.
        Readers are never blocked either way — compaction is just
        another snapshot commit."""
        parent = self.latest_version()
        if parent is None:
            raise ValueError("compact a table with no versions")
        pm = self._load_manifest(parent)
        snap = self.read(parent)
        if zorder:
            from .layout import zorder_by

            snap = zorder_by(
                snap, zorder, bits=zorder_bits,
                target_partitions=target_partitions,
            )
        data_dir = self._new_data_dir(snap, pm["partition_by"])
        return self._commit(
            {
                "parent": parent,
                "operation": "compact",
                "partition_by": pm["partition_by"],
                "schema": pm["schema"],
                "entries": [{"dir": data_dir, "exclude": []}],
            }
        )

    def vacuum(self, retain_last: int = 2) -> list[str]:
        """Delete data directories referenced ONLY by versions older than
        the last ``retain_last``, plus orphans from crashed writes, and
        drop the expired manifests. Time travel beyond the retained
        window stops working — that is the retention contract; readers of
        RETAINED versions are unaffected (their directories survive).
        Returns the deleted directory names."""
        if retain_last < 1:
            raise ValueError("retain_last must be >= 1")
        vs = self.versions()
        keep_versions = vs[-retain_last:]
        referenced = set()
        for v in keep_versions:
            for e in self._load_manifest(v)["entries"]:
                referenced.add(e["dir"])
        deleted = []
        for name in os.listdir(self.root):
            if name.startswith("d-") and name not in referenced:
                shutil.rmtree(os.path.join(self.root, name))
                deleted.append(name)
        for v in vs[:-retain_last]:
            os.unlink(self._manifest_path(v))
        return deleted
