"""Multi-dimensional data layout (Z-order clustering) for scan pruning.

The reference writes every table unpartitioned and unsorted
(bronze/crm_cust_info_bronze.py:41 ``partitionKeys=[]``), so every
query scans every file. Partitioning (io.py ``partition_by``) fixes
one-dimensional pruning; this module adds the multi-dimensional case:
cluster a table on SEVERAL columns at once so parquet min/max file and
row-group statistics prune scans on ANY of them — the technique Delta
``OPTIMIZE ZORDER BY`` and Iceberg sort orders use.

How: each clustering column is quantile-bucketed into ``2**bits`` rank
buckets (numeric/date columns via one bounded ``approxQuantile`` driver
call — a Greenwald-Khanna sketch pass, never a sort; string columns via
a stable hash, which clusters point lookups but not ranges), the bucket
indices' bits are interleaved into a Morton (Z) value with pure
bitwise Catalyst expressions, and the frame is range-partitioned and
sorted by that value. Files then cover small hyper-rectangles of the
key space instead of random stripes: a predicate on any clustered
column eliminates most files by footer stats alone, before any IO.

At 100 TB this is a one-shuffle rewrite (the ``repartitionByRange``)
whose cost is repaid on every subsequent scan; re-run it periodically
on append-heavy tables the way you would Delta OPTIMIZE. Z-order is
the right default for 2-4 columns; beyond that the curve's locality
dilutes (Hilbert curves buy ~10-20% better locality at significantly
hairier encoding — not worth it here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, NumericType, TimestampType


def _bucket_expr(df: DataFrame, col: str, bits: int, relative_error: float) -> Column:
    """Quantile-rank bucket index in [0, 2**bits) for one column.

    Numeric/temporal: interior quantile edges from ONE bounded
    approxQuantile pass (driver gets 2**bits - 1 doubles, nothing
    else), then the bucket is a sum of ``> edge`` comparisons — pure
    whole-stage-codegen arithmetic on the scan. Strings: stable
    xxhash64 bucket (equal values cluster; ranges don't — documented).
    NULLs go to bucket 0 (they cluster together, and ``IS NULL``
    predicates prune on the null-count footer stat anyway)."""
    n_buckets = 1 << bits
    dtype = df.schema[col].dataType
    if isinstance(dtype, (DateType, TimestampType)):
        num = F.col(col).cast("timestamp").cast("long")
        probe = df.select(num.cast("double").alias("_q"))
    elif isinstance(dtype, NumericType):
        num = F.col(col)
        probe = df.select(num.cast("double").alias("_q"))
    else:
        return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges = probe.na.drop().stat.approxQuantile("_q", qs, relative_error)
    # collapse duplicate edges (skewed columns) — comparisons against a
    # repeated edge add 0 or full steps consistently either way
    b = F.lit(0)
    for e in sorted(set(edges)):
        b = b + F.when(num.cast("double") > F.lit(e), 1).otherwise(0)
    return F.coalesce(b, F.lit(0)).cast("int")


def zorder_value(df: DataFrame, by: list[str], bits: int = 4,
                 relative_error: float = 0.01) -> Column:
    """The Morton (Z) value: per-column quantile buckets, bits
    interleaved LSB-first across columns. All bitwise Catalyst ops —
    the Z value never leaves the JVM."""
    if not by:
        raise ValueError("zorder_value needs at least one column")
    if bits * len(by) > 62:
        raise ValueError(f"bits*len(by) = {bits * len(by)} exceeds a bigint")
    buckets = [_bucket_expr(df, c, bits, relative_error) for c in by]
    k = len(buckets)
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, bc in enumerate(buckets):
            bit = F.shiftright(bc.cast("bigint"), i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * k + j)
    return z


def zorder_by(
    df: DataFrame,
    by: list[str],
    bits: int = 4,
    target_partitions: int | None = None,
    relative_error: float = 0.01,
) -> DataFrame:
    """Return ``df`` clustered for writing: range-partitioned and sorted
    by the Z value of ``by`` (one shuffle), Z helper column dropped.
    ``target_partitions`` sets the output file count (size it so files
    land near your target file size — e.g. total_bytes / 512MB);
    default keeps the session shuffle parallelism."""
    z = zorder_value(df, by, bits, relative_error)
    tagged = df.withColumn("_z", z)
    parted = (
        tagged.repartitionByRange(target_partitions, "_z")
        if target_partitions
        else tagged.repartitionByRange("_z")
    )
    return parted.sortWithinPartitions("_z").drop("_z")


def zorder_write(
    df: DataFrame,
    path: str,
    by: list[str],
    bits: int = 4,
    target_partitions: int | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write ``df`` to parquet at ``path`` Z-ordered on ``by``."""
    (
        zorder_by(df, by, bits, target_partitions)
        .write.mode(mode)
        .option("compression", compression)
        .parquet(path)
    )


def bloom_filtered_write(
    df: DataFrame,
    path: str,
    bloom_cols: list[str],
    fpp: float = 0.01,
    expected_items: int | None = None,
    mode: str = "overwrite",
    compression: str = "snappy",
) -> None:
    """Write parquet with per-column BLOOM FILTERS — the point-lookup
    complement to :func:`zorder_write`: min/max footer stats prune
    range-correlated layouts, but an equality probe on a HIGH-CARDINALITY
    column in an unsorted table (a uuid, a user id) finds every row
    group's [min,max] straddling the probe. A bloom filter answers
    "definitely absent" per row group regardless of ordering, so Spark's
    reader (``spark.sql.parquet.filterPushdown``, on by default) skips
    the group entirely for misses and for hits prunes to the few groups
    that might contain the key.

    Cost: ~1.2 bytes/item at fpp=0.01 per column — pay it on the join/
    lookup keys only, not every column. ``expected_items`` defaults to
    a rows-per-group estimate from the DataFrame size; set it when you
    know the per-file distinct count."""
    if expected_items is None:
        # bounded: one count; NDV per row group won't exceed its rows
        expected_items = max(1024, df.count() // max(1, df.rdd.getNumPartitions()))
    writer = df.write.mode(mode).option("compression", compression)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true").option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(expected_items)
        )
    writer = writer.option("parquet.bloom.filter.fpp", str(fpp))
    writer.parquet(path)


def pruning_stats(path: str, col: str) -> dict:
    """Footer-stats pruning effectiveness for equality probes on
    ``col``: for each row group, the [min, max] interval from parquet
    metadata; ``avg_overlap_fraction`` = the expected fraction of row
    groups a uniformly-drawn existing value must scan (files whose
    interval contains it). 1.0 = no pruning (every value hits every
    row group), 1/n_row_groups = perfect clustering. Driver-side
    metadata read only — no data IO."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    ]
    intervals = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                intervals.append((st.min, st.max))
    if not intervals:
        return {"n_row_groups": 0, "avg_overlap_fraction": 1.0}
    # probe at interval midpoints where the type supports it (interval
    # ENDPOINTS sit on file boundaries and bias the estimate up);
    # non-numeric types probe at the endpoints
    try:
        probes = sorted({lo + (hi - lo) / 2 for lo, hi in intervals})
    except TypeError:
        probes = sorted({lo for lo, _ in intervals} | {hi for _, hi in intervals})
    n = len(intervals)
    overlaps = [
        sum(1 for lo, hi in intervals if lo <= p <= hi) / n for p in probes
    ]
    return {
        "n_row_groups": n,
        "avg_overlap_fraction": sum(overlaps) / len(overlaps),
    }
