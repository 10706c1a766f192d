"""SparkSession factory with scale-appropriate defaults.

The reference delegates session construction to AWS Glue
(``Glue-spark/scripts/bronze/crm_cust_info_bronze.py:9-14``); here we own
it. Defaults are tuned for correctness-vs-oracle (UTC timestamps, ANSI
off to match the reference's permissive Glue semantics) and for scale
(AQE on, shuffle partitions sized to cores locally — on a real cluster
set ``spark.sql.shuffle.partitions`` ≈ 2-3× total cores and rely on AQE
coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lakeflow",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Local mode uses ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``).
    All settings below also hold on a multi-executor cluster; only
    memory/parallelism sizing changes.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*").strip() or "*"
    if cpus != "*":
        try:
            cpus = str(max(int(cpus), 1))
        except ValueError:
            cpus = "*"
    local = master is None
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # Only derive from the local CPU count for local masters; on a real
        # cluster leave Spark's default (AQE coalesces down anyway).
        shuffle_partitions = 32 if (not local or cpus == "*") else int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode: driver == all executors, but Spark's default heap
        # is 1g — 32 concurrent tasks of Arrow batches OOM long before
        # the machine is full (measured: a 50k-doc minhash pass died at
        # the default). Only effective for the process's FIRST session
        # (the JVM is sized at launch); a cluster deployment sizes
        # executors via spark-submit instead.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        # AQE: runtime partition coalescing, skew-join splitting, dynamic
        # join-strategy switch — the scale story for unknown data shapes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # ANSI off: match the reference's permissive Glue/Spark-3 semantics
        # (e.g. to_date on an invalid 8-digit value yields NULL, not error).
        .config("spark.sql.ansi.enabled", "false")
        # Deterministic timestamps: parquet timestamps compare equal to the
        # DuckDB oracle only with a pinned UTC session zone.
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas-UDF path (similarity/multimodal extensions).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def table_path(sf_dir: str, name: str) -> str:
    """Path of a driver-generated parquet table under a scale-factor dir."""
    return os.path.join(sf_dir, f"{name}.parquet")


def ensure_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition ONLY when the scan is under-parallel.

    A parquet file with a single row group is one non-splittable task no
    matter what ``spark.sql.files.maxPartitionBytes`` says — locally that
    serializes a whole pipeline onto one core. A warehouse-scale table
    has thousands of row groups, so this is a no-op there (no gratuitous
    full-data shuffle); the guard only fires for small/badly-written
    inputs.
    """
    target = min_partitions or min(
        df.sparkSession.sparkContext.defaultParallelism, 16
    )
    if df.rdd.getNumPartitions() < min(target, 8):
        return df.repartition(target)
    return df


def load(spark: SparkSession, sf_dir: str, name: str, parallel: bool = False):
    """Read one testdata table (columnar parquet scan — pushdown-capable).

    ``parallel=True`` applies :func:`ensure_parallelism` after the scan.
    Opt in ONLY where downstream work per row is heavy (wide silver
    expression chains, Arrow UDF stages): the round-robin exchange costs
    one pass over the data, so for scan→partial-agg shapes whose
    map-side combine already collapses the data it is a net loss. Off by
    default so simple scans keep exchange-free plans (filters still push
    down to the scan either way).

    The ``events`` table's ``ts`` physical layout varies across testdata
    generations — parquet TIMESTAMP(NANOS) (unreadable natively: read
    nanos as long via runtime conf, truncate with integer ``div`` — a
    double division would lose precision on ~1.7e18 nano values), or
    TIMESTAMP(MICROS) with ``isAdjustedToUTC`` false (arrives as
    TIMESTAMP_NTZ) or true (plain TIMESTAMP). All three normalize to the
    same session-zone TIMESTAMP here, so every downstream operator sees
    one dtype regardless of how the files were written (the NTZ→LTZ cast
    is exact under the pinned UTC session zone).

    Also pins the runtime confs the engine's semantics depend on, so the
    queries behave identically under a caller-provided session (the
    driver passes its own): ANSI off (permissive to_date, reference
    semantics) and UTC session zone (oracle-deterministic timestamps).
    """
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        from pyspark.sql import functions as F

        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return ensure_parallelism(df) if parallel else df
    df = spark.read.parquet(table_path(sf_dir, name))
    return ensure_parallelism(df) if parallel else df
