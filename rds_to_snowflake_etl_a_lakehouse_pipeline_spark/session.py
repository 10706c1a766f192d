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
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime partition coalescing, skew-join splitting, dynamic
        # join-strategy switch — the scale story for unknown data shapes.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
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


def load(spark: SparkSession, sf_dir: str, name: str):
    """Read one testdata table (columnar parquet scan — pushdown-capable)."""
    return spark.read.parquet(table_path(sf_dir, name))
