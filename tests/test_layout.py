"""Z-order layout: multi-dimensional clustering for footer-stat pruning."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.layout import (
    pruning_stats,
    zorder_by,
    zorder_value,
    zorder_write,
)

SF = "/root/testdata/sf0.001"


def test_zorder_roundtrip_preserves_content(spark):
    o = load(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    out = zorder_by(o, ["o_custkey", "o_orderdate"], bits=3)
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in o.collect()
    )


def test_zorder_improves_pruning_on_both_dims(spark):
    """Z-ordered files must need fewer row-group reads per equality
    probe than the shuffled baseline layout, on BOTH clustered columns."""
    o = (
        load(spark, SF, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .withColumn(
            "o_odate_int", F.col("o_orderdate").cast("timestamp").cast("long")
        )
        .drop("o_orderdate")
    )
    n_files = 16
    zpath = tempfile.mkdtemp(prefix="zord-") + "/t"
    bpath = tempfile.mkdtemp(prefix="base-") + "/t"
    zorder_write(o, zpath, ["o_custkey", "o_odate_int"], bits=4,
                 target_partitions=n_files)
    # baseline: same file count, hash-shuffled (the layout a plain
    # repartition write produces)
    o.repartition(n_files).write.mode("overwrite").parquet(bpath)
    for col in ("o_custkey", "o_odate_int"):
        z = pruning_stats(zpath, col)
        b = pruning_stats(bpath, col)
        assert z["n_row_groups"] >= n_files
        # every probe hits ~all shuffled row groups; z-order must cut
        # the expected scan fraction at least in half on each dimension
        assert z["avg_overlap_fraction"] < 0.5 * b["avg_overlap_fraction"], (
            col, z, b,
        )


def test_zorder_value_stays_in_jvm_and_bounds(spark):
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    z = o.select(
        zorder_value(o, ["o_custkey", "o_totalprice"], bits=4).alias("z")
    )
    stats = z.agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()[0]
    assert 0 <= stats["lo"] <= stats["hi"] < (1 << 8)  # 2 cols x 4 bits
    # no Python stage in the plan
    plan = z._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_zorder_string_column_buckets_point_lookups(spark):
    c = load(spark, SF, "customer").select("c_custkey", "c_mktsegment")
    path = tempfile.mkdtemp(prefix="zstr-") + "/t"
    zorder_write(c, path, ["c_mktsegment"], bits=3, target_partitions=4)
    got = spark.read.parquet(path)
    assert sorted(r["c_custkey"] for r in got.collect()) == sorted(
        r["c_custkey"] for r in c.collect()
    )
    # 5 market segments hash into few buckets: each segment's rows land
    # in a narrow band of files
    seg_files = (
        got.withColumn("_f", F.input_file_name())
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("_f").alias("nf"))
        .collect()
    )
    assert max(r["nf"] for r in seg_files) <= 2


def test_zorder_scan_skips_row_groups_end_to_end(spark):
    """Not just footer math: Spark's vectorized parquet reader must
    EMIT fewer rows from the z-ordered layout under a selective pushed
    predicate (row-group pruning happens before rows reach the scan
    output), while both layouts return identical query results."""
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    zpath = tempfile.mkdtemp(prefix="zscan-") + "/t"
    bpath = tempfile.mkdtemp(prefix="bscan-") + "/t"
    zorder_write(o, zpath, ["o_custkey"], bits=4, target_partitions=16)
    o.repartition(16).write.mode("overwrite").parquet(bpath)

    probe = o.agg(F.min("o_custkey")).collect()[0][0]

    def scan_rows(path):
        df = spark.read.parquet(path).filter(F.col("o_custkey") == probe)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()
        # walk to the leaf scan node and read its output-rows metric
        node = plan
        while node.children().nonEmpty():
            node = node.children().head()
        return node.metrics().apply("numOutputRows").value()

    z_rows, b_rows = scan_rows(zpath), scan_rows(bpath)
    # identical answers...
    zr = spark.read.parquet(zpath).filter(F.col("o_custkey") == probe).count()
    br = spark.read.parquet(bpath).filter(F.col("o_custkey") == probe).count()
    assert zr == br > 0
    # ...but the z-ordered scan surfaced far fewer rows to the filter
    assert z_rows < 0.5 * b_rows, (z_rows, b_rows)


def test_bloom_filter_write_skips_absent_probes(spark):
    """Bloom-filtered parquet: an equality probe for an ABSENT key in
    range (where min/max can never help on an unsorted layout) must
    emit (near-)zero rows from the scan, vs the full corpus without
    blooms."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.layout import (
        bloom_filtered_write,
    )

    # high-cardinality pseudo-random keys; probe an odd value (absent)
    df = spark.range(0, 20000, numPartitions=8).select(
        (F.xxhash64("id") * 2).alias("k"), F.col("id").alias("v")
    )
    bpath = tempfile.mkdtemp(prefix="bloom-") + "/t"
    npath = tempfile.mkdtemp(prefix="nobloom-") + "/t"
    bloom_filtered_write(df, bpath, ["k"])
    df.write.mode("overwrite").parquet(npath)

    def scan_rows(path, probe):
        d = spark.read.parquet(path).filter(F.col("k") == probe)
        d.collect()
        node = d._jdf.queryExecution().executedPlan()
        while node.children().nonEmpty():
            node = node.children().head()
        return node.metrics().apply("numOutputRows").value()

    probe = 12345  # odd -> cannot be any k (all k are even)
    assert scan_rows(bpath, probe) == 0
    assert scan_rows(npath, probe) > 0  # no bloom: groups can't be skipped
