"""Unit tests per cleansing/repair rule branch (SURVEY.md §2.10)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark import functions as lf


def test_trim_columns_r2(spark):
    df = spark.createDataFrame([("  jon  ", " doe ")], ["first", "last"])
    row = lf.trim_columns(df, ["first", "last"]).first()
    assert (row["first"], row["last"]) == ("jon", "doe")


def test_map_codes_r3_branches(spark):
    df = spark.createDataFrame(
        [("s",), (" M ",), ("x",), ("",), (None,)], ["code"]
    )
    out = df.select(
        lf.map_codes("code", {"S": "Single", "M": "Married"}).alias("label")
    ).collect()
    assert [r["label"] for r in out] == ["Single", "Married", "n/a", "n/a", "n/a"]


def test_strip_prefix_r4a(spark):
    df = spark.createDataFrame([("NASAW00011000",), ("AW00011000",), (None,)], ["cid"])
    out = df.select(lf.strip_prefix("cid", "NAS").alias("cid")).collect()
    assert [r["cid"] for r in out] == ["AW00011000", "AW00011000", None]


def test_strip_chars_r4b(spark):
    df = spark.createDataFrame([("AW-00011000",), ("A-B-C",)], ["cid"])
    out = df.select(lf.strip_chars("cid", "-").alias("cid")).collect()
    assert [r["cid"] for r in out] == ["AW00011000", "ABC"]


def test_product_key_split_r4cd(spark):
    df = spark.createDataFrame([("CO-RF-FR-R92B-58",)], ["prd_key"])
    row = df.select(
        lf.category_id_from_key("prd_key").alias("cat"),
        lf.product_number_from_key("prd_key").alias("num"),
    ).first()
    assert row["cat"] == "CO_RF"
    assert row["num"] == "FR-R92B-58"


def test_coalesce_zero_r5(spark):
    df = spark.createDataFrame([(None,), (7,)], "cost int")
    out = df.select(lf.coalesce_zero("cost").alias("cost")).collect()
    assert [r["cost"] for r in out] == [0, 7]


def test_int_yyyymmdd_to_date_r7(spark):
    df = spark.createDataFrame(
        [(20240115,), (0,), (123,), (20231301,), (None,)], "d int"
    )
    out = df.select(lf.int_yyyymmdd_to_date("d").alias("d")).collect()
    assert [r["d"] for r in out] == [
        datetime.date(2024, 1, 15),
        None,
        None,
        None,  # invalid month under ANSI-off to_date
        None,
    ]


def test_recompute_amount_r8_branches(spark):
    # (sales, qty, price) -> expect
    rows = [
        (None, 2.0, 5.0),   # NULL -> 10
        (-3.0, 2.0, 5.0),   # <=0 -> 10
        (9.0, 2.0, 5.0),    # mismatch -> 10
        (10.0, 2.0, 5.0),   # consistent -> kept
        (10.0, 2.0, -5.0),  # negative price: qty*abs(price) matches -> kept
    ]
    df = spark.createDataFrame(rows, "sales double, qty double, price double")
    out = df.select(lf.recompute_amount("sales", "qty", "price").alias("s")).collect()
    assert [r["s"] for r in out] == [10.0, 10.0, 10.0, 10.0, 10.0]


def test_recompute_amount_idempotent(spark):
    df = spark.createDataFrame(
        [(None, 3.0, 4.0), (7.0, 3.0, 4.0)], "sales double, qty double, price double"
    )
    once = df.select(
        lf.recompute_amount("sales", "qty", "price").alias("sales"), "qty", "price"
    )
    twice = once.select(
        lf.recompute_amount("sales", "qty", "price").alias("sales"), "qty", "price"
    )
    assert once.collect() == twice.collect()


def test_backfill_unit_price_r9_branches(spark):
    rows = [
        (12.0, 3.0, None),  # NULL price -> 4
        (12.0, 3.0, -1.0),  # <=0 -> 4
        (12.0, 0.0, None),  # qty 0 -> divide by 1 -> 12
        (12.0, 3.0, 4.0),   # kept
    ]
    df = spark.createDataFrame(rows, "sales double, qty double, price double")
    out = df.select(lf.backfill_unit_price("sales", "qty", "price").alias("p")).collect()
    assert [r["p"] for r in out] == [4.0, 4.0, 12.0, 4.0]


def test_null_if_future_r10(spark):
    df = spark.createDataFrame(
        [(datetime.date(2050, 1, 1),), (datetime.date(1990, 5, 5),)], "bdate date"
    )
    out = df.select(lf.null_if_future("bdate", "2026-01-01").alias("b")).collect()
    assert [r["b"] for r in out] == [None, datetime.date(1990, 5, 5)]


def test_prefer_source_r11(spark):
    rows = [("F", "Male"), ("n/a", "Male"), (None, "Male"), ("n/a", None)]
    df = spark.createDataFrame(rows, "crm string, erp string")
    out = df.select(lf.prefer_source("crm", "erp").alias("g")).collect()
    assert [r["g"] for r in out] == ["F", "Male", "Male", "n/a"]


def test_approx_percentile_within_bound(spark):
    """Error-bound for the a1_approx_percentile query (the 100 TB twin
    of the exact a1_percentile): approx_percentile(col, p, acc) returns
    an actual element whose RANK is within n/acc of the target rank
    p*n — the Greenwald-Khanna guarantee. With acc=10_000 this is a
    deterministic bound, not a statistical one."""
    import bisect

    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load

    acc = 10_000
    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    est = {
        r["l_returnflag"]: (r["median_qty"], r["p90_qty"], r["p25_price"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.expr(f"approx_percentile(l_quantity, 0.5, {acc})").alias("median_qty"),
            F.expr(f"approx_percentile(l_quantity, 0.9, {acc})").alias("p90_qty"),
            F.expr(f"approx_percentile(l_extendedprice, 0.25, {acc})").alias(
                "p25_price"
            ),
        )
        .collect()
    }
    rows = li.select("l_returnflag", "l_quantity", "l_extendedprice").collect()
    by_flag: dict[str, tuple[list, list]] = {}
    for r in rows:
        qty, price = by_flag.setdefault(r["l_returnflag"], ([], []))
        qty.append(r["l_quantity"])
        price.append(r["l_extendedprice"])
    assert est.keys() == by_flag.keys()
    for flag, (qty, price) in by_flag.items():
        qty.sort()
        price.sort()
        for value, p, vals in (
            (est[flag][0], 0.5, qty),
            (est[flag][1], 0.9, qty),
            (est[flag][2], 0.25, price),
        ):
            n = len(vals)
            tol = n / acc + 1  # rank slack: GK bound + tie/rounding slop
            lo = bisect.bisect_left(vals, value)
            hi = bisect.bisect_right(vals, value)
            assert lo < hi, (flag, p, value)  # an actual element
            target = p * n
            assert lo - tol <= target <= hi + tol, (flag, p, value, lo, hi, n)
