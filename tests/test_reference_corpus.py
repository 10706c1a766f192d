"""Golden end-to-end run over the reference's REAL CRM/ERP CSV corpus
(/root/reference/datasets, read-only) — the reference pipeline's
de-facto acceptance test (SURVEY §5 item 3). The synthetic medallion
golden tests (test_medallion.py) mirror every anomaly class; this
module proves the engine handles the anomalies where they actually
occur, with row counts and spot values pinned from profiling the corpus
directly (duckdb, 2026-08-15):

- cust_info.csv: 18,494 raw rows, 4 NULL cst_id (wash out), 5 duplicate
  ids (no create-date ties) -> 18,484 dim_customers rows
- prd_info.csv: 397 versions over 295 keys -> 295 current dim rows;
  2 NULL costs; one category id (CO_PE) absent from PX_CAT_G1V2
- sales_details.csv: 60,398 rows; 19 zero/short order dates; 8 NULL +
  20 inconsistent sales; 12 NULL/non-positive prices
- CUST_AZ12.csv: 11,042 NAS-prefixed ids; 16 birthdates after 2026-01-01
- LOC_A101.csv: every cid hyphenated
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.plans.medallion import build_pipeline
from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.sources.reference_corpus import (
    REFERENCE_AS_OF,
    REFERENCE_DATA_DIR,
    load_reference_sources,
)

D = datetime.date


@pytest.fixture(scope="module")
def run(spark):
    sources = load_reference_sources(spark, REFERENCE_DATA_DIR)
    pipeline = build_pipeline(as_of=REFERENCE_AS_OF)
    return pipeline.run(spark, sources)


def test_all_nodes_ran_and_dq_passed(run):
    assert len(run) == 15
    assert all(res.passed for r in run.values() for res in r.dq)


def test_dim_customers_acceptance(spark, run):
    dim = spark.table("gold.dim_customers")
    n = dim.count()
    assert n == 18484  # 18,494 raw - 4 NULL ids - 6 older duplicate rows
    # W2: dense unique surrogate keys over the whole corpus
    agg = dim.agg(
        F.countDistinct("customer_key").alias("d"),
        F.min("customer_key").alias("lo"),
        F.max("customer_key").alias("hi"),
    ).first()
    assert (agg["d"], agg["lo"], agg["hi"]) == (18484, 1, 18484)
    # R1: customer_id unique post-dedup
    assert dim.select("customer_id").distinct().count() == 18484
    # R4: every NAS-prefixed / hyphenated ERP cid joined back — the only
    # rows without ERP attributes are ids genuinely absent from the ERP
    # extracts (none: both ERP files cover all 18,484 ids)
    assert dim.filter(F.col("country").isNull()).count() == 0
    # R11: CRM gender wins for 13,915 customers; the ERP source fills
    # another 4,554 — only the 15 rows where BOTH sources lack a value
    # stay 'n/a' (that is R11's whole value-add on this corpus)
    assert dim.filter(F.col("gender") == "n/a").count() == 15
    assert dim.filter(F.col("gender").isin("Male", "Female")).count() == 18469
    # R10: no birthdate survives past the pinned as-of
    assert dim.filter(F.col("birthdate") > F.lit(REFERENCE_AS_OF)).count() == 0
    # R2: no padded names survive
    assert dim.filter(
        (F.col("first_name") != F.trim("first_name"))
        | (F.col("last_name") != F.trim("last_name"))
    ).count() == 0
    # R3: codes fully labeled
    ms = {r[0] for r in dim.select("marital_status").distinct().collect()}
    assert ms <= {"Single", "Married", "n/a"}
    # spot row (first customer in the extract)
    row = dim.filter(F.col("customer_id") == 11000).first()
    assert row["customer_number"] == "AW00011000"
    assert row["first_name"] == "Jon" and row["last_name"] == "Yang"
    assert row["gender"] == "Male" and row["country"] == "Australia"
    assert row["birthdate"] == D(1971, 10, 6)


def test_dim_products_acceptance(spark, run):
    dim = spark.table("gold.dim_products")
    assert dim.count() == 295  # R12: current versions only (397 -> 295)
    agg = dim.agg(
        F.countDistinct("product_key").alias("d"),
        F.max("product_key").alias("hi"),
    ).first()
    assert (agg["d"], agg["hi"]) == (295, 295)
    # R5: the NULL costs landed as 0, none survive NULL
    assert dim.filter(F.col("cost").isNull()).count() == 0
    # J3: the one unmatched category id (CO_PE) null-extends, the rest join
    assert (
        dim.filter(F.col("category").isNull())
        .select("category_id")
        .distinct()
        .collect()[0][0]
        == "CO_PE"
    )
    # R3: padded line codes labeled
    lines = {r[0] for r in dim.select("product_line").distinct().collect()}
    assert lines <= {"Mountain", "Road", "Other Sales", "Touring", "n/a"}


def test_fact_sales_acceptance(spark, run):
    fact = spark.table("gold.fact_sales")
    assert fact.count() == 60398  # left joins never drop a sale
    # R8: zero inconsistent rows post-repair
    assert (
        fact.filter(
            F.col("sales_amount") != F.col("quantity") * F.col("price")
        ).count()
        == 0
    )
    # R9: every price positive post-backfill
    assert fact.filter(
        F.col("price").isNull() | (F.col("price") <= 0)
    ).count() == 0
    # R7: exactly the 19 zero/short integer dates landed NULL
    assert fact.filter(F.col("order_date").isNull()).count() == 19
    # J4/J5: every fact resolved both dimension keys (profiled: full FK
    # coverage in the corpus)
    assert fact.filter(
        F.col("product_key").isNull() | F.col("customer_key").isNull()
    ).count() == 0
    # spot row (first order in the extract)
    row = fact.filter(
        (F.col("order_number") == "SO43697") & (F.col("quantity") == 1)
    ).first()
    assert row["order_date"] == D(2010, 12, 29)
    assert row["sales_amount"] == 3578.0 and row["price"] == 3578.0
