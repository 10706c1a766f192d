"""Loader for the reference's own CRM/ERP CSV corpus — the six source
extracts the reference pipeline ingests (datasets/crm/{cust_info,
prd_info,sales_details}.csv, datasets/erp/{CUST_AZ12,LOC_A101,
PX_CAT_G1V2}.csv; loaded by AWS-RDS/CRM-MySQL/crm_data_load.sql and
ERP-Postgres/erp_data_load.sql). Running the full medallion DAG over
THESE files is the reference's de-facto acceptance test (SURVEY §5):
every anomaly class the silver rules repair occurs in this corpus for
real (duplicate ``cst_id``, ``NAS``-prefixed / hyphenated ERP customer
ids, 0/short integer dates, ``sales != quantity*price`` rows, NULL
prices, future birthdates, padded code columns).

Schemas are DECLARED (SURVEY §1) — never inferred; inference is a full
extra pass over the data and can mis-type anomaly columns (a short
integer date column inferred as DATE would throw instead of landing
NULL). Column names are the engine's lowercase convention; the ERP
files' uppercase headers are skipped positionally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import read_csv

REFERENCE_DATA_DIR = "/root/reference/datasets"

# SURVEY §1 source schemas (AWS-RDS/CRM-MySQL/crmdb_tables.sql:7-51,
# ERP-Postgres/erpdb_tables.sql:4-26), lowercased.
REFERENCE_SCHEMAS = {
    "crm_cust_info": (
        "cst_id int, cst_key string, cst_firstname string, "
        "cst_lastname string, cst_marital_status string, cst_gndr string, "
        "cst_create_date date"
    ),
    # the raw file carries a prd_end_dt column; silver recomputes it via
    # SCD-2 close (R6) and ignores the raw value, but the scan declares
    # it so the reader stays positional past it
    "crm_prd_info": (
        "prd_id int, prd_key string, prd_nm string, prd_cost int, "
        "prd_line string, prd_start_dt date, prd_end_dt date"
    ),
    "crm_sales_details": (
        "sls_ord_num string, sls_prd_key string, sls_cust_id int, "
        "sls_order_dt int, sls_ship_dt int, sls_due_dt int, "
        "sls_sales int, sls_quantity int, sls_price int"
    ),
    "erp_cust_az12": "cid string, bdate date, gen string",
    "erp_loc_a101": "cid string, cntry string",
    "erp_px_cat_g1v2": "id string, cat string, subcat string, maintenance string",
}

_FILES = {
    "crm_cust_info": "crm/cust_info.csv",
    "crm_prd_info": "crm/prd_info.csv",
    "crm_sales_details": "crm/sales_details.csv",
    "erp_cust_az12": "erp/CUST_AZ12.csv",
    "erp_loc_a101": "erp/LOC_A101.csv",
    "erp_px_cat_g1v2": "erp/PX_CAT_G1V2.csv",
}

# pinned stand-in for the reference's driver-side datetime.now() in the
# R10 future-birthdate rule — after the corpus's creation date, so the
# run is deterministic forever (silver/erp_cust_az12_silver.py:60-64)
REFERENCE_AS_OF = "2026-01-01"


def load_reference_sources(
    spark: SparkSession, base: str = REFERENCE_DATA_DIR
) -> dict[str, DataFrame]:
    """The six reference source tables as DataFrames keyed by the
    pipeline's source-node names (``plans.medallion.build_pipeline``
    externals). Pins the engine's session confs (non-ANSI + UTC) like
    ``session.load`` — the corpus's anomaly rows (month-13 integer
    dates and the like) must land NULL, not throw, under a driver
    session that defaults ANSI on."""
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return {
        name: read_csv(spark, f"{base}/{rel}", schema=REFERENCE_SCHEMAS[name])
        for name, rel in _FILES.items()
    }
