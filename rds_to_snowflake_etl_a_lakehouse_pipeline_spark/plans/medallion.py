"""The medallion pipeline: silver transforms + gold star-schema builders.

Pure ``DataFrame → DataFrame`` re-expressions of the reference's 15
jobs (Glue-spark/scripts/{bronze,silver,gold-snowflake}/*.py). Bronze is
ingest-passthrough (the runner adds the DQ gate + parquet sink); the
semantics live in silver (cleansing rules R1–R10) and gold (star joins,
surrogate keys, R11–R12).

Scale notes: silver transforms are single-pass Catalyst expressions over
one shuffle (the W1/W3 window key) at most. Gold joins broadcast only
genuinely small dims (product categories); customer-sized joins are left
to AQE. Surrogate keys default to the two-phase range-partitioned form
(``scale_safe=True``) — no single-task global window in any default
plan; pass ``scale_safe=False`` only for bit-exact parity runs against
the reference's global ``row_number`` (same output, single-reducer
plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import cleansing as cl
from ..operators.joins import star_join
from ..operators.windows import dedupe_latest, scd2_close, surrogate_key, surrogate_key_two_phase

# --------------------------------------------------------------- silver

MARITAL_LABELS = {"S": "Single", "M": "Married"}
GENDER_LABELS = {"F": "Female", "M": "Male"}
GENDER_LABELS_FULL = {"F": "Female", "FEMALE": "Female", "M": "Male", "MALE": "Male"}
PRD_LINE_LABELS = {"M": "Mountain", "R": "Road", "S": "Other Sales", "T": "Touring"}


def silver_crm_cust_info(df: DataFrame) -> DataFrame:
    """silver/crm_cust_info_silver.py:55-84 — R1 dedup-latest per cst_id,
    R2 trim names, R3 marital/gender code→label."""
    latest = dedupe_latest(df, ["cst_id"], "cst_create_date")
    return latest.select(
        "cst_id",
        "cst_key",
        F.trim("cst_firstname").alias("cst_firstname"),
        F.trim("cst_lastname").alias("cst_lastname"),
        cl.map_codes("cst_marital_status", MARITAL_LABELS).alias("cst_marital_status"),
        cl.map_codes("cst_gndr", GENDER_LABELS).alias("cst_gndr"),
        "cst_create_date",
    )


def silver_crm_prd_info(df: DataFrame) -> DataFrame:
    """silver/crm_prd_info_silver.py:50-80 — R4 key split, R5 cost→0,
    R3 product-line labels, R6 SCD-2 end-dating."""
    derived = df.select(
        "prd_id",
        cl.category_id_from_key("prd_key").alias("cat_id"),
        cl.product_number_from_key("prd_key").alias("prd_key"),
        "prd_nm",
        cl.coalesce_zero("prd_cost").alias("prd_cost"),
        cl.map_codes("prd_line", PRD_LINE_LABELS).alias("prd_line"),
        F.col("prd_start_dt").cast("date").alias("prd_start_dt"),
    )
    closed = scd2_close(derived, ["prd_key"], "prd_start_dt", "prd_end_dt")
    return closed.withColumn("prd_end_dt", F.col("prd_end_dt").cast("date"))


def silver_crm_sales_details(df: DataFrame) -> DataFrame:
    """silver/crm_sales_details_silver.py:49-90 — R7 int→date ×3,
    R8 sales repair, R9 price backfill (widened to double)."""
    sales_fixed = cl.recompute_amount("sls_sales", "sls_quantity", "sls_price")
    return df.select(
        "sls_ord_num",
        "sls_prd_key",
        "sls_cust_id",
        cl.int_yyyymmdd_to_date("sls_order_dt").alias("sls_order_dt"),
        cl.int_yyyymmdd_to_date("sls_ship_dt").alias("sls_ship_dt"),
        cl.int_yyyymmdd_to_date("sls_due_dt").alias("sls_due_dt"),
        sales_fixed.cast("double").alias("sls_sales"),
        "sls_quantity",
        cl.backfill_unit_price(sales_fixed, "sls_quantity", "sls_price").alias("sls_price"),
    )


def silver_erp_cust_az12(df: DataFrame, as_of: str | None = None) -> DataFrame:
    """silver/erp_cust_az12_silver.py:52-78 — R4 NAS-prefix strip,
    R10 future birthdate → NULL (pin ``as_of`` for determinism),
    R3 gender incl. full-word variants."""
    return df.select(
        cl.strip_prefix("cid", "NAS").alias("cid"),
        cl.null_if_future("bdate", as_of).alias("bdate"),
        cl.map_codes("gen", GENDER_LABELS_FULL).alias("gen"),
    )


def silver_erp_loc_a101(df: DataFrame) -> DataFrame:
    """silver/erp_loc_a101_silver.py:50-66 — R4 hyphen strip; country
    normalization: DE→Germany, US/USA→United States, blank/NULL→'n/a',
    anything else kept trimmed (NOT defaulted — unlike code→label maps).
    """
    t = F.trim(F.col("cntry"))
    cntry = (
        F.when(t.isNull() | (t == ""), "n/a")
        .when(t == "DE", "Germany")
        .when(t.isin("US", "USA"), "United States")
        .otherwise(t)
    )
    return df.select(cl.strip_chars("cid", "-").alias("cid"), cntry.alias("cntry"))


def silver_erp_px_cat_g1v2(df: DataFrame) -> DataFrame:
    """silver/erp_px_cat_g1v2_silver.py:47 — pass-through projection
    (the reference's ``select_fields`` intent)."""
    return df.select("id", "cat", "subcat", "maintenance")


# ----------------------------------------------------------------- gold


def gold_dim_customers(
    cust: DataFrame, az12: DataFrame, loc: DataFrame, scale_safe: bool = True
) -> DataFrame:
    """gold-snowflake/dim_customers_gold.py:23-52 — J1+J2 left joins on
    cst_key, R11 gender source preference, W2 surrogate key by cst_id."""
    joined = star_join(
        cust.alias("ci"),
        [
            (az12.alias("ca"), F.col("ci.cst_key") == F.col("ca.cid"), "left"),
            (loc.alias("la"), F.col("ci.cst_key") == F.col("la.cid"), "left"),
        ],
        broadcast_dims=False,  # customer-sized sides; let AQE choose
    )
    keyed = (
        surrogate_key_two_phase(joined, ["cst_id"], "customer_key")
        if scale_safe
        else surrogate_key(joined, ["cst_id"], "customer_key")
    )
    return keyed.select(
        "customer_key",
        F.col("cst_id").alias("customer_id"),
        F.col("cst_key").alias("customer_number"),
        F.col("cst_firstname").alias("first_name"),
        F.col("cst_lastname").alias("last_name"),
        F.col("cntry").alias("country"),
        F.col("cst_marital_status").alias("marital_status"),
        cl.prefer_source("cst_gndr", "gen").alias("gender"),
        F.col("bdate").alias("birthdate"),
        F.col("cst_create_date").alias("create_date"),
    )


def gold_dim_products(
    prd: DataFrame, cat: DataFrame, scale_safe: bool = True
) -> DataFrame:
    """gold-snowflake/dim_products_gold.py:23-51 — R12 current rows only,
    J3 broadcast join to the tiny category dim, W2 surrogate key by
    (start, key)."""
    current = prd.filter(F.col("prd_end_dt").isNull())
    joined = star_join(
        current.alias("pn"),
        [(cat.alias("pc"), F.col("pn.cat_id") == F.col("pc.id"), "left")],
        broadcast_dims=True,  # categories: tens of rows
    )
    order = ["prd_start_dt", "prd_key"]
    keyed = (
        surrogate_key_two_phase(joined, order, "product_key")
        if scale_safe
        else surrogate_key(joined, order, "product_key")
    )
    return keyed.select(
        "product_key",
        F.col("prd_id").alias("product_id"),
        F.col("prd_key").alias("product_number"),
        F.col("prd_nm").alias("product_name"),
        F.col("cat_id").alias("category_id"),
        F.col("cat").alias("category"),
        F.col("subcat").alias("subcategory"),
        "maintenance",
        F.col("prd_cost").alias("cost"),
        F.col("prd_line").alias("product_line"),
        F.col("prd_start_dt").alias("start_date"),
    )


def gold_fact_sales(sales: DataFrame, dim_prod: DataFrame, dim_cust: DataFrame) -> DataFrame:
    """gold-snowflake/fact_sales_gold.py:23-57 — J4+J5: fact left-joins
    both dims (broadcast: dims are orders-of-magnitude smaller than the
    fact at any scale)."""
    joined = star_join(
        sales.alias("sd"),
        [
            (
                dim_prod.select("product_key", "product_number").alias("pr"),
                F.col("sd.sls_prd_key") == F.col("pr.product_number"),
                "left",
            ),
            (
                dim_cust.select("customer_key", "customer_id").alias("cu"),
                F.col("sd.sls_cust_id") == F.col("cu.customer_id"),
                "left",
            ),
        ],
        broadcast_dims=True,
    )
    return joined.select(
        F.col("sls_ord_num").alias("order_number"),
        "product_key",
        "customer_key",
        F.col("sls_order_dt").alias("order_date"),
        F.col("sls_ship_dt").alias("shipping_date"),
        F.col("sls_due_dt").alias("due_date"),
        F.col("sls_sales").alias("sales_amount"),
        F.col("sls_quantity").alias("quantity"),
        F.col("sls_price").alias("price"),
    )


# ------------------------------------------------------------- pipeline


def build_pipeline(as_of: str | None = None, scale_safe: bool = True, warehouse=None):
    """The full 15-node medallion DAG over the six CRM/ERP source tables
    (external inputs: crm_cust_info, crm_prd_info, crm_sales_details,
    erp_cust_az12, erp_loc_a101, erp_px_cat_g1v2)."""
    from .dq import DQRule
    from .runner import Node, Pipeline

    def gate(*extra: DQRule) -> list[DQRule]:
        # the reference's ColumnCount>0 DQDL rule + a row-count floor
        return [
            DQRule("column_count", "column_count", threshold=1),
            DQRule("row_count", "row_count", threshold=1),
            *extra,
        ]

    ident = lambda df: df  # noqa: E731 — bronze = raw ingest passthrough

    sources = [
        "crm_cust_info",
        "crm_prd_info",
        "crm_sales_details",
        "erp_cust_az12",
        "erp_loc_a101",
        "erp_px_cat_g1v2",
    ]
    nodes = [
        Node(f"bronze_{s}", ident, deps=[s], sink=f"bronze.{s}", dq_rules=gate())
        for s in sources
    ]
    nodes += [
        Node(
            "silver_crm_cust_info",
            silver_crm_cust_info,
            deps=["bronze_crm_cust_info"],
            sink="silver.crm_cust_info",
            dq_rules=gate(DQRule("cst_id_unique", "unique", column="cst_id")),
        ),
        Node(
            "silver_crm_prd_info",
            silver_crm_prd_info,
            deps=["bronze_crm_prd_info"],
            sink="silver.crm_prd_info",
            dq_rules=gate(DQRule("cost_not_null", "predicate", predicate=F.col("prd_cost").isNotNull())),
        ),
        Node(
            "silver_crm_sales_details",
            silver_crm_sales_details,
            deps=["bronze_crm_sales_details"],
            sink="silver.crm_sales_details",
            dq_rules=gate(
                DQRule(
                    "sales_consistent",
                    "predicate",
                    # float tolerance: price may be backfilled as sales/qty,
                    # so qty*abs(price) can differ from sales by one ulp;
                    # qty=0 rows are exempt (divide-by-1 backfill keeps sales)
                    predicate=(F.col("sls_quantity") == 0)
                    | (
                        F.abs(
                            F.col("sls_sales")
                            - F.col("sls_quantity") * F.abs(F.col("sls_price"))
                        )
                        <= F.lit(1e-6)
                    ),
                )
            ),
        ),
        Node(
            "silver_erp_cust_az12",
            lambda df: silver_erp_cust_az12(df, as_of),
            deps=["bronze_erp_cust_az12"],
            sink="silver.erp_cust_az12",
            dq_rules=gate(),
        ),
        Node(
            "silver_erp_loc_a101",
            silver_erp_loc_a101,
            deps=["bronze_erp_loc_a101"],
            sink="silver.erp_loc_a101",
            dq_rules=gate(),
        ),
        Node(
            "silver_erp_px_cat_g1v2",
            silver_erp_px_cat_g1v2,
            deps=["bronze_erp_px_cat_g1v2"],
            sink="silver.erp_px_cat_g1v2",
            dq_rules=gate(),
        ),
        Node(
            "gold_dim_customers",
            lambda c, a, l: gold_dim_customers(c, a, l, scale_safe),
            deps=["silver_crm_cust_info", "silver_erp_cust_az12", "silver_erp_loc_a101"],
            sink="gold.dim_customers",
            warehouse_table="warehouse.dim_customers",
            dq_rules=gate(DQRule("customer_key_unique", "unique", column="customer_key")),
        ),
        Node(
            "gold_dim_products",
            lambda p, c: gold_dim_products(p, c, scale_safe),
            deps=["silver_crm_prd_info", "silver_erp_px_cat_g1v2"],
            sink="gold.dim_products",
            warehouse_table="warehouse.dim_products",
            dq_rules=gate(DQRule("product_key_unique", "unique", column="product_key")),
        ),
        Node(
            "gold_fact_sales",
            gold_fact_sales,
            deps=["silver_crm_sales_details", "gold_dim_products", "gold_dim_customers"],
            sink="gold.fact_sales",
            warehouse_table="warehouse.fact_sales",
            dq_rules=gate(),
        ),
    ]
    return Pipeline(nodes, warehouse=warehouse)
