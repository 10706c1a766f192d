"""Cleansing / repair rules (reference SURVEY.md §2.10: R2–R5, R7–R11).

R1 (dedup-latest) and R6 (SCD-2 close) are window operators — see
``operators/windows.py``. R12 (current-rows filter) is a plain
``filter(isNull)`` applied in the gold builders (``plans/medallion.py``).

Each rule from the reference's silver layer is a pure, composable
function. All of them compile to built-in Catalyst expressions — no
Python UDFs — so they stay inside whole-stage codegen and cost nothing
extra at 100 TB (they fuse into the enclosing scan/project stage).

Reference sites (intent, not code):
- trim/label normalization   Glue-spark/scripts/silver/crm_cust_info_silver.py:58-71
- key surgery                silver/crm_prd_info_silver.py:53-56,
                             silver/erp_cust_az12_silver.py:54-58,
                             silver/erp_loc_a101_silver.py:50-53
- null cost -> 0             silver/crm_prd_info_silver.py:57-58
- int yyyyMMdd -> date       silver/crm_sales_details_silver.py:49-63
- sales/price repair         silver/crm_sales_details_silver.py:64-78
- future birthdate -> NULL   silver/erp_cust_az12_silver.py:60-64
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def trim_columns(df: DataFrame, cols: Iterable[str]) -> DataFrame:
    """R2: strip leading/trailing whitespace on the named string columns."""
    return df.withColumns({c: F.trim(F.col(c)) for c in cols})


def map_codes(
    col: Column | str,
    mapping: Mapping[str, str],
    default: str = "n/a",
    normalize: bool = True,
) -> Column:
    """R3: code→label normalization.

    ``CASE WHEN UPPER(TRIM(x)) = code THEN label ... ELSE default END`` —
    the intended semantics of the reference's CASE chains
    (silver/crm_cust_info_silver.py:60-71 et al.). Unknown / empty /
    NULL all fall through to ``default``.
    """
    c = F.col(col) if isinstance(col, str) else col
    key = F.upper(F.trim(c)) if normalize else c
    expr: Column | None = None
    for code, label in mapping.items():
        cond = key == code.upper() if normalize else key == code
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    if expr is None:
        return F.lit(default)
    return expr.otherwise(default)


def strip_prefix(col: Column | str, prefix: str) -> Column:
    """R4a: remove a literal prefix when present (``NASAW123`` → ``AW123``).

    Reference: silver/erp_cust_az12_silver.py:54-58 (``cid LIKE 'NAS%'``
    → ``substring(cid, 4)``).
    """
    c = F.col(col) if isinstance(col, str) else col
    # substr(col, len+1) to end-of-string; length(c) is always a safe bound.
    stripped = c.substr(F.lit(len(prefix) + 1), F.length(c))
    return F.when(c.startswith(prefix), stripped).otherwise(c)


def strip_chars(col: Column | str, chars: str = "-") -> Column:
    """R4b: delete every occurrence of the given literal characters
    (``AW-00011000`` → ``AW00011000``).

    Reference: silver/erp_loc_a101_silver.py:50-53.
    """
    c = F.col(col) if isinstance(col, str) else col
    for ch in chars:
        # regexp_replace with an escaped single-char pattern; Spark
        # replaces ALL occurrences (DuckDB needs the 'g' flag).
        c = F.regexp_replace(c, "\\" + ch if ch in r".\+*?[^]$(){}=!<>|:-#" else ch, "")
    return c


def int_yyyymmdd_to_date(col: Column | str) -> Column:
    """R7: int-encoded ``yyyyMMdd`` → DATE; sentinel ``0`` / wrong length → NULL.

    Reference: silver/crm_sales_details_silver.py:49-63.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = c.cast("string")
    return F.when((c == 0) | (F.length(s) != 8), F.lit(None).cast("date")).otherwise(
        F.to_date(s, "yyyyMMdd")
    )


def recompute_amount(
    sales: Column | str, quantity: Column | str, price: Column | str
) -> Column:
    """R8: repair the sales amount.

    If ``sales`` is NULL, ≤ 0, or ≠ ``quantity * abs(price)``, recompute it
    as ``quantity * abs(price)``; otherwise keep it.
    Reference: silver/crm_sales_details_silver.py:64-70.
    """
    s = F.col(sales) if isinstance(sales, str) else sales
    q = F.col(quantity) if isinstance(quantity, str) else quantity
    p = F.col(price) if isinstance(price, str) else price
    expected = q * F.abs(p)
    return F.when(s.isNull() | (s <= 0) | (s != expected), expected).otherwise(s)


def backfill_unit_price(
    sales: Column | str, quantity: Column | str, price: Column | str
) -> Column:
    """R9: backfill the unit price from (repaired) sales.

    If ``price`` is NULL or ≤ 0 → ``sales / (quantity if quantity != 0
    else 1)``. Division widens to DOUBLE (documented engine decision,
    SURVEY.md §7 — the oracle casts the same way).
    Reference: silver/crm_sales_details_silver.py:72-78.
    """
    s = F.col(sales) if isinstance(sales, str) else sales
    q = F.col(quantity) if isinstance(quantity, str) else quantity
    p = F.col(price) if isinstance(price, str) else price
    divisor = F.when(q != 0, q).otherwise(F.lit(1))
    return F.when(p.isNull() | (p <= 0), s / divisor).otherwise(p.cast("double"))


def coalesce_zero(col: Column | str) -> Column:
    """R5: NULL numeric → 0 (``coalesce(prd_cost, 0)``).

    Reference: silver/crm_prd_info_silver.py:57-58.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(0))


def category_id_from_key(col: Column | str) -> Column:
    """R4c: first 5 chars of a product key, ``-`` → ``_`` (joins px_cat.id).

    ``CO-RF-FR-R92B-58`` → ``CO_RF``.
    Reference: silver/crm_prd_info_silver.py:53-54.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.substring(c, 1, 5), "-", "_")


def product_number_from_key(col: Column | str) -> Column:
    """R4d: chars 7..end of a product key (joins sales.sls_prd_key).

    ``CO-RF-FR-R92B-58`` → ``FR-R92B-58``. The reference passed a Column
    as substring length (silver/crm_prd_info_silver.py:56) — intended
    semantics is substring-to-end.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.substr(F.lit(7), F.length(c))


def prefer_source(primary: Column | str, fallback: Column | str, na: str = "n/a") -> Column:
    """R11: primary value wins unless it equals ``na`` (or is NULL), else
    fallback, else ``na``.

    Reference: gold-snowflake/dim_customers_gold.py:48-49 (CRM gender wins
    unless 'n/a', else ERP gen, else 'n/a').
    """
    p = F.col(primary) if isinstance(primary, str) else primary
    f_ = F.col(fallback) if isinstance(fallback, str) else fallback
    return F.when(p.isNotNull() & (p != na), p).otherwise(F.coalesce(f_, F.lit(na)))


def null_if_future(col: Column | str, as_of: str | Column | None = None) -> Column:
    """R10: values after ``as_of`` (default: current_date) become NULL.

    ``as_of`` should be pinned to a literal in tests/oracles for
    determinism (the reference compared against driver-side
    ``datetime.now()`` — silver/erp_cust_az12_silver.py:60-64).
    """
    c = F.col(col) if isinstance(col, str) else col
    if as_of is None:
        bound: Column = F.current_date()
    elif isinstance(as_of, str):
        bound = F.lit(as_of).cast("timestamp")
    else:
        bound = as_of
    return F.when(c > bound, F.lit(None)).otherwise(c)
