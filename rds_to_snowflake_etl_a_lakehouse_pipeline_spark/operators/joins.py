"""Star-schema join helpers (J1–J5).

Every reference join is a LEFT single-column equi-join of a fact/base
table against a dimension (gold-snowflake/dim_customers_gold.py:31-33,
dim_products_gold.py:29-30, fact_sales_gold.py:41-43). The dim side is
orders-of-magnitude smaller, so the 100 TB plan is a broadcast-hash join
— no shuffle of the big side at all. ``star_join`` makes that the
default and lets AQE take over when a dim outgrows the broadcast
threshold (it falls back to sort-merge with skew splitting).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column | str, str]],
    broadcast_dims: bool = True,
) -> DataFrame:
    """Chain left equi-joins of ``fact`` against each ``(dim, on, how)``.

    ``on`` may be a join Column expression (use ``df.alias`` +
    ``F.col("a.x") == F.col("b.y")`` for self-key disambiguation, the
    reference's P9 idiom) or a common column name. ``broadcast_dims``
    force-hints a broadcast-hash join on every dim side — only pass True
    when every dim genuinely fits in executor memory (dimension tables
    do); pass False to let AQE pick broadcast-vs-sort-merge from runtime
    stats.
    """
    out = fact
    for dim, on, how in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(d, on=on, how=how)
    return out
