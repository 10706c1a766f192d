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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-defeating equi-join when BOTH sides are too big to broadcast
    and the key distribution is pathological (one customer = 30% of the
    fact table, the classic hot key).

    The skewed (left) side gets a random salt in [0, salt); the right
    side is replicated ``salt`` times (explode of a literal range) so
    every (key, salt) bucket still finds its match. The hot key's rows
    now spread over ``salt`` reducers instead of one. Cost: right side
    shuffled at salt× volume — only pay it when AQE's skew splitting
    (on by default in `session.py`) isn't enough, e.g. a single key too
    large for even a split partition.

    Join columns are salted copies; output drops the helpers and is
    column-identical to ``left.join(right, key, how)``.
    """
    lk, rk = f"_salt_{key}", f"_salt_r_{key}"
    l_salted = left.withColumn(lk, (F.rand(seed=42) * salt).cast("int"))
    r_replicated = right.withColumn(
        rk, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = (l_salted[key] == r_replicated[key]) & (l_salted[lk] == r_replicated[rk])
    dup_right = [c for c in right.columns if c == key]
    out = l_salted.join(r_replicated, cond, how)
    # drop the salt helpers and the right side's duplicate key column
    out = out.drop(lk, rk)
    for c in dup_right:
        out = out.drop(r_replicated[c])
    return out
