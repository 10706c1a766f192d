"""Feature engineering for ML training tables: target encoding,
per-group scaling, bounded one-hot — the transforms a feature pipeline
runs between the gold layer and a trainer.

All pure Catalyst: per-category/group statistics are ONE map-side-
combined aggregation (category-count-sized result) broadcast-joined
back — the fact-sized side never shuffles; expressions fuse into the
scan. Everything rounds to 6 dp so a SQL oracle replays exactly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 10.0,
    out_col: str | None = None,
) -> DataFrame:
    """Smoothed target (mean) encoding: each category value maps to
    ``(n·mean_cat + smoothing·mean_global) / (n + smoothing)`` — the
    standard leakage-damped categorical encoder (rare categories shrink
    toward the global mean instead of memorizing their few labels).
    NULL categories encode like any other level (groupBy keeps them).

    One aggregation over the input (map-side combined, one row per
    category) cross-joined with the 1-row global mean, broadcast back
    onto the input: the big side never shuffles. Rounded to 6 dp.
    """
    out_col = out_col or f"{cat_col}_te"
    per_cat = df.groupBy(cat_col).agg(
        F.avg(label_col).alias("_m"), F.count(label_col).alias("_n")
    )
    glob = df.agg(F.avg(label_col).alias("_g"))
    enc = per_cat.crossJoin(F.broadcast(glob)).select(
        F.col(cat_col).alias("_te_cat"),
        F.round(
            (F.col("_n") * F.col("_m") + smoothing * F.col("_g"))
            / (F.col("_n") + smoothing),
            6,
        ).alias(out_col),
    )
    # eqNullSafe join-back so the NULL-category level (which groupBy
    # keeps as its own row) matches its own encoding instead of
    # silently falling out of a null-unsafe equality
    return df.join(
        F.broadcast(enc), df[cat_col].eqNullSafe(enc["_te_cat"]), "left"
    ).drop("_te_cat")


def zscore_scale(
    df: DataFrame,
    cols: Sequence[str],
    by: Sequence[str] = (),
    ddof: int = 0,
) -> DataFrame:
    """Append ``<col>_z = (x − mean) / stddev`` per column, optionally
    within ``by`` groups (the per-segment normalization a pooled model
    needs when segments have different scales). ``ddof=0`` uses the
    population stddev (``stddev_pop``) — deterministic and replayable;
    a zero-variance group scales to NULL (guarded division, no ±inf).

    One groupBy over the ``by`` keys (or a 1-row global agg) broadcast
    back; the input never shuffles."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"_mu_{c}"))
        sd = F.stddev_pop(c) if ddof == 0 else F.stddev_samp(c)
        aggs.append(sd.alias(f"_sd_{c}"))
    if by:
        stats = df.groupBy(*by).agg(*aggs)
        out = df.join(F.broadcast(stats), list(by), "left")
    else:
        out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    for c in cols:
        out = out.withColumn(
            f"{c}_z",
            F.round(
                F.when(
                    F.col(f"_sd_{c}") > 0,
                    (F.col(c) - F.col(f"_mu_{c}")) / F.col(f"_sd_{c}"),
                ),
                6,
            ),
        )
    return out.drop(*[f"_mu_{c}" for c in cols], *[f"_sd_{c}" for c in cols])


def minmax_scale(
    df: DataFrame, cols: Sequence[str], by: Sequence[str] = ()
) -> DataFrame:
    """Append ``<col>_mm = (x − min) / (max − min)`` per column within
    optional ``by`` groups; a constant group scales to NULL (guarded).
    Same one-agg + broadcast-back shape as :func:`zscore_scale`."""
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"_lo_{c}"))
        aggs.append(F.max(c).alias(f"_hi_{c}"))
    if by:
        stats = df.groupBy(*by).agg(*aggs)
        out = df.join(F.broadcast(stats), list(by), "left")
    else:
        out = df.crossJoin(F.broadcast(df.agg(*aggs)))
    for c in cols:
        rng = F.col(f"_hi_{c}") - F.col(f"_lo_{c}")
        out = out.withColumn(
            f"{c}_mm",
            F.round(
                F.when(rng > 0, (F.col(c) - F.col(f"_lo_{c}")) / rng), 6
            ),
        )
    return out.drop(*[f"_lo_{c}" for c in cols], *[f"_hi_{c}" for c in cols])


def one_hot(
    df: DataFrame, cat_col: str, top_k: int = 16, other: bool = True
) -> DataFrame:
    """Bounded one-hot: 0/1 indicator columns for the ``top_k`` most
    frequent category values (ties broken by value for determinism) —
    NEVER one column per distinct value, which at 100 TB is a schema
    explosion. Remaining values fold into ``<col>_oh_other`` when
    ``other``. The category list is one count aggregation collected to
    the driver (top_k-bounded via the same TakeOrdered the top-k
    queries use), then pure scan-fused indicator expressions."""
    top = [
        r[cat_col]
        for r in df.groupBy(cat_col)
        .count()
        .filter(F.col(cat_col).isNotNull())
        .orderBy(F.desc("count"), F.asc(cat_col))
        .limit(top_k)
        .collect()
    ]
    out = df
    seen = None
    taken: set[str] = set()
    for v in top:
        safe = str(v).strip().lower().replace(" ", "_").replace("-", "_")
        # sanitization can collide for distinct values ('A' vs 'a',
        # 'a b' vs 'a_b'); suffix until unique AGAINST EVERY name taken
        # so far — including earlier suffixed ones, so a literal 'a_2'
        # can never overwrite a generated 'a_2' (or vice versa)
        cand, i = safe, 2
        while cand in taken:
            cand = f"{safe}_{i}"
            i += 1
        taken.add(cand)
        # null-safe: a NULL category is 0 in every indicator (and 1 in
        # _other), never NULL
        hit = F.col(cat_col).eqNullSafe(F.lit(v))
        out = out.withColumn(f"{cat_col}_oh_{cand}", hit.cast("int"))
        seen = hit if seen is None else (seen | hit)
    if other:
        out = out.withColumn(
            f"{cat_col}_oh_other",
            (~F.coalesce(seen, F.lit(False))).cast("int"),
        )
    return out
