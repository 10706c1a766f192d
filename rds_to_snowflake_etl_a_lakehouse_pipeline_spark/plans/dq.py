"""Data-quality gates (S9).

The reference runs ``EvaluateDataQuality().process_rows`` with the DQDL
ruleset ``ColumnCount > 0`` before every sink (bronze/crm_cust_info_bronze.py
:17-21,30-35; every silver job). Here the rule engine is Spark-native:

- ``evaluate_now``: one aggregate job computes every rule's violation
  count in a single pass (no per-rule scans).
- ``attach_observation``: zero-extra-pass variant — piggybacks the same
  metrics on the next action (the sink write) via ``df.observe``, the
  scale-correct way to gate a 100 TB write.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


@dataclass(frozen=True)
class DQRule:
    """One rule. kind ∈ {column_count, row_count, not_null, unique,
    predicate}. ``column`` for not_null/unique; ``predicate`` is a Column
    that is TRUE for GOOD rows; ``threshold`` is the min for count kinds.
    """

    name: str
    kind: str
    column: str | None = None
    predicate: Column | None = None
    threshold: int = 1


@dataclass(frozen=True)
class DQResult:
    rule: str
    passed: bool
    observed: float


def _metrics(df: DataFrame, rules: list[DQRule]) -> list[Column]:
    aggs: list[Column] = [F.count(F.lit(1)).alias("_dq_rows")]
    for r in rules:
        if r.kind == "not_null":
            aggs.append(
                F.sum(F.col(r.column).isNull().cast("long")).alias(f"_dq_{r.name}")
            )
        elif r.kind == "unique":
            # approx at observe-time would be cheaper at 100 TB; exact here
            aggs.append(F.count_distinct(F.col(r.column)).alias(f"_dq_{r.name}"))
        elif r.kind == "predicate":
            aggs.append(
                F.sum((~r.predicate).cast("long")).alias(f"_dq_{r.name}")
            )
    return aggs


def _results(df: DataFrame, rules: list[DQRule], row: dict) -> list[DQResult]:
    n_rows = row["_dq_rows"]
    out = []
    for r in rules:
        if r.kind == "column_count":
            observed = len(df.columns)
            out.append(DQResult(r.name, observed >= r.threshold, observed))
        elif r.kind == "row_count":
            out.append(DQResult(r.name, n_rows >= r.threshold, n_rows))
        elif r.kind == "not_null":
            nulls = row[f"_dq_{r.name}"] or 0
            out.append(DQResult(r.name, nulls == 0, nulls))
        elif r.kind == "unique":
            distinct = row[f"_dq_{r.name}"]
            out.append(DQResult(r.name, distinct == n_rows, distinct))
        elif r.kind == "predicate":
            bad = row[f"_dq_{r.name}"] or 0
            out.append(DQResult(r.name, bad == 0, bad))
        else:
            raise ValueError(f"unknown DQ rule kind: {r.kind}")
    return out


def evaluate_now(df: DataFrame, rules: list[DQRule]) -> list[DQResult]:
    """Evaluate all rules in ONE aggregate pass over df."""
    row = df.agg(*_metrics(df, rules)).first().asDict()
    return _results(df, rules, row)


def attach_observation(df: DataFrame, rules: list[DQRule], name: str = "dq"):
    """Attach rules as a ``df.observe`` so the NEXT action (e.g. the sink
    write) produces the metrics for free. Returns (df, finish) where
    ``finish()`` — called after the action — returns the DQResults.

    ``unique`` rules are excluded (count_distinct is not an allowed
    observe metric); run those via :func:`evaluate_now`.
    """
    obs_rules = [r for r in rules if r.kind in ("row_count", "not_null", "predicate", "column_count")]
    obs = Observation(name)
    observed = df.observe(obs, *_metrics(df, [r for r in obs_rules if r.kind != "column_count"]))

    def finish() -> list[DQResult]:
        return _results(df, obs_rules, dict(obs.get))

    return observed, finish


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-level data profile — the per-column summary a DQ
    dashboard renders and a drift monitor diffs across loads: one row
    per profiled column with ``(column, n_rows, n_null, null_rate,
    n_distinct, min_value, max_value)`` (extrema as strings so numeric,
    date and text columns share one schema).

    Plan: ONE aggregation computes every metric — nulls and extrema
    are plain aggregate expressions, distinct counts per column go
    through Spark's expand-based multi-distinct (rows × |cols| into
    the partial agg, still a single shuffle). The per-column pivot is
    driver-side literal assembly over the 1-row result, not a data
    operation. For very wide tables at 100 TB, swap the exact distinct
    for ``approx_count_distinct`` — the plan shape is unchanged and
    the expand multiplier disappears.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs: list[Column] = [F.count("*").alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    # pin the 1-row aggregate: the per-column union below references it
    # |cols| times, and an unmaterialized plan would re-run the whole
    # corpus aggregation per column (the same trap percentile_buckets_multi
    # exists to avoid)
    row = df.agg(*aggs).localCheckpoint(eager=True)
    parts = []
    for c in cols:
        parts.append(
            row.select(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_null"),
                F.round(
                    (F.col("_n") - F.col(f"_nn_{c}"))
                    / F.col("_n").cast("double"),
                    6,
                ).alias("null_rate"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def iqr_outliers(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    k: float = 1.5,
    flag_col: str = "is_outlier",
) -> DataFrame:
    """Tukey-fence outlier flagging: a row is an outlier when its value
    falls outside ``[q1 − k·IQR, q3 + k·IQR]`` of its group — the
    standard box-plot rule, chosen over z-scores deliberately: quartiles
    are ORDER STATISTICS (deterministic under any aggregation order and
    exactly replayable in any engine), where mean/σ inherit float
    summation-order noise; and the fences themselves are robust to the
    very outliers being flagged.

    Appends ``flag_col`` plus the group's ``_q1``/``_q3`` bounds.
    Plan: one exact-percentile aggregation per group (partial-agg
    shuffle, group-cardinality-sized result) joined back broadcast —
    the data itself never shuffles. NULL values flag NULL.
    """
    by = by or []
    v = F.col(value_col).cast("double")
    agg = (df.groupBy(*by) if by else df.groupBy()).agg(
        F.expr(f"percentile({value_col}, 0.25)").alias("_q1"),
        F.expr(f"percentile({value_col}, 0.75)").alias("_q3"),
    )
    joined = (
        df.join(F.broadcast(agg), by, "left") if by
        else df.crossJoin(F.broadcast(agg))
    )
    iqr = F.col("_q3") - F.col("_q1")
    lo = F.col("_q1") - F.lit(k) * iqr
    hi = F.col("_q3") + F.lit(k) * iqr
    return joined.withColumn(
        flag_col,
        F.when(v.isNull(), F.lit(None).cast("boolean")).otherwise(
            (v < lo) | (v > hi)
        ),
    )


def quarantine_split(
    df: DataFrame, rules: list[DQRule]
) -> tuple[DataFrame, DataFrame]:
    """Row-level DQ routing — the dead-letter pattern: rows failing any
    ROW-expressible rule (``not_null`` / ``predicate``) go to the
    quarantine side with a sorted ``_dq_failed`` array naming every
    rule they broke (all of them, not just the first — triage needs
    the full diagnosis); clean rows pass through unchanged. A NULL
    predicate result counts as a failure (unknown is not good).
    Dataset-level kinds (row_count / unique / column_count) cannot
    route individual rows and raise — gate those with
    :func:`evaluate_now` / :func:`attach_observation`.

    Pure scan-fused expressions — the split is two filters over one
    shared projection, no shuffle, no second scan when the source
    caches or the sink consumes both sides in one pass."""
    marks = []
    for r in rules:
        if r.kind == "not_null":
            bad = F.col(r.column).isNull()
        elif r.kind == "predicate":
            bad = ~F.coalesce(r.predicate, F.lit(False))
        else:
            raise ValueError(
                f"rule {r.name!r}: kind {r.kind!r} is dataset-level — "
                "quarantine_split routes rows, use evaluate_now for it"
            )
        marks.append(F.when(bad, F.lit(r.name)))
    failed = F.array_sort(F.array_compact(F.array(*marks)))
    out = df.withColumn("_dq_failed", failed)
    good = out.filter(F.size("_dq_failed") == 0).drop("_dq_failed")
    bad_rows = out.filter(F.size("_dq_failed") > 0)
    return good, bad_rows
