"""Mergeable distinct-count sketches (Apache DataSketches HLL via the
Spark 4 ``hll_*`` built-ins).

``approx_count_distinct`` answers one query; a 100 TB standing
pipeline wants the INCREMENTAL form: sketch each partition/day/batch
ONCE at ingest, persist the sketch bytes (KBs per group), and answer
any later rollup — any coarser grouping, any date range, cross-batch
unions — by merging sketches instead of rescanning raw data. HLL
sketches merge losslessly: union-of-sketches equals
sketch-of-union EXACTLY (same bytes), which is what makes the
pattern safe (pinned by
``test_dedup_similarity.py::test_hll_sketches_merge_losslessly``).

Everything is JVM-side aggregate functions — no Python, one shuffle
per grouping, sketch bytes as ordinary ``binary`` columns in ordinary
tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def distinct_sketches(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    lgk: int = 12,
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Per-key HLL sketches of ``value_col``'s distinct count — the
    ingest-time pass. ``lgk`` trades size for accuracy (2^lgk buckets;
    12 ≈ 1.6% rsd at a few KB). Persist the result keyed by your
    finest useful grouping (e.g. day × source)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias(sketch_col)
    )


def rollup_sketches(
    sketches: DataFrame,
    keys: list[str],
    sketch_col: str = "distinct_sketch",
) -> DataFrame:
    """Merge fine-grained sketches up to a coarser grouping (fewer
    ``keys``) — the query-time pass. Bytes in, bytes out: the result
    can be persisted and rolled up again (day → month → year)."""
    return sketches.groupBy(*keys).agg(
        F.hll_union_agg(sketch_col).alias(sketch_col)
    )


def sketch_estimate(sketch_col: Column | str = "distinct_sketch") -> Column:
    """The distinct-count estimate for a sketch column."""
    c = F.col(sketch_col) if isinstance(sketch_col, str) else sketch_col
    return F.hll_sketch_estimate(c)
