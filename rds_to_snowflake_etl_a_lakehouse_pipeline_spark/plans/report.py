"""Corpus datasheet: the one-call summary a dataset release ships with.

Rolls the text-tier signals (token counts, heuristic quality, exact
duplicate rate) up to one row per language — the "datasheet for
datasets" numbers (composition, volume, quality, redundancy) produced
as a single declarative plan: one scan pass computing per-document
signals, one aggregation shuffle, plus a window over the ALREADY
AGGREGATED per-language frame (a handful of rows — the same
tiny-aggregate pattern as ``mixture_weights``; the single-partition
exchange there is over ~5 rows, not the corpus).

Every column is deterministic and SQL-expressible, so the whole report
is oracle-checked end-to-end (``t_corpus_report``) — unlike
sketch-based profiling, this is the exact form; swap in
``operators.sketches`` when corpus size makes exact distinct counts
the bottleneck.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count


def corpus_report(
    df: DataFrame, text_col: str = "text", lang_col: str = "lang"
) -> DataFrame:
    """Per-language corpus summary: document count + corpus share,
    token volume, mean heuristic quality, exact distinct texts and the
    implied duplicate rate."""
    per_doc = df.select(
        F.col(lang_col).alias("lang"),
        F.col(text_col).alias("_text"),
        token_count(F.col(text_col)).alias("_n_tokens"),
        quality_score(F.col(text_col)).alias("_q"),
    )
    agg = per_doc.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("_n_tokens").alias("total_tokens"),
        F.round(F.avg("_q"), 6).alias("avg_quality"),
        F.countDistinct("_text").alias("distinct_texts"),
    )
    total = Window.partitionBy()
    return agg.select(
        "lang",
        "n_docs",
        "total_tokens",
        "avg_quality",
        "distinct_texts",
        F.round(F.col("n_docs") / F.sum("n_docs").over(total), 6).alias("share"),
        F.round(1.0 - F.col("distinct_texts") / F.col("n_docs"), 6).alias(
            "dup_rate"
        ),
    )
