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


def corpus_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str = "text",
    k: int = 25,
    add_k: float = 0.5,
    min_count: int = 5,
) -> DataFrame:
    """Distribution drift between two corpus snapshots (crawls,
    pipeline versions): per-term relative frequencies in each side,
    ranked by absolute add-k-smoothed log-ratio — the "what changed"
    monitor a training-data pipeline runs between snapshots to catch a
    crawl gone wrong (new boilerplate flooding in, a language/source
    silently dropping out) BEFORE training on it.

    ``log_ratio = ln(((c_new + add_k)/(N_new + add_k·V)) /
    ((c_old + add_k)/(N_old + add_k·V)))`` with V = the union
    vocabulary size; terms with fewer than ``min_count`` total
    occurrences are dropped (rare-term noise). Returns the top ``k``
    by |log_ratio| (ties → term asc): ``(term, c_old, c_new,
    log_ratio)``.

    Plan: one token-explode + (term) agg per side (partial-agg
    shuffles), a full-outer term join, two 1-row total/vocab aggs
    broadcast in, and a terminal TakeOrdered — no global sort, no skew
    surface beyond the term agg (which max_df-style caps don't need:
    counting is associative, hot terms partial-aggregate map-side).
    """
    def counts(df):
        return (
            df.select(
                F.explode(
                    F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count("*").alias("c"))
        )

    co = counts(old).select("term", F.col("c").alias("c_old"))
    cn = counts(new).select("term", F.col("c").alias("c_new"))
    j = (
        co.join(cn, "term", "full_outer")
        .select(
            "term",
            F.coalesce("c_old", F.lit(0)).alias("c_old"),
            F.coalesce("c_new", F.lit(0)).alias("c_new"),
        )
        .filter(F.col("c_old") + F.col("c_new") >= min_count)
    )
    totals = j.agg(
        F.sum("c_old").alias("_n_old"),
        F.sum("c_new").alias("_n_new"),
        F.count("*").alias("_v"),
    )
    p_new = (F.col("c_new") + add_k) / (
        F.col("_n_new") + add_k * F.col("_v")
    )
    p_old = (F.col("c_old") + add_k) / (
        F.col("_n_old") + add_k * F.col("_v")
    )
    return (
        j.crossJoin(F.broadcast(totals))
        .select(
            "term",
            "c_old",
            "c_new",
            F.round(F.log(p_new / p_old), 6).alias("log_ratio"),
        )
        .orderBy(F.abs(F.col("log_ratio")).desc(), F.col("term").asc())
        .limit(k)
    )
