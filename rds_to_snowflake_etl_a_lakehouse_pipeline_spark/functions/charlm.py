"""Character n-gram language-model scoring (perplexity-proxy quality).

CCNet-style pipelines (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", 2020) rank web documents by
language-model perplexity: text that a small LM finds predictable is
overwhelmingly natural prose; gibberish, encoding junk, and
keyword-stuffed spam score poorly. The published recipe uses a KenLM
5-gram word model; this module is the dependency-free distributed
analog — an add-k-smoothed character n-gram model trained and applied
entirely as DataFrame plans, so the score is exactly replayable in SQL
(the oracle) and needs no model artifacts beyond two small tables.

Score = mean negative log-likelihood (nats) per character n-gram:

    nll(doc) = -avg over grams of  log P(char | context)
    P(c | ctx) = (count(ctx, c) + k) / (count(ctx) + k * V)

with V = corpus character-vocabulary size. Lower = more natural under
the training distribution. Unseen (ctx, c) at scoring time falls back
to the context's smoothed unseen mass; an unseen context falls back to
the uniform 1/V.

Scale (100 TB): the model is BOUNDED — at most |charset|^n rows
(~1M for n=3 over printable text), aggregated once and broadcast for
scoring. Training explodes the sample into grams (one shuffle to the
(ctx, char) counts); train on a :func:`..operators.curation
.stratified_sample` of the corpus, not the corpus — the model
converges on a few hundred MB of text. Scoring the full corpus is one
explode + two broadcast joins + one per-doc aggregation (single
shuffle on the doc id); no Python anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class CharLM:
    """A trained model: the (ctx, ch, logp) table, the per-context
    unseen-mass table, the vocabulary size, and the hyperparameters
    that must match between train and score."""

    ngrams: DataFrame  # (ctx, ch, logp)
    contexts: DataFrame  # (ctx, unk_logp)
    vocab_size: int
    n: int
    add_k: float


def _grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, ctx, ch): every length-``n`` character window, split into
    its (n-1)-char context and final char. Pure Catalyst explode —
    one row per gram, no Python."""
    # sequence(1, 0) is the DESCENDING [1, 0] in Spark — docs shorter
    # than n must yield an empty gram array, not bogus windows
    idx = F.when(
        F.length(text_col) >= n,
        F.sequence(F.lit(1), F.length(text_col) - (n - 1)),
    ).otherwise(F.array().cast("array<int>"))
    return (
        df.select(
            F.col(id_col).alias("_id"),
            F.explode(
                F.transform(idx, lambda i: F.col(text_col).substr(i, F.lit(n)))
            ).alias("_gram"),
        )
        .select(
            "_id",
            F.substring("_gram", 1, n - 1).alias("ctx"),
            F.substring("_gram", n, 1).alias("ch"),
        )
    )


def train_char_lm(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    add_k: float = 0.5,
) -> CharLM:
    """Fit the add-k-smoothed char n-gram model on ``df[text_col]``.

    Two bounded aggregations: (ctx, ch) counts and per-ctx totals, plus
    one tiny action for the vocabulary size (distinct final chars —
    needed driver-side because the smoothing denominator folds it into
    every logp constant). Train on a sample at scale (module
    docstring); the returned tables are broadcast-sized by
    construction.
    """
    if n < 2:
        raise ValueError("n must be >= 2 (need a non-empty context)")
    grams = _grams(df.select(F.lit(1).alias("_one"), text_col), "_one", text_col, n)
    return train_char_lm_from_grams(grams, n=n, add_k=add_k)


def train_char_lm_from_grams(
    grams: DataFrame,
    n: int = 3,
    add_k: float = 0.5,
) -> CharLM:
    """Fit from an ALREADY-EXPLODED gram frame (the :func:`_grams`
    output — any id column is ignored): the self-scoring composition
    (train on the corpus, then score the same corpus) explodes the
    corpus ONCE, materializes the gram frame, and feeds both this fit
    and :func:`score_char_lm`'s ``grams=`` — instead of paying the
    dominant explode pass twice. Identical model to
    :func:`train_char_lm` by construction (same aggregations)."""
    # materialize the (bounded, <= charset^n rows) counts table so the
    # vocab-size action and the totals aggregation reuse it instead of
    # re-exploding the corpus — one training pass, not three
    counts = (
        grams.groupBy("ctx", "ch").agg(F.count("*").alias("_c")).localCheckpoint(
            eager=True
        )
    )
    vocab_size = counts.select("ch").distinct().count()
    totals = counts.groupBy("ctx").agg(F.sum("_c").alias("_tot"))
    denom = F.col("_tot") + F.lit(add_k) * F.lit(float(vocab_size))
    ngrams = (
        counts.join(totals, "ctx")
        .select(
            "ctx",
            "ch",
            F.log((F.col("_c") + F.lit(add_k)) / denom).alias("logp"),
        )
    )
    contexts = totals.select(
        "ctx", F.log(F.lit(add_k) / denom).alias("unk_logp")
    )
    return CharLM(ngrams, contexts, vocab_size, n, add_k)


def score_char_lm(
    df: DataFrame,
    lm: CharLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "nll",
    count_col: str = "n_grams",
    grams: DataFrame | None = None,
) -> DataFrame:
    """``df`` columns ``id_col`` + (``count_col``, ``score_col``):
    gram count and mean negative log-likelihood (nats/gram, rounded to
    6 — cross-engine float-aggregate convention). Lower = more natural
    under the training corpus; docs shorter than ``lm.n`` chars get
    ``n_grams = 0`` and NULL ``score_col``.

    Plan: explode to grams (narrow), two broadcast joins against the
    bounded model tables, one hash aggregation on ``id_col``, one left
    join back to carry zero-gram docs — the corpus never shuffles
    except for its own per-doc aggregation.

    ``grams``: a pre-built (and usually materialized) :func:`_grams`
    frame over ``df`` — pass the SAME frame that fed
    :func:`train_char_lm_from_grams` in the self-scoring composition,
    so the corpus explode is paid once for both passes.
    """
    uniform = -math.log(lm.vocab_size) if lm.vocab_size > 0 else 0.0
    if grams is None:
        grams = _grams(df, id_col, text_col, lm.n)
    scored = (
        grams.join(F.broadcast(lm.ngrams), ["ctx", "ch"], "left")
        .join(F.broadcast(lm.contexts), "ctx", "left")
        .select(
            "_id",
            F.coalesce("logp", "unk_logp", F.lit(uniform)).alias("_lp"),
        )
        .groupBy("_id")
        .agg(
            F.count("*").alias(count_col),
            F.round(-F.avg("_lp"), 6).alias(score_col),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(scored.withColumnRenamed("_id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(count_col, F.lit(0)).alias(count_col),
            score_col,
        )
    )
