"""Trained quality classifier for corpus filtering (model-based tier).

The heuristic tier (:mod:`.text` — ``quality_score``, Gopher flags)
encodes fixed thresholds; production pretraining pipelines add a
LEARNED filter on top: a small linear classifier trained on a labeled
seed (e.g. "reference-corpus pages vs random crawl" — the public
fastText-classifier recipe from the GPT-3 / LLaMA / CCNet papers),
then applied to the full corpus. This module is that tier on Spark ML:

- :func:`quality_features` projects each document to a small dense
  vector of the same signals the heuristic tier uses — all pure
  Catalyst expressions, computed in one scan pass, no Python;
- :func:`fit_quality_classifier` fits a seeded logistic regression on
  a LABELED SAMPLE (thousands of rows — the fit is a bounded job, the
  100 TB corpus is never iterated);
- :func:`score_quality` applies the model with one JVM
  ``model.transform`` pass — scoring scales like any narrow projection.

Classifier probabilities are floating-point model internals, not
SQL-expressible: correctness is pinned by pytest (separation on a
held-out synthetic set, determinism for a fixed seed), with the
oracle-checked heuristic twin ``t_quality_score`` as the baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import (
    repetition_ratio,
    stopword_ratio,
    token_count,
)

#: feature column names, in vector order (stored with the model for audit)
FEATURE_NAMES = (
    "f_n_tokens",
    "f_mean_word_len",
    "f_alpha_ratio",
    "f_digit_ratio",
    "f_punct_ratio",
    "f_upper_ratio",
    "f_stopword_ratio",
    "f_repetition_ratio",
)


def _safe_div(num: Column, den: Column) -> Column:
    return F.when(den > 0, num / den).otherwise(F.lit(0.0))


def quality_features(col: Column | str) -> list[Column]:
    """The per-document feature projections, each aliased to its
    :data:`FEATURE_NAMES` entry. One scan pass, pure Catalyst."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_tok = token_count(c).cast("double")
    return [
        F.log1p(n_tok).alias("f_n_tokens"),
        _safe_div(n_chars, n_tok).alias("f_mean_word_len"),
        _safe_div(
            F.length(F.regexp_replace(c, r"[^A-Za-z]", "")), n_chars
        ).alias("f_alpha_ratio"),
        _safe_div(
            F.length(F.regexp_replace(c, r"[^0-9]", "")), n_chars
        ).alias("f_digit_ratio"),
        _safe_div(
            F.length(F.regexp_replace(c, r"[^!-/:-@\[-`{-~]", "")), n_chars
        ).alias("f_punct_ratio"),
        _safe_div(
            F.length(F.regexp_replace(c, r"[^A-Z]", "")), n_chars
        ).alias("f_upper_ratio"),
        stopword_ratio(c).alias("f_stopword_ratio"),
        repetition_ratio(c).alias("f_repetition_ratio"),
    ]


def _featurize(df: DataFrame, text_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    feats = quality_features(text_col)
    return df.withColumn(
        "_features",
        array_to_vector(
            F.array(*[f.cast("double") for f in feats])
        ),
    )


def fit_quality_classifier(
    labeled: DataFrame,
    text_col: str,
    label_col: str,
    max_iter: int = 50,
    reg_param: float = 0.01,
):
    """Fit the logistic-regression quality model on a labeled seed
    (``label_col``: 1 = keep-quality, 0 = reject). The seed should be
    a bounded sample — the model has ``len(FEATURE_NAMES)`` weights
    and saturates at a few thousand examples; never feed it the full
    corpus. Deterministic (LBFGS on a fixed feature order)."""
    from pyspark.ml.classification import LogisticRegression

    fit_df = _featurize(labeled, text_col).withColumn(
        "_label", F.col(label_col).cast("double")
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        maxIter=max_iter,
        regParam=reg_param,
        standardization=True,
    )
    model = lr.fit(fit_df)
    # Detach the training summary: scoring serializes the model into
    # tasks, and the summary holds the fit DataFrame whose session
    # state (e.g. the ObservationManager once any df.observe ran in
    # the session) is not serializable. A save/load roundtrip yields
    # the same weights with hasSummary=False.
    import shutil
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    tmp = tempfile.mkdtemp(prefix="quality-model-")
    try:
        model.write().overwrite().save(tmp + "/m")
        return LogisticRegressionModel.load(tmp + "/m")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def score_quality(
    df: DataFrame, model, text_col: str, prob_col: str = "quality_prob"
) -> DataFrame:
    """Append ``prob_col`` = P(quality) to every document: featurize
    (one Catalyst projection) + one JVM ``model.transform`` pass.
    Filter downstream with ``F.col(prob_col) >= tau`` — pick tau on a
    validation sample for the recall/precision trade the corpus
    needs."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurize(df, text_col))
    return scored.withColumn(
        prob_col, F.round(vector_to_array("probability")[1], 6)
    ).drop("_features", "rawPrediction", "probability", "prediction")
