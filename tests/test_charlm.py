"""Char n-gram LM perplexity-proxy scoring (functions/charlm.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.functions.charlm import (
    score_char_lm,
    train_char_lm,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import load

    return load(spark, SF, "documents")


def test_hand_computed_bigram_model(spark):
    # corpus "abab": bigrams (a->b)x2, (b->a)x1; vocab {a, b} -> V=2
    df = spark.createDataFrame([(1, "abab")], "doc_id long, text string")
    lm = train_char_lm(df, n=2, add_k=0.5)
    assert lm.vocab_size == 2
    probs = {(r.ctx, r.ch): r.logp for r in lm.ngrams.collect()}
    assert probs[("a", "b")] == pytest.approx(math.log((2 + 0.5) / (2 + 1.0)))
    assert probs[("b", "a")] == pytest.approx(math.log((1 + 0.5) / (1 + 1.0)))
    out = score_char_lm(df, lm, score_col="nll").collect()[0]
    want = -(2 * math.log(2.5 / 3.0) + math.log(1.5 / 2.0)) / 3
    assert out.n_grams == 3
    assert out.nll == pytest.approx(want, abs=1e-6)


def test_unseen_gram_and_context_fallbacks(spark):
    train = spark.createDataFrame([(1, "aaab")], "doc_id long, text string")
    lm = train_char_lm(train, n=2, add_k=0.5)  # V = {a, b} = 2
    test = spark.createDataFrame(
        [(1, "ab"), (2, "ac"), (3, "zz")], "doc_id long, text string"
    )
    got = {r.doc_id: r.nll for r in score_char_lm(test, lm).collect()}
    # seen gram a->b: (1+.5)/(3+1)
    assert got[1] == pytest.approx(-math.log(1.5 / 4.0), abs=1e-6)
    # seen ctx 'a', unseen char 'c': k/(tot + kV) = .5/4
    assert got[2] == pytest.approx(-math.log(0.5 / 4.0), abs=1e-6)
    # unseen ctx 'z': uniform 1/V
    assert got[3] == pytest.approx(math.log(2.0), abs=1e-6)
    # ordering: seen < unseen-char < unseen-context is NOT guaranteed in
    # general, but the smoothed masses here are strictly ordered
    assert got[1] < got[2]


def test_short_docs_score_null_with_zero_grams(spark):
    df = spark.createDataFrame(
        [(1, "xy"), (2, ""), (3, "xyz")], "doc_id long, text string"
    )
    lm = train_char_lm(df, n=3)
    rows = {r.doc_id: r for r in score_char_lm(df, lm).collect()}
    assert rows[1].n_grams == 0 and rows[1].nll is None
    assert rows[2].n_grams == 0 and rows[2].nll is None
    assert rows[3].n_grams == 1 and rows[3].nll is not None


def test_in_distribution_text_beats_character_scramble(docs):
    # the fixture corpus is synthetic word-salad, so "natural" means
    # in-distribution: corpus words must clearly out-score the same
    # characters scrambled (which destroys the trigram structure)
    lm = train_char_lm(docs, "text", n=3)
    spark = docs.sparkSession
    in_dist = "spark window merge sort table scan batch stream join order"
    scramble = "".join(
        in_dist[i] for i in sorted(range(len(in_dist)), key=lambda i: (i * 37) % 59)
    )
    probe = spark.createDataFrame(
        [(1, in_dist), (2, scramble)], "doc_id long, text string"
    )
    got = {r.doc_id: r.nll for r in score_char_lm(probe, lm).collect()}
    assert got[1] < got[2] - 0.5


def test_train_rejects_degenerate_n(spark):
    df = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="n must be >= 2"):
        train_char_lm(df, n=1)


def test_scoring_plan_stays_jvm_side(docs):
    lm = train_char_lm(docs, "text", n=3)
    plan = score_char_lm(docs, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "BroadcastHashJoin" in plan
