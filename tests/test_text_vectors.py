"""Text-analysis and vector functions."""

from __future__ import annotations

import math

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark import functions as lf


def test_token_count_edges(spark):
    df = spark.createDataFrame(
        [("a b c",), ("  a   b  ",), ("",), ("   ",), (None,)], ["text"]
    )
    out = df.select(lf.token_count("text").alias("n")).collect()
    assert [r["n"] for r in out] == [3, 2, 0, 0, None]


def test_language_id_markers(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is here",),
            ("der hund und das ist gut",),
            ("xyzzy qwerty",),
        ],
        ["text"],
    )
    out = df.select(lf.language_id("text").alias("lang")).collect()
    assert [r["lang"] for r in out] == ["en", "de", "und"]


def test_quality_score_bounds(spark):
    df = spark.createDataFrame([("Pure words only here",), ("",), (None,)], ["text"])
    out = df.select(lf.quality_score("text").alias("q")).collect()
    assert 0.0 <= out[0]["q"] <= 1.0
    assert out[1]["q"] == 0.0
    assert out[2]["q"] == 0.0


def test_doc_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], ["text"]
    )
    fps = [r["fp"] for r in df.select(lf.doc_fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]


def test_vector_math_known_values(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 0.0, 1.0])], "a array<float>, b array<float>"
    )
    row = df.select(
        lf.dot_product("a", "b").alias("dot"),
        lf.l2_norm("a").alias("na"),
        lf.cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row["dot"] == 4.0
    assert row["na"] == 3.0
    assert math.isclose(row["cos"], 4.0 / (3.0 * math.sqrt(5.0)), rel_tol=1e-12)


def test_cosine_zero_vector_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 1.0])], "a array<float>, b array<float>"
    )
    assert df.select(lf.cosine_similarity("a", "b").alias("c")).first()["c"] is None
