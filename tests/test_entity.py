"""Entity resolution: blocking, pairwise scoring, transitive
clustering, golden-record survivorship (operators/entity.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.entity import (
    er_candidate_pairs,
    golden_records,
    levenshtein_similarity,
    resolve_entities,
)


@pytest.fixture(scope="module")
def people(spark):
    # three real entities, each with typo/formatting variants, plus a
    # singleton; block on the last 4 chars (stable under the typos used)
    rows = [
        (1, "Acme Corporation", "NY", 100.0),
        (2, "Acme Corporatio",  "NY", 250.0),   # deletion typo of 1
        (3, "Acme Korporation", "CA", 50.0),    # substitution typo of 1
        (10, "Globex Ltd 0042", "TX", 10.0),
        (11, "Globex Ltd.0042", "TX", 20.0),    # punctuation variant of 10
        (20, "Initech", "WA", 5.0),             # singleton
    ]
    return spark.createDataFrame(rows, "id long, name string, state string, bal double")


def test_candidate_pairs_block_and_threshold(people):
    pairs = er_candidate_pairs(
        people, "id", "name", F.expr("right(name, 4)"), threshold=0.85
    ).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    # 1-2 ("tion"/"atio" differ in block) — blocked apart: NOT a pair
    # 1-3 share block "tion", lev 1/16 → 0.9375 ≥ 0.85
    # 10-11 share block "0042", lev 1/15 → 0.933…
    assert got == {(1, 3), (10, 11)}
    sims = {(r.id_a, r.id_b): r.similarity for r in pairs}
    assert sims[(1, 3)] == pytest.approx(1 - 1 / 16, abs=1e-6)


def test_multi_blocking_array_key_restores_recall(people):
    # multi-block on [right4, first 6 chars]: 1-2 now co-occur via prefix
    key = F.array(F.expr("right(name, 4)"), F.substring("name", 1, 6))
    got = {
        (r.id_a, r.id_b)
        for r in er_candidate_pairs(people, "id", "name", key, 0.85).collect()
    }
    assert (1, 2) in got and (1, 3) in got and (10, 11) in got
    # one row per pair even when records share several blocks
    pairs = er_candidate_pairs(people, "id", "name", key, 0.85)
    assert pairs.count() == pairs.select("id_a", "id_b").distinct().count()


def test_resolve_entities_transitive(people):
    # with multi-blocking, 2~1 and 1~3 ⇒ {1,2,3} one entity even though
    # 2 and 3 never share a block pair above threshold
    key = F.array(F.expr("right(name, 4)"), F.substring("name", 1, 6))
    resolved = resolve_entities(people, "id", "name", key, threshold=0.85)
    ents = {r.id: r.entity_id for r in resolved.collect()}
    assert ents[1] == ents[2] == ents[3] == 1
    assert ents[10] == ents[11] == 10
    assert ents[20] == 20  # singleton resolves to itself


def test_oversized_blocks_are_skipped_not_merged(spark):
    # constant block key = non-discriminative; the cap must SKIP the
    # block (no pairs at all), never collapse distinct entities
    df = spark.createDataFrame(
        [(i, f"Entity {i:03d}") for i in range(50)], "id long, name string"
    )
    capped = er_candidate_pairs(
        df, "id", "name", F.lit("all"), threshold=0.0, max_block_size=10
    )
    assert capped.count() == 0
    uncapped = er_candidate_pairs(df, "id", "name", F.lit("all"), threshold=0.0)
    assert uncapped.count() == 50 * 49 // 2


def test_custom_similarity_override(people):
    exact = lambda a, b: (a == b).cast("double")  # noqa: E731
    pairs = er_candidate_pairs(
        people, "id", "name", F.expr("right(name, 4)"), 0.5, similarity=exact
    )
    assert pairs.count() == 0  # no two names are byte-identical


def test_golden_records_rules(people):
    key = F.array(F.expr("right(name, 4)"), F.substring("name", 1, 6))
    resolved = resolve_entities(people, "id", "name", key, threshold=0.85)
    gold = golden_records(
        resolved,
        "entity_id",
        "id",
        {
            "name": ("name", "earliest"),
            "max_bal": ("bal", "max"),
            "state": ("state", "mode"),
        },
    )
    rows = {r.entity_id: r for r in gold.collect()}
    assert set(rows) == {1, 10, 20}
    g1 = rows[1]
    assert g1.n_members == 3
    assert g1.name == "Acme Corporation"  # min-id row's value
    assert g1.max_bal == 250.0
    assert g1.state == "NY"  # 2×NY vs 1×CA
    assert rows[20].n_members == 1 and rows[20].name == "Initech"


def test_golden_mode_tiebreak_is_min_value(spark):
    df = spark.createDataFrame(
        [(1, 1, "B"), (1, 2, "A"), (1, 3, None)], "e long, id long, s string"
    )
    gold = golden_records(df, "e", "id", {"s": ("s", "mode")})
    # A and B tie at one occurrence each; NULL never wins; min value wins
    assert gold.collect()[0].s == "A"


def test_similarity_matches_sql_levenshtein(spark):
    df = spark.createDataFrame([("kitten", "sitting")], "a string, b string")
    got = df.select(
        F.round(levenshtein_similarity(F.col("a"), F.col("b")), 6).alias("s")
    ).collect()[0].s
    assert got == pytest.approx(1 - 3 / 7, abs=1e-6)


def test_unknown_rule_raises(people):
    with pytest.raises(ValueError, match="survivorship"):
        golden_records(people, "state", "id", {"x": ("bal", "median")})
