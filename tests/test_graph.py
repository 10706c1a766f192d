"""Link-graph centrality: integer-exact PageRank vs a pure-Python
reference, float-tier agreement, dangling-mass convention, and the
corpus quality-prior join."""

from __future__ import annotations

import pytest


def _py_pagerank_int(edges, n_iter, damping_pct=85, scale=10**9):
    """Dict-based reference of operators/graph.pagerank_integer."""
    nodes = sorted({x for e in edges for x in e})
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    base = (100 - damping_pct) * scale // 100
    rank = {v: scale for v in nodes}
    for _ in range(n_iter):
        nxt = {v: base for v in nodes}
        for s, d in edges:
            nxt[d] += rank[s] * damping_pct // (100 * out[s])
        rank = nxt
    return rank


EDGES = [
    (0, 1), (0, 2), (1, 2), (2, 0), (3, 2), (3, 0), (4, 2),
    (5, 4), (5, 3), (6, 6),  # 6 is a self-loop island
]  # node 7 appears only as a dst -> dangling
EDGES.append((2, 7))


def _edges_df(spark):
    return spark.createDataFrame(EDGES, "src long, dst long")


def test_pagerank_integer_matches_python_reference(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.graph import (
        pagerank_integer,
    )

    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(_edges_df(spark), n_iter=5).collect()
    }
    assert got == _py_pagerank_int(EDGES, n_iter=5)
    # dangling node 7 receives but never redistributes: total mass of
    # the system decays below the initial n*scale
    assert sum(got.values()) < len(got) * 10**9
    # every node keeps at least the teleport base
    assert min(got.values()) >= 15 * 10**7


def test_pagerank_float_tracks_integer_tier(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.graph import (
        pagerank,
        pagerank_integer,
    )

    fl = {r["node"]: r["rank"] for r in pagerank(_edges_df(spark), n_iter=4).collect()}
    it = {
        r["node"]: r["rank"] / 10**9
        for r in pagerank_integer(_edges_df(spark), n_iter=4).collect()
    }
    assert set(fl) == set(it)
    for v in fl:
        assert fl[v] == pytest.approx(it[v], abs=1e-6)


def test_pagerank_integer_overflow_guard(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.graph import (
        pagerank_integer,
    )

    with pytest.raises(ValueError, match="overflow"):
        pagerank_integer(_edges_df(spark), n_iter=1, scale=10**18)
    # seeded form: teleport mass enters at node∪seed, so a seed set
    # largely OUTSIDE the edge list must widen the guarded bound
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    cap = (1 << 62) // 100 // 10  # overflows at >=10 total nodes
    seeds = spark.range(100).withColumnRenamed("id", "node")
    with pytest.raises(ValueError, match="overflow"):
        pagerank_integer(edges, n_iter=1, scale=cap, seeds=seeds)
    # same scale is fine when the union stays small
    pagerank_integer(
        edges, n_iter=1, scale=cap,
        seeds=spark.createDataFrame([(0,)], "node long"),
    ).collect()


def test_quality_prior_from_links(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.graph import (
        quality_prior_from_links,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    out = quality_prior_from_links(docs, _edges_df(spark), n_iter=3)
    rows = {r["doc_id"]: r["link_prior"] for r in out.collect()}
    assert len(rows) == 10
    assert max(v for v in rows.values() if v is not None) == 1.0
    assert rows[8] is None and rows[9] is None  # not in the link graph
    # node 2 is the in-degree hub: top prior
    assert rows[2] == 1.0


@pytest.mark.slow
def test_pagerank_weighted_and_early_stop(spark):
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.graph import (
        pagerank,
    )

    # node 0 links 1 (weight 9) and 2 (weight 1): 1 must outrank 2
    e = spark.createDataFrame(
        [(0, 1, 9.0), (0, 2, 1.0), (1, 0, 1.0), (2, 0, 1.0)],
        "src long, dst long, w double",
    )
    r = {
        row["node"]: row["rank"]
        for row in pagerank(e, n_iter=6, weight_col="w").collect()
    }
    assert r[1] > r[2]
    # unweighted treats both out-edges equally
    ru = {
        row["node"]: row["rank"] for row in pagerank(e, n_iter=6).collect()
    }
    assert ru[1] == pytest.approx(ru[2])
    # tol early-stop converges to the same fixed point as many hops
    exact = {
        row["node"]: row["rank"] for row in pagerank(e, n_iter=60).collect()
    }
    early = {
        row["node"]: row["rank"]
        for row in pagerank(e, n_iter=60, tol=1e-9).collect()
    }
    for v in exact:
        assert early[v] == pytest.approx(exact[v], abs=1e-6)


@pytest.mark.slow
def test_trustrank_seeded_propagation(spark):
    """Seeded (personalized) integer PageRank == TrustRank: only seeds
    hold teleport mass, trust flows along out-links, and nodes
    unreachable from any seed rank exactly 0 — against the same
    dict-based sequential replay."""
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.graph import (
        pagerank_integer,
    )

    # 0 -> 1 -> 2; island 3 <-> 4 unreachable from the seed
    edges = [(0, 1), (1, 2), (3, 4), (4, 3)]
    seeds = spark.createDataFrame([(0,)], "node long")
    got = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            spark.createDataFrame(edges, "src long, dst long"),
            n_iter=4,
            seeds=seeds,
        ).collect()
    }
    # sequential replay with seed-only base/init
    scale, dp = 10**9, 85
    base = (100 - dp) * scale // 100
    out = {0: 1, 1: 1, 3: 1, 4: 1}
    rank = {v: (scale if v == 0 else 0) for v in range(5)}
    for _ in range(4):
        nxt = {v: (base if v == 0 else 0) for v in range(5)}
        for s, d in edges:
            nxt[d] += rank[s] * dp // (100 * out[s])
        rank = nxt
    assert got == rank
    assert got[3] == 0 and got[4] == 0  # unreachable island holds no trust
    assert got[0] == base  # the seed keeps exactly its teleport base
    assert got[1] > got[2] > 0  # trust decays with distance from the seed
    # a vetted seed ABSENT from the link graph still ranks at its
    # teleport base — it must never silently vanish from the output
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank_integer(
            spark.createDataFrame(edges, "src long, dst long"),
            n_iter=2,
            seeds=spark.createDataFrame([(0,), (99,)], "node long"),
        ).collect()
    }
    assert got2[99] == base
