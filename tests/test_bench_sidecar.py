"""bench.py's durable-recording helpers (no Spark session needed).

The driver's ``BENCH_r{N}.json`` captures only a ~2000-char stdout
tail, which the payload outgrew in round 12 (``parsed: null`` since) —
so bench.py persists its own sidecar and the next run's regression
baseline is whichever is newer of the newest PARSEABLE driver record
and the sidecar entry for the same SF (BASELINE.md "Bench noise
contract" §4). These tests exercise that resolution order plus the
round-number inference, by pointing the helpers at a temp dir.
"""
from __future__ import annotations

import json
import os

import pytest


@pytest.fixture
def helpers(tmp_path):
    """Exec the pure helper block of bench.py against tmp_path (the
    module itself imports pyspark + the entry registry at import time,
    which these tests don't need)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "bench.py")).read()
    block = src[src.index("_SIDECAR = ") : src.index("def _calibration")]
    block = block.replace(
        "os.path.dirname(os.path.abspath(__file__))", repr(str(tmp_path))
    )
    ns: dict = {}
    exec("import json, os, re\n" + block, ns)
    return ns, tmp_path


def _driver_record(tmp_path, n, parsed):
    with open(tmp_path / f"BENCH_r{n:02d}.json", "w") as f:
        json.dump({"parsed": parsed}, f)


def test_round_one_is_empty(helpers):
    ns, _ = helpers
    assert ns["_current_round"]() == 1
    assert ns["_previous_round_queries"]("sf0.1") == ({}, None)


def test_parseable_driver_record_is_baseline(helpers):
    ns, tmp = helpers
    _driver_record(tmp, 3, {"queries": {"q1": 1.0}, "calibration": {"sec": 0.5}})
    assert ns["_current_round"]() == 4
    assert ns["_previous_round_queries"]("sf0.1") == ({"q1": 1.0}, 0.5)


def test_same_round_sidecar_beats_driver_record(helpers):
    """A local sf0.1 run earlier in the same round is fresher than the
    prior round's driver record (>= comparison)."""
    ns, tmp = helpers
    _driver_record(tmp, 3, {"queries": {"q1": 1.0}, "calibration": {"sec": 0.5}})
    ns["_write_sidecar"](
        "sf0.1", {"queries": {"q1": 2.0}, "calibration": {"sec": 0.7}}, 3
    )
    assert ns["_previous_round_queries"]("sf0.1") == ({"q1": 2.0}, 0.7)


def test_newer_driver_record_beats_stale_sidecar(helpers):
    ns, tmp = helpers
    ns["_write_sidecar"](
        "sf0.1", {"queries": {"q1": 2.0}, "calibration": {"sec": 0.7}}, 3
    )
    _driver_record(tmp, 5, {"queries": {"q1": 3.0}, "calibration": {"sec": 0.9}})
    assert ns["_previous_round_queries"]("sf0.1") == ({"q1": 3.0}, 0.9)


def test_truncated_driver_record_falls_through_to_sidecar(helpers):
    """The actual round-12/13 failure mode: the newest driver record
    has ``parsed: null`` (tail overflow) — the sidecar written in that
    round must be found, not round N-2's stale parseable record."""
    ns, tmp = helpers
    _driver_record(tmp, 5, {"queries": {"q1": 3.0}, "calibration": {"sec": 0.9}})
    _driver_record(tmp, 6, None)
    ns["_write_sidecar"](
        "sf0.1", {"queries": {"q1": 4.0}, "calibration": {"sec": 1.1}}, 6
    )
    assert ns["_previous_round_queries"]("sf0.1") == ({"q1": 4.0}, 1.1)


def test_sf_keys_are_isolated(helpers):
    """An sf0.01 iteration run must never become the sf0.1 baseline."""
    ns, tmp = helpers
    _driver_record(tmp, 5, {"queries": {"q1": 3.0}, "calibration": {"sec": 0.9}})
    ns["_write_sidecar"](
        "sf0.01", {"queries": {"q1": 0.1}, "calibration": {"sec": 0.2}}, 6
    )
    assert ns["_previous_round_queries"]("sf0.1") == ({"q1": 3.0}, 0.9)
    assert ns["_previous_round_queries"]("sf0.01") == ({"q1": 0.1}, 0.2)


def test_corrupt_sidecar_is_ignored(helpers):
    ns, tmp = helpers
    _driver_record(tmp, 5, {"queries": {"q1": 3.0}, "calibration": {"sec": 0.9}})
    (tmp / "bench_sidecar.json").write_text("{not json")
    assert ns["_previous_round_queries"]("sf0.1") == ({"q1": 3.0}, 0.9)


def test_sidecar_write_is_atomic_and_merging(helpers):
    ns, tmp = helpers
    ns["_write_sidecar"]("sf0.1", {"queries": {"q1": 1.0}}, 2)
    ns["_write_sidecar"]("sf0.01", {"queries": {"q1": 0.1}}, 2)
    side = json.loads((tmp / "bench_sidecar.json").read_text())
    assert set(side) == {"sf0.1", "sf0.01"}
    assert side["sf0.1"]["round"] == 2
    assert not os.path.exists(tmp / "bench_sidecar.json.tmp")


def test_previous_suspects_reads_new_format(helpers):
    ns, _ = helpers
    ns["_write_sidecar"](
        "sf0.1", {"queries": {"q1": 1.0}, "suspects": ["q14", "q15"]}, 3
    )
    assert ns["_previous_suspects"]("sf0.1") == {"q14", "q15"}


def test_previous_suspects_falls_back_to_old_regressions(helpers):
    """A sidecar written before the suspects field existed recorded its
    over-gate queries under regressions — those were that run's
    suspects, so the persistence rule still sees them."""
    ns, _ = helpers
    ns["_write_sidecar"](
        "sf0.1",
        {"queries": {"q1": 1.0},
         "regressions": {"q14": {"prev": 3.6, "now": 5.2, "ratio": 1.44}}},
        3,
    )
    assert ns["_previous_suspects"]("sf0.1") == {"q14"}


def test_previous_suspects_empty_without_sidecar(helpers):
    ns, _ = helpers
    assert ns["_previous_suspects"]("sf0.1") == set()
    ns["_write_sidecar"]("sf0.01", {"queries": {}, "suspects": ["q9"]}, 3)
    # sf keys stay isolated
    assert ns["_previous_suspects"]("sf0.1") == set()


def _bench_query_names():
    """The CURRENT headline query set, scraped from bench.py's targets
    dict — the budget test must track growth automatically."""
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = open(os.path.join(repo, "bench.py")).read()
    names = re.findall(r'"(q\d+[a-z0-9_]*)":', src)
    assert len(names) >= 30, names  # sanity: the scrape found the dict
    return sorted(set(names))


def test_compact_line_budget_with_headroom(helpers):
    """Round 17 (VERDICT r16 backlog #3): the compact last line must
    stay under the driver's ~2000-char stdout tail FOREVER. Two-part
    contract: (a) the CURRENT query set at worst-case float width
    renders the FULL form with ≥ 400 chars of slack (~12 more typical
    query names before any degradation), and (b) ten extra queries on
    top of that still keep per-query timings in the line — growth
    degrades the line gracefully (see the ladder test) instead of
    overflowing the tail, which was round 12's parsed=null failure."""
    ns, _ = helpers
    names = _bench_query_names()
    worst = {n: 99999.99 for n in names}
    line = ns["compact_line"](
        "headline query wall-clock, local[32]",
        9999999.999,
        worst,
        0.1,
        [],
        [],
        {"sec": 99.999, "drift": 1.234},
    )
    doc = json.loads(line)
    assert len(line) <= ns["_COMPACT_BUDGET"] - 400 <= 1550
    assert doc["queries"] == worst  # full form fit
    assert doc["regressions"] == [] and doc["suspects"] == []

    plus10 = dict(worst, **{
        f"q{50 + i}_next_rounds_steady_state_{i:02d}": 99999.99
        for i in range(10)
    })
    line = ns["compact_line"](
        "headline query wall-clock, local[32]",
        9999999.999, plus10, 0.1, [], [],
        {"sec": 99.999, "drift": 1.234},
    )
    doc = json.loads(line)
    assert len(line) <= ns["_COMPACT_BUDGET"]
    assert len(doc["queries"]) == len(plus10)  # timings still present


def test_compact_line_degrades_to_valid_json(helpers):
    """A pathological run (every query in both regressions and
    suspects, or an absurd query count) degrades the line — name lists
    to counts, then timings to counts — but NEVER past valid JSON with
    the driver-contract minimum (metric/value/unit/sf)."""
    ns, _ = helpers
    names = _bench_query_names()
    timings = {n: 99999.99 for n in names}
    # every query regressed AND suspect: the only O(n)-growable lists
    line = ns["compact_line"](
        "headline query wall-clock, local[32]",
        9999999.999, timings, 0.1, list(names), list(names),
        {"sec": 99.999, "drift": 1.234},
    )
    doc = json.loads(line)
    assert len(line) <= ns["_COMPACT_BUDGET"]
    if "regressions" not in doc:  # degraded: counts survive
        assert doc["n_regressions"] == len(names)
    # absurd growth: 400 queries still yields a valid in-budget line
    big = {f"q{i}_very_long_synthetic_query_name_{i:03d}": 12345.67
           for i in range(400)}
    line = ns["compact_line"](
        "headline query wall-clock, local[32]", 1.0, big, 0.1,
        list(big), list(big), {"sec": 1.0, "drift": 1.0},
    )
    doc = json.loads(line)
    assert len(line) <= ns["_COMPACT_BUDGET"]
    for k in ("metric", "value", "unit", "sf"):
        assert k in doc
    assert doc["n_queries"] == 400
