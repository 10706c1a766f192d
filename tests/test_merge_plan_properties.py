"""Property tests for the cold-cell merge's driver-side plan
arithmetic — the closed-form swap-remove renumbering
(``_merge_renumber_plan``) and the post-merge matrix construction
(``_merged_matrix``). These are the pieces a crashed merge REPLAYS
verbatim from its manifest, so their correctness must hold for every
cold/survivor shape, not just the fixtures the Spark tests build —
hypothesis drives them against a step-by-step sequential swap-remove
simulation (the definitionally-correct reference the closed form
claims to equal). Pure python: no SparkSession, runs in milliseconds.

Reference parity: the reference repo ships no ANN index maintenance
(its pipeline is Glue DataFrame chains); this pins engine-native
machinery (SURVEY.md §2 extension tier, ivf_merge_cold_cells).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators.similarity import (
    _merge_renumber_plan,
    _merged_matrix,
)


@st.composite
def merge_shapes(draw):
    """(k, cold, survivors): 2..64 cells, at least one cold, at least
    one survivor — the exact domain ivf_merge_cold_cells guarantees
    before planning (it raises on all-cold and no-ops on no-cold)."""
    k = draw(st.integers(min_value=2, max_value=64))
    cold = draw(
        st.sets(st.integers(min_value=0, max_value=k - 1), min_size=1, max_size=k - 1)
    )
    survivors = [c for c in range(k) if c not in cold]
    return k, sorted(cold), survivors


def _sequential_swap_remove(k, cold, survivors):
    """The definitionally-correct reference: repeatedly fill the lowest
    hole with the contents of the highest live slot, one move at a
    time, until the live slots are dense 0..S-1. Returns (moves,
    final_slot_contents) where slot contents start as their own id."""
    slots = {c: c for c in survivors}  # slot id -> original cell id
    moves = []
    while True:
        live = sorted(slots)
        holes = sorted(set(range(len(slots))) - set(live))
        if not holes:
            return moves, [slots[i] for i in range(len(slots))]
        h, m = holes[0], max(live)
        moves.append((h, m))
        slots[h] = slots.pop(m)


@settings(max_examples=300, deadline=None)
@given(merge_shapes())
def test_renumber_plan_equals_sequential_swap_remove(shape):
    k, cold, survivors = shape
    moves = _merge_renumber_plan(cold, survivors)
    ref_moves, _ = _sequential_swap_remove(k, cold, survivors)
    assert moves == ref_moves


@settings(max_examples=300, deadline=None)
@given(merge_shapes())
def test_renumber_plan_invariants(shape):
    """The properties the batched one-job application depends on:
    every hole written is below S, every source read is >= S (write
    and read slot sets disjoint — what makes batch == sequential),
    each slot appears at most once, and applying the plan leaves the
    live ids exactly dense 0..S-1."""
    k, cold, survivors = shape
    S = len(survivors)
    moves = _merge_renumber_plan(cold, survivors)
    holes_written = [h for h, _ in moves]
    sources_read = [m for _, m in moves]
    assert all(h < S for h in holes_written)
    assert all(m >= S for m in sources_read)
    assert len(set(holes_written)) == len(holes_written)
    assert len(set(sources_read)) == len(sources_read)
    assert not (set(holes_written) & set(sources_read))
    # apply: survivors' slots, minus vacated sources, plus filled holes
    live = (set(survivors) - set(sources_read)) | set(holes_written)
    assert live == set(range(S))
    # and every move is genuinely needed: a hole below S only exists
    # because some survivor sits at or above S
    assert len(moves) == len([c for c in cold if c < S])


@settings(max_examples=300, deadline=None)
@given(merge_shapes())
def test_merged_matrix_matches_simulation(shape):
    """_merged_matrix (what the manifest's post_fp is computed from,
    and what the finalize records as the rotated contract) must equal
    the sequential simulation's final slot contents — centroid i of
    the merged matrix is the ORIGINAL centroid of whichever cell ended
    up in slot i."""
    k, cold, survivors = shape
    centroids = [[float(i), float(i * 2 + 1)] for i in range(k)]
    moves = _merge_renumber_plan(cold, survivors)
    got = _merged_matrix(centroids, moves, survivors)
    _, final_slots = _sequential_swap_remove(k, cold, survivors)
    assert got == [centroids[orig] for orig in final_slots]
    assert len(got) == len(survivors)
