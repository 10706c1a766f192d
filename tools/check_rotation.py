#!/usr/bin/env python
"""Front-50 rotation staleness gate.

The driver's correctness harness verifies only the FIRST 50 entries of
``__spark_entry__.queries()`` each round, so the registration order IS
the rotation schedule. This check simulates the next driver round under
the current ordering and fails when any registered entry's newest
driver verdict would exceed the staleness budget — the failure mode
that actually happened in round 11, when the front-50 did not rotate
and 50 entries' newest verdict aged to r06 (one to r03).

Usage::

    python tools/check_rotation.py [--budget N]

* Reads every ``CORRECTNESS_r*.json`` in the repo root for the newest
  driver verdict per query key.
* Entries never driver-checked are NEW: their grace anchor is the
  round at which the checker FIRST SAW them, persisted in
  ``tools/rotation_first_seen.json`` — anchoring to "the latest round"
  on every run would renew the grace forever and a forgotten new
  entry would never trip the gate.
* Projects the NEXT round = max seen round + 1, grants its verdict to
  the current first-50 keys, and requires every registry entry's
  projected newest verdict (or first-seen anchor) to be within
  ``--budget`` rounds (default 6) of the next round.

Margin note: the budget-6 relaxation (round 13) left ZERO margin —
the six r08-verified entries deferred out of the r13 window project
exactly at the floor (r08 >= r08), so round 14's window MUST front
them (it does — see the ``queries()`` docstring schedule); any further
deferral fails this gate.
* Exits 0 with a summary line on success; exits 1 listing the
  over-budget keys (oldest first) otherwise.

Run it after any ``queries()`` reorder and in the round's wrap-up —
it is cheap (no Spark session; imports the registry module only).
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_verdicts(repo: str) -> tuple[dict[str, int], int]:
    newest: dict[str, int] = {}
    latest = 0
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(f)).group(1))
        latest = max(latest, rnd)
        for k in json.load(open(f)):
            newest[k] = max(newest.get(k, 0), rnd)
    return newest, latest


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument(
        "--budget",
        type=int,
        default=6,
        help="max rounds any entry's newest driver verdict may trail "
        "the projected next round. Default 6 = ceil(N/50) + 1 for the "
        "current ~210-entry registry: a full re-verification cycle "
        "through the 50-slot window takes ceil(N/50) rounds at best, "
        "and one extra round absorbs the slots each round spends on "
        "newly added entries (see the queries() docstring rotation "
        "arithmetic). A tighter budget than the cycle length fails "
        "spuriously no matter how the registry is ordered.",
    )
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    import __spark_entry__ as ent  # noqa: E402

    keys = list(ent.queries().keys())
    newest, latest = newest_verdicts(REPO)
    next_round = latest + 1
    # an entry absent from every CORRECTNESS file is NEW, not stale —
    # but its grace must be anchored to the round it FIRST appeared
    # (persisted), not re-anchored to `latest` each run, or the grace
    # renews forever and a never-fronted entry never trips the gate
    seen_path = os.path.join(REPO, "tools", "rotation_first_seen.json")
    try:
        first_seen = json.load(open(seen_path))
    except (OSError, json.JSONDecodeError):
        first_seen = {}
    changed = False
    for k in keys:
        if k not in newest and k not in first_seen:
            first_seen[k] = latest
            changed = True
    if changed:
        json.dump(first_seen, open(seen_path, "w"), indent=0, sort_keys=True)
    projected = {
        k: max(
            newest.get(k, first_seen.get(k, latest)),
            next_round if i < 50 else 0,
        )
        for i, k in enumerate(keys)
    }
    floor = next_round - args.budget
    over = sorted(
        ((v, k) for k, v in projected.items() if v < floor),
    )
    # never-verified entries anchor to first_seen (NOT `latest`, which
    # would count them as fresh and understate the at-risk refresh)
    fronted = sum(
        1
        for k in keys[:50]
        if newest.get(k, first_seen.get(k, latest)) < floor
    )
    if over:
        print(
            f"FAIL: {len(over)} of {len(keys)} entries would exceed the "
            f"staleness budget after round r{next_round:02d} "
            f"(newest verdict < r{floor:02d}):"
        )
        for v, k in over:
            print(f"  r{v:02d}  {k}")
        print(
            "Reorder queries() so the oldest-verdict entries lead the "
            "front-50 (see the queries() docstring rotation plan)."
        )
        return 1
    worst = min(projected.values())
    print(
        f"OK: {len(keys)} entries; projected r{next_round:02d} front-50 "
        f"refreshes {fronted} at-risk entries; worst projected newest "
        f"verdict r{worst:02d} >= floor r{floor:02d} (budget "
        f"{args.budget})."
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
