"""Evidence dump for the connected-components round fusion (r17 change
#3, re-evidenced per the r17 verdict): the committed
``plans/r17/d_cc_dedup_{before,after}.txt`` dumps only show the FINAL
join over the checkpointed labels — the per-round fusion (round 1
folded into init, change detection folded into the propagation agg) is
invisible there. This tool records what a final-plan dump cannot:

1. ``d_cc_dedup_job_trace.txt`` — the statusTracker job trace of one
   full ``d_cc_dedup`` registry-query execution (job count + stages per
   job), the load-independent count the 31→24 claim is about.
2. ``d_cc_dedup_round_plan.txt`` — ``explain("formatted")`` of the
   LIVE propagation-round DataFrame (the ``upd`` handle captured at its
   lazy materialization, BEFORE the convergence count collapses it to
   an ExistingRDD): one union of the self-tagged labels with the
   edge⋈labels join feeding ONE HashAggregate computing both
   ``min(comp)`` and the fused ``min(when(_mine, comp))`` change
   detector — no separate join back to the previous labels, and the
   edge side reads the blocks pre-partitioned on the join key.

Usage: python tools/dump_cc_plan_evidence.py [sf_dir] [out_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r18")
    )
    os.makedirs(out_dir, exist_ok=True)

    import __spark_entry__ as ent
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.operators import dedup
    from rds_to_snowflake_etl_a_lakehouse_pipeline_spark.session import get_spark

    spark = get_spark("cc-plan-evidence")
    sc = spark.sparkContext
    qs = ent.queries()

    # 1. job trace of a full run (warm the session first so one-time
    # warmup jobs don't inflate the trace)
    spark.range(10).count()
    sc.setJobGroup("cc_trace", "d_cc_dedup full run")
    qs["d_cc_dedup"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    sc.setJobGroup(None, None)
    tracker = sc.statusTracker()
    job_ids = sorted(tracker.getJobIdsForGroup("cc_trace"))
    lines = [
        f"d_cc_dedup @ {sf_dir}: {len(job_ids)} jobs in one full run",
        "(job id: stage count — statusTracker trace, load-independent)",
    ]
    for j in job_ids:
        info = tracker.getJobInfo(j)
        n_stages = len(info.stageIds) if info else -1
        lines.append(f"job {j}: {n_stages} stages")
    with open(os.path.join(out_dir, "d_cc_dedup_job_trace.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))

    # 2. one propagation round's LIVE plan: capture the `upd` DataFrame
    # at its lazy materialization inside connected_components by
    # wrapping dedup._materialize. Calls on the label path:
    #   #1 the edge list (eager=True default), #2 the fused init
    #   (eager=False), #3+ one per propagation round (eager=False).
    captured = []
    orig = dedup._materialize

    def capture(df, storage, eager=True):
        captured.append(df)
        return orig(df, storage, eager=eager)

    dedup._materialize = capture
    try:
        qs["d_cc_dedup"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    finally:
        dedup._materialize = orig
    # the first round-plan (call #3, index 2) — captured lazily, so its
    # analyzed plan still shows the full round body
    upd = captured[2]
    plan = upd._jdf.queryExecution().explainString("formatted")
    hdr = (
        "# d_cc_dedup: ONE propagation round (the `upd` DataFrame at its\n"
        "# lazy materialization — plan BEFORE the convergence count\n"
        "# collapses it to checkpointed blocks). Fusion evidence:\n"
        "# - a single HashAggregate computes min(comp) AND the change\n"
        "#   detector min(CASE WHEN _mine THEN comp END) — no join back\n"
        "#   to the previous labels;\n"
        "# - the union's left leg is the labels' checkpoint scan, the\n"
        "#   right leg joins the PRE-PARTITIONED edge checkpoint (no\n"
        "#   re-exchange of the static side at its partitioning key).\n\n"
    )
    with open(os.path.join(out_dir, "d_cc_dedup_round_plan.txt"), "w") as f:
        f.write(hdr + plan + "\n")
    print(f"round plan captured ({len(captured)} materializations total)")
    spark.stop()


if __name__ == "__main__":
    main()
