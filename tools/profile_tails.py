"""Planning-vs-execution split for the two bench tails (round-6 verdict
ask #8): r1_transitive_closure and d_minhash_lsh.

Method: for every materializing action we first force
``queryExecution().executedPlan()`` (analysis -> optimization -> physical
planning, all driver-side JVM work) and time it, then time the action
itself (execution + AQE runtime re-planning). The planner computes each
QueryExecution's plan exactly once, so splitting at ``executedPlan`` is
honest — the action reuses the already-built plan.

* d_minhash_lsh builds ONE static plan: a single (plan, exec) pair, with
  the same xxhash64-forcing bench.py uses.
* r1_transitive_closure is a driver loop whose per-iteration materializing
  action is DataFrame.count — a temporary count wrapper records each
  iteration's (plan, exec) pair without changing what executes.

Run on an idle box:  python tools/profile_tails.py [sf_dir]
Prints ONE JSON line; results recorded in ROUND_NOTES.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed_plan_exec(df, action):
    """(plan_seconds, exec_seconds, result) for one materializing action."""
    t0 = time.time()
    df._jdf.queryExecution().executedPlan()
    t_plan = time.time() - t0
    t1 = time.time()
    result = action(df)
    return t_plan, time.time() - t1, result


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDataFrame

    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    spark = build_session("profile_tails")
    qs = all_queries()
    # warm the JVM the way bench.py does, minus the per-family extras —
    # profiling wants steady-state, not first-job classloading
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    for name in ("d_minhash_lsh", "r1_transitive_closure"):
        qs[name](spark, "/root/testdata/sf0.001").count()

    out: dict[str, dict] = {}

    # --- d_minhash_lsh: one static plan ------------------------------------
    df = qs["d_minhash_lsh"](spark, sf_dir)
    forced = df.select(F.xxhash64(*df.columns).alias("__h")).agg(F.bit_xor("__h"))
    t0 = time.time()
    plan_s, exec_s, _ = timed_plan_exec(forced, lambda d: d.collect())
    out["d_minhash_lsh"] = {
        "wall": round(time.time() - t0, 3),
        "plan_s": round(plan_s, 3),
        "exec_s": round(exec_s, 3),
    }

    # --- r1_transitive_closure: driver loop, one count per iteration -------
    # Two kinds of driver-side cost hide outside the counts: (a) per-count
    # planning (captured by timed_plan_exec), and (b) the LAZY
    # localCheckpoint calls — constructing a checkpoint DataFrame requires
    # the PHYSICAL plan + RDD DAG immediately even with eager=False, so the
    # loop's per-iteration plan/codegen cost lands at those call sites.
    steps: list[tuple[float, float]] = []
    checkpoint_walls: list[float] = []
    orig_count = ClassicDataFrame.count
    orig_ckpt = ClassicDataFrame.localCheckpoint

    def recording_count(self):
        p, e, n = timed_plan_exec(self, orig_count)
        steps.append((round(p, 3), round(e, 3)))
        return n

    def recording_ckpt(self, eager=True):
        t0 = time.time()
        res = orig_ckpt(self, eager=eager)
        checkpoint_walls.append(round(time.time() - t0, 3))
        return res

    ClassicDataFrame.count = recording_count
    ClassicDataFrame.localCheckpoint = recording_ckpt
    try:
        t0 = time.time()
        qs["r1_transitive_closure"](spark, sf_dir).count()
        wall = time.time() - t0
    finally:
        ClassicDataFrame.count = orig_count
        ClassicDataFrame.localCheckpoint = orig_ckpt
    plan_s = sum(p for p, _ in steps)
    exec_s = sum(e for _, e in steps)
    ckpt_s = sum(checkpoint_walls)
    out["r1_transitive_closure"] = {
        "wall": round(wall, 3),
        "count_actions": len(steps),
        "count_plan_s": round(plan_s, 3),
        "count_exec_s": round(exec_s, 3),
        "per_count": [list(s) for s in steps],
        "lazy_checkpoint_planning_s": round(ckpt_s, 3),
        "per_checkpoint": checkpoint_walls,
        "unattributed_s": round(wall - plan_s - exec_s - ckpt_s, 3),
    }
    print(json.dumps({"sf_dir": sf_dir, "load_avg": os.getloadavg()[0], **out}))


if __name__ == "__main__":
    main()
