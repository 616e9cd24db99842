"""Job/stage/task census per headline query (guide §1: measure first).

At sf0.1 the data is small enough that driver-side per-job and per-stage
overheads (AQE re-planning round trips, task scheduling) are a visible
fraction of each query's wall time. This tool runs each headline query once
(warm — a throwaway pass first) inside its own job group and reports how
many Spark jobs, stages and tasks the forced run submits. Counting is
deterministic and load-insensitive, unlike wall timings.

Usage: python tools/profile_jobs.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import functions as F

    from bench import HEADLINE
    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    names = sys.argv[1:] or HEADLINE
    qs = all_queries()
    spark = build_session("profile_jobs")
    sc = spark.sparkContext
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict[str, int]] = {}
    for name in names:
        fn = qs[name]

        def force() -> None:
            df = fn(spark, sf_dir)
            df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()

        force()  # warm pass: codegen + page cache, not counted
        group = f"census_{name}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        force()
        wall = time.time() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is None:
                    continue
                n_stages += 1
                n_tasks += sinfo.numTasks
        rec = {
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
            "wall_ms": int(wall * 1000),
        }
        print(
            f"{name:24s} jobs={rec['jobs']:3d} stages={rec['stages']:3d} "
            f"tasks={rec['tasks']:5d} wall={wall:.3f}s"
        )
        out[name] = rec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
