"""Phase profile of the bench headline queries (guide §1: measure first).

For each headline query, splits the bench's per-run wall time into:
  * build  — Python DataFrame construction (fn(spark, sf_dir))
  * plan   — analysis + optimization + physical planning of the forced
             (xxhash64-reduced) query, triggered via executedPlan()
  * exec   — first collect() on the planned query (AQE re-planning + run)
  * exec2  — collect() again on the SAME DataFrame (planning cached, so
             the delta exec-exec2 ≈ per-run planning that the bench pays
             because it rebuilds the DataFrame every run)

Prints one line per query and a JSON blob at the end. Run on an idle box.
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
    spark = build_session("profile_phases")
    # same warmup as bench.py's synthetic part
    spark.range(10_000_000).selectExpr("sum(id)").collect()

    out: dict[str, dict[str, float]] = {}
    for name in names:
        fn = qs[name]
        rec: dict[str, float] = {}
        # warm one full pass first so JIT/codegen/page-cache state matches
        # the bench's best-of-N regime
        df = fn(spark, sf_dir)
        df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h")).collect()

        t0 = time.time()
        df = fn(spark, sf_dir)
        rec["build"] = time.time() - t0

        t0 = time.time()
        forced = df.select(F.xxhash64(*df.columns).alias("h")).agg(F.bit_xor("h"))
        forced._jdf.queryExecution().executedPlan()
        rec["plan"] = time.time() - t0

        t0 = time.time()
        forced.collect()
        rec["exec"] = time.time() - t0

        t0 = time.time()
        forced.collect()
        rec["exec2"] = time.time() - t0

        total = sum(rec.values()) - rec["exec2"]
        print(
            f"{name:24s} build={rec['build']:.3f} plan={rec['plan']:.3f} "
            f"exec={rec['exec']:.3f} exec2={rec['exec2']:.3f} total={total:.3f}"
        )
        out[name] = {k: round(v, 3) for k, v in rec.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
