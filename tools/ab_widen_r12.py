"""Interleaved A/B for the r12 size-aware widen cap (verdict ask 2).

Runs the widen-affected headline queries under several
SPARK_GRAFT_WIDEN_BYTES_PER_PART settings in ONE process, alternating
variants run-for-run (the box-variance discipline from r11), forcing each
run with the bench's xxhash64+bit_xor fold. Prints per-(query, chunk)
medians and the fold checksum so variants are provably result-identical.

Usage: python tools/ab_widen_r12.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "d_minhash_capped",
    "d_minhash_lsh",
    "t_quality",
    "sim_cosine_topk",
    "q1_pricing_summary",
    "a2_hourly_mean",
]
# 0 = cap off (r11 behavior: target = defaultParallelism)
CHUNKS = [0, 16 << 10, 64 << 10, 256 << 10]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    spark = build_session("ab_widen_r12")
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    qs = all_queries()

    def run(name: str, chunk: int) -> tuple[float, int]:
        if chunk > 0:
            os.environ["SPARK_GRAFT_WIDEN_BYTES_PER_PART"] = str(chunk)
        else:
            os.environ["SPARK_GRAFT_WIDEN_BYTES_PER_PART"] = "0"
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        cols = ", ".join(f"`{c.replace('`', '``')}`" for c in df.columns)
        h = (
            df.selectExpr(f"xxhash64({cols}) AS __h")
            .agg(F.expr("bit_xor(__h)"))
            .collect()[0][0]
        )
        return time.time() - t0, h

    results: dict[tuple[str, int], list[float]] = {}
    checks: dict[tuple[str, int], int] = {}
    # warmup pass (uncounted)
    for name in QUERIES:
        run(name, 0)
    for r in range(rounds):
        order = CHUNKS if r % 2 == 0 else list(reversed(CHUNKS))
        for name in QUERIES:
            for chunk in order:
                dt, h = run(name, chunk)
                results.setdefault((name, chunk), []).append(dt)
                prev = checks.setdefault((name, chunk), h)
                assert prev == h, f"nondeterministic fold for {name}"
    base_check: dict[str, int] = {}
    for name in QUERIES:
        hs = {checks[(name, c)] for c in CHUNKS}
        base_check[name] = len(hs)
        print(f"== {name}  (distinct checksums across variants: {len(hs)})")
        for chunk in CHUNKS:
            ts = results[(name, chunk)]
            label = "off(par)" if chunk == 0 else f"{chunk >> 10}K"
            print(
                f"   chunk={label:>9}  median={statistics.median(ts):.3f}s"
                f"  runs={[round(t, 3) for t in ts]}"
            )
    bad = {n: k for n, k in base_check.items() if k != 1}
    print("ALL_VARIANTS_IDENTICAL" if not bad else f"CHECKSUM_MISMATCH: {bad}")
    spark.stop()


if __name__ == "__main__":
    main()
