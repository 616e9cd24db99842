"""Spark-side self-consistency gate for r3_pagerank at the billion-edge
rung — no DuckDB (the recursive oracle takes hours past ~1e8 edges, which
is why SWEEP_1000x excluded r3; this closes that last 100×-only operator).

The key-shifted scaled dirs (tools/make_scaled_sf.py) replicate every
entity with disjoint key spaces and NO cross-replica FK pairs, so the
customer↔supplier trade graph at N× is exactly N disjoint, node-shifted
copies of the base graph (custkey/suppkey shift by rep·10M ⇒ node ids
2k / 2k+1 shift by rep·20M). Integer fixed-point PageRank is therefore
EXACTLY replica-equivariant, which yields oracle-grade checks at any N
against the base ranks — and the base ranks themselves are the ones the
DuckDB oracle pins at the driver gate (same query construction via
queries.graph.trade_edges; iteration-3 state extracted from the same run
via pagerank(emit_prev=True)).

Checks (hard assertions, all computed distributed; only scalar aggregates
and the 16k-row base rank table ever reach the driver):

1. node-count conservation:    n_nodes(N×) == N · n_nodes(base)
2. exact rank-sum conservation: Σ r3(N×) == N · Σ r3(base)
                                Σ r4(N×) == N · Σ r4(base)
3. replica exactness:           r3/r4 of EVERY scaled node equals its
                                base twin's (broadcast join on
                                node % 20M; 0 mismatches, 0 orphans)
4. residual conservation:       Σ|r4−r3|(N×) == N · Σ|r4−r3|(base)
5. residual tolerance:          mean |r4−r3| per node ≤ d³·scale
                                (after 3 power iterations the per-node
                                update decays by the damping factor per
                                step; d=0.85, scale=1e6 ⇒ 614125 — a
                                generous ceiling, the measured value is
                                reported for the record)

Usage:
    python tools/pagerank_gate.py [base_dir] [scaled_dir] [reps] [out.json]
    # defaults: /root/testdata/sf0.1 /tmp/sf1000x 1000 PAGERANK_GATE_1000x_r10.json

Run solo (one local[32] JVM; the 1.2e9-edge DISK_ONLY barrier wants
spark.rdd.compress, set below, and ~15 GB of /tmp).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

#: node-id shift per replica: key shift 10M × 2 (nodes are 2k / 2k+1).
NODE_OFFSET = 20_000_000
DAMP = 0.85
SCALE = 1_000_000


def ranks_with_prev(spark, sf_dir: str):
    from cehrbert_data_spark.operators.closure import pagerank
    from cehrbert_data_spark.queries.graph import trade_edges

    edges = trade_edges(spark, sf_dir)
    # iters=4 with emit_prev: prev_scaled IS the registry query's
    # 3-iteration result; rank_scaled is the residual partner r4.
    return edges, pagerank(
        edges, "src", "dst", weight="w", iters=4, emit_prev=True
    )


def side_stats(edges, rp) -> dict:
    n_edges = edges.count()
    row = rp.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.col("prev_scaled").cast("decimal(38,0)")).cast("string").alias("sum_r3"),
        F.sum(F.col("rank_scaled").cast("decimal(38,0)")).cast("string").alias("sum_r4"),
        F.sum(
            F.abs(F.col("rank_scaled") - F.col("prev_scaled")).cast("decimal(38,0)")
        ).cast("string").alias("resid_l1"),
        F.max(F.abs(F.col("rank_scaled") - F.col("prev_scaled"))).alias("resid_max"),
    ).collect()[0]
    return {
        "n_edges": n_edges,
        "n_nodes": row["n_nodes"],
        "sum_r3": int(row["sum_r3"]),
        "sum_r4": int(row["sum_r4"]),
        "resid_l1": int(row["resid_l1"]),
        "resid_max": row["resid_max"],
    }


def main() -> int:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1000x"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    out_path = (
        sys.argv[4] if len(sys.argv) > 4 else "PAGERANK_GATE_1000x_r10.json"
    )

    from cehrbert_data_spark.session import build_session

    spark = build_session(
        "pagerank_gate",
        extra_confs={"spark.rdd.compress": "true"},
    )

    t0 = time.time()
    base_edges, base_rp = ranks_with_prev(spark, base_dir)
    base_rp = base_rp.cache()
    base = side_stats(base_edges, base_rp)
    base_wall = time.time() - t0
    print(f"base: {base} [{base_wall:.1f}s]", flush=True)

    t1 = time.time()
    big_edges, big_rp = ranks_with_prev(spark, scaled_dir)
    big_rp = big_rp.cache()
    big = side_stats(big_edges, big_rp)
    big_wall = time.time() - t1
    print(f"scaled: {big} [{big_wall:.1f}s]", flush=True)

    # replica exactness: every scaled node's (r3, r4) equals its base twin
    t2 = time.time()
    twin = base_rp.select(
        F.col("node").alias("b_node"),
        F.col("prev_scaled").alias("b_r3"),
        F.col("rank_scaled").alias("b_r4"),
    )
    joined = big_rp.join(
        F.broadcast(twin),
        (big_rp["node"] % NODE_OFFSET) == F.col("b_node"),
        "full_outer",
    )
    mism = joined.agg(
        F.sum(F.when(F.col("b_node").isNull(), 1).otherwise(0)).alias("orphan_scaled"),
        F.sum(F.when(F.col("node").isNull(), 1).otherwise(0)).alias("orphan_base"),
        F.sum(
            F.when(
                F.col("node").isNotNull()
                & F.col("b_node").isNotNull()
                & (
                    (F.col("prev_scaled") != F.col("b_r3"))
                    | (F.col("rank_scaled") != F.col("b_r4"))
                ),
                1,
            ).otherwise(0)
        ).alias("value_mismatch"),
    ).collect()[0]
    match_wall = time.time() - t2

    mean_resid = big["resid_l1"] / big["n_nodes"]
    tol = (DAMP**3) * SCALE
    checks = {
        "node_count_conserved": big["n_nodes"] == reps * base["n_nodes"],
        "edge_count_conserved": big["n_edges"] == reps * base["n_edges"],
        "rank_sum_r3_conserved": big["sum_r3"] == reps * base["sum_r3"],
        "rank_sum_r4_conserved": big["sum_r4"] == reps * base["sum_r4"],
        "residual_l1_conserved": big["resid_l1"] == reps * base["resid_l1"],
        "replica_value_mismatches_zero": mism["value_mismatch"] == 0,
        "replica_orphans_zero": (mism["orphan_scaled"] or 0) == 0
        and (mism["orphan_base"] or 0) == 0,
        "mean_residual_within_tolerance": mean_resid <= tol,
    }
    record = {
        "gate": "r3_pagerank self-consistency (no DuckDB)",
        "base_dir": base_dir,
        "scaled_dir": scaled_dir,
        "reps": reps,
        "base": base,
        "scaled": big,
        "replica_check": {
            "value_mismatch": mism["value_mismatch"],
            "orphan_scaled": mism["orphan_scaled"],
            "orphan_base": mism["orphan_base"],
        },
        "mean_residual_per_node": mean_resid,
        "residual_tolerance_d3_scale": tol,
        "checks": checks,
        "wall_sec": {
            "base": round(base_wall, 1),
            "scaled": round(big_wall, 1),
            "replica_join": round(match_wall, 1),
        },
    }
    print(json.dumps(record, indent=2))
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    failed = [k for k, ok in checks.items() if not ok]
    if failed:
        print(f"FAILED checks: {failed}", file=sys.stderr)
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    sys.exit(main())
