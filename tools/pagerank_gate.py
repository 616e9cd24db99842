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
                                base twin's (INNER broadcast join on
                                node % 20M — full_outer can't broadcast,
                                r10 advice — orphans derived from the
                                matched counts; 0 mismatches, 0 orphans)
4. residual conservation:       Σ|r4−r3|(N×) == N · Σ|r4−r3|(base)
5. residual tolerance:          Σ|r4−r3| ≤ 2·d⁴·N·scale + 3·E
                                L1 mass form: the update operator is an
                                L1-contraction with factor d on a
                                column-substochastic matrix, so
                                D_t ≤ d^(t−1)·D_1 (+ ≤E integer-floor
                                slack per step) and D_1 ≤ 2·d·N·scale
                                (total redistributed mass can't exceed
                                twice the damped total). Per-NODE bounds
                                don't exist here — hub nodes legitimately
                                carry rank ≫ scale, so their updates do
                                too; the measured mean per node is
                                reported, not asserted.

Usage:
    python tools/pagerank_gate.py [base_dir] [scaled_dir] [reps] [out.json]
    # defaults: /root/testdata/sf0.1 /tmp/sf1000x 1000 PAGERANK_GATE_1000x_r10.json

Run solo (one local[32] JVM, SPARK_DRIVER_MEMORY=48g). Measured at the
1000× rung: parquet barriers ~11 GB, peak transient shuffle ~20 GB,
scaled side 931 s — after three instructive failures: (1) 32-partition
SMJ heap-OOM'd its spill readers, (2) per-iteration edge SMJ spilled
~25 GB×4, (3) the un-staged trade-graph build kept every construction
shuffle alive in one job. The shipped shape (vertex-broadcast join +
parquet edge barrier + per-iteration rank barriers + periodicGC) is the
one that fits — and is the right 1000-executor design anyway.
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


def ranks_with_prev(spark, sf_dir: str, barrier_dir: str | None = None):
    from cehrbert_data_spark.operators.closure import pagerank
    from cehrbert_data_spark.queries.graph import trade_edges

    edges = trade_edges(spark, sf_dir)
    if barrier_dir is not None:
        # The trade-graph construction (lineitem⋈orders → pair agg →
        # symmetrizing union) would otherwise re-execute inside the edge-
        # barrier write with its shuffles all alive in one job; staging it
        # as parquet first bounds peak disk to ~8 GB of columnar pairs.
        from cehrbert_data_spark.sources.writers import checkpoint_barrier

        edges = checkpoint_barrier(
            edges, path=os.path.join(barrier_dir, "edges_input")
        )
    # iters=4 with emit_prev: prev_scaled IS the registry query's
    # 3-iteration result; rank_scaled is the residual partner r4.
    # broadcast_ranks + barrier_ranks: the billion-edge levers (see
    # operators/closure.py docstring) — the edge table streams from its
    # barrier instead of being sort-merge-shuffled per iteration (the
    # default shape spilled ~25 GB/iteration here and OOM'd), and per-
    # iteration rank barriers let periodicGC reclaim completed shuffles.
    return edges, pagerank(
        edges,
        "src",
        "dst",
        weight="w",
        iters=4,
        emit_prev=True,
        broadcast_ranks=True,
        barrier_ranks=True,
        barrier_dir=barrier_dir,
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

    # 256 shuffle partitions: the per-iteration SMJ sorts the 1.2e9-row
    # edge side; at the default 32 partitions each task sorts ~18M edge
    # rows and 32 concurrent spill readers blew a 16g heap (first attempt,
    # r10). 256 → ~4.6M rows/task, bounded sort buffers. rdd.compress
    # shrinks the DISK_ONLY edge barrier ~2.5× on this data.
    spark = build_session(
        "pagerank_gate",
        shuffle_partitions=256,
        extra_confs={
            "spark.rdd.compress": "true",
            # reclaim completed iterations' shuffle files mid-run — with
            # barrier_ranks each iteration is its own job, so the previous
            # one's ~10 GB of map output is garbage the moment it ends.
            "spark.cleaner.periodicGC.interval": "1min",
        },
    )

    t0 = time.time()
    base_edges, base_rp = ranks_with_prev(spark, base_dir)
    base_rp = base_rp.cache()
    base = side_stats(base_edges, base_rp)
    base_wall = time.time() - t0
    print(f"base: {base} [{base_wall:.1f}s]", flush=True)

    t1 = time.time()
    big_barrier = "/tmp/pr_gate_barrier"
    big_edges, big_rp = ranks_with_prev(spark, scaled_dir, barrier_dir=big_barrier)
    big_rp = big_rp.cache()
    big = side_stats(big_edges, big_rp)
    big_wall = time.time() - t1
    print(f"scaled: {big} [{big_wall:.1f}s]", flush=True)

    # replica exactness: every scaled node's (r3, r4) equals its base twin.
    # INNER broadcast join (honored: BroadcastHashJoin Inner) — r10 advice:
    # Spark cannot broadcast either side of a full_outer join, so the
    # previous full_outer + broadcast() hint silently ran as a shuffle
    # join. Orphans on both sides derive from the matched counts instead:
    # b_node is unique in the base table, so each scaled node matches at
    # most one twin — matched == n_big means no scaled orphan — and a base
    # node missed by every replica shows up as distinct(b_node) < n_base.
    t2 = time.time()
    twin = base_rp.select(
        F.col("node").alias("b_node"),
        F.col("prev_scaled").alias("b_r3"),
        F.col("rank_scaled").alias("b_r4"),
    )
    mism = (
        big_rp.join(
            F.broadcast(twin),
            (big_rp["node"] % NODE_OFFSET) == F.col("b_node"),
            "inner",
        )
        .agg(
            F.count(F.lit(1)).alias("matched"),
            F.countDistinct("b_node").alias("matched_base"),
            F.sum(
                F.when(
                    (F.col("prev_scaled") != F.col("b_r3"))
                    | (F.col("rank_scaled") != F.col("b_r4")),
                    1,
                ).otherwise(0)
            ).alias("value_mismatch"),
        )
        .collect()[0]
    )
    orphan_scaled = big["n_nodes"] - (mism["matched"] or 0)
    orphan_base = base["n_nodes"] - (mism["matched_base"] or 0)
    match_wall = time.time() - t2

    mean_resid = big["resid_l1"] / big["n_nodes"]
    tol = 2 * (DAMP**4) * big["n_nodes"] * SCALE + 3 * big["n_edges"]
    checks = {
        "node_count_conserved": big["n_nodes"] == reps * base["n_nodes"],
        "edge_count_conserved": big["n_edges"] == reps * base["n_edges"],
        "rank_sum_r3_conserved": big["sum_r3"] == reps * base["sum_r3"],
        "rank_sum_r4_conserved": big["sum_r4"] == reps * base["sum_r4"],
        "residual_l1_conserved": big["resid_l1"] == reps * base["resid_l1"],
        "replica_value_mismatches_zero": (mism["value_mismatch"] or 0) == 0,
        "replica_orphans_zero": orphan_scaled == 0 and orphan_base == 0,
        "residual_l1_within_tolerance": big["resid_l1"] <= tol,
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
            "orphan_scaled": orphan_scaled,
            "orphan_base": orphan_base,
        },
        "mean_residual_per_node": mean_resid,
        "residual_l1_tolerance_2d4_N_scale_plus_3E": tol,
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
