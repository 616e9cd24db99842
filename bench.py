"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced by reducing a single xxhash64 over EVERY output column
to one row (no driver-side collect of full results — measures the
distributed plan, not result serialization). Round-7 honesty fix: the old
count() forcing let Catalyst prune any column no filter/agg depended on —
a projection-shaped query (t_quality) collapsed to a parquet metadata count
and measured nothing, and agg payloads (collect_list sequences) could be
dropped from otherwise-forced plans. The hash consumes every value, so the
timing covers the work the query claims to do; numbers before/after round 7
are not directly comparable (both methodologies recorded in BENCH_100x_r07
for the crossover round).

Load immunity (round-5 lesson: single-shot timings on a box with ±15-20%
ambient load are unreadable): every query runs BEST_OF times back-to-back
and reports the minimum — the best run is the one least polluted by other
tenants' CPU, and modulo noise it converges to the plan's true cost. The
1-min load average at start is recorded so a contaminated round is visible
in the JSON itself. Override with $SPARK_GRAFT_BENCH_RUNS (>=1).

Round-11 additions (verdict asks 7/8): a LOAD GATE — before the JVM starts,
wait up to $SPARK_GRAFT_BENCH_WAIT (300 s) for the ambient 1-min load to
drop under $SPARK_GRAFT_BENCH_MAX_LOAD (2.0); the record carries
load_gate.status PASS/CONTAMINATED either way — and a HOT/COLD SPLIT:
queries_cold/value_cold record each query's first run (cold page cache),
queries/value keep the best-of-N warm semantics of every prior round."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: The headline set: one per operator family — scan/agg (q1), joins
#: (equi/interval/asof), windows (rank/sessionize), sequence assembly
#: (the reference's core capability), graph closure, and the LLM-pipeline
#: operators (dedup, similarity, text).
HEADLINE = [
    "q1_pricing_summary",
    "j1_equi_inner",
    "j6_interval_join",
    "j7_asof_join",
    "a2_hourly_mean",
    "w1_latest_order",
    "w7_sessionize",
    "seq_user_sequence",
    "r1_transitive_closure",
    "d_exact_dedup",
    "d_minhash_lsh",
    # The production capped-LSH configuration (round-9 lesson: the uncapped
    # form is the small-SF regression canary but breaks on clone-heavy
    # corpora at 1000×; the capped form is what ships at scale — track both
    # round-over-round at every SF).
    "d_minhash_capped",
    "sim_cosine_topk",
    "t_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.session import build_session

    def load_now() -> float | None:
        return round(os.getloadavg()[0], 2) if hasattr(os, "getloadavg") else None

    # Load gate (round-10 verdict ask 7: BENCH_r9 and r10 both ran under
    # ambient load and needed idle re-runs to interpret). Before spinning up
    # the JVM — i.e. while the 1-min load average is still purely AMBIENT —
    # wait for the box to go idle; if it never does within the budget, run
    # anyway but stamp the record CONTAMINATED so no reader has to infer the
    # contamination from footnotes.
    gate_threshold = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "2.0"))
    gate_wait = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT", "300"))
    waited = 0.0
    start_load = load_now()
    while (
        start_load is not None
        and start_load > gate_threshold
        and waited < gate_wait
    ):
        print(
            f"bench: ambient load {start_load:.1f} > {gate_threshold:.1f}, "
            f"waiting ({waited:.0f}/{gate_wait:.0f}s)",
            file=sys.stderr,
        )
        time.sleep(min(30.0, gate_wait - waited))
        waited += 30.0
        start_load = load_now()
    load_gate = {
        "threshold": gate_threshold,
        "start_load": start_load,
        "waited_sec": round(min(waited, gate_wait), 0),
        "status": (
            "PASS"
            if start_load is None or start_load <= gate_threshold
            else "CONTAMINATED"
        ),
    }

    spark = build_session("bench")
    # JVM/JIT + codegen warmup so timings measure the queries, not
    # first-job classloading: a synthetic agg plus one pass over the TINY
    # sf0.001 tables exercising the parquet reader, hash join, window, and
    # hash-agg code paths (class loading + whole-stage-codegen compilation).
    # Deliberately NOT the measured sf dir — no measured bytes are touched.
    spark.range(10_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir.rstrip("/"):
        try:
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            r = spark.read.parquet(os.path.join(warm_dir, "region.parquet"))
            n = spark.read.parquet(os.path.join(warm_dir, "nation.parquet"))
            w = Window.partitionBy("n_regionkey").orderBy("n_nationkey")
            (
                n.join(r, n["n_regionkey"] == r["r_regionkey"])
                .withColumn("rn", F.row_number().over(w))
                .withColumn("rs", F.sum("n_nationkey").over(w.rowsBetween(Window.unboundedPreceding, 0)))
                .groupBy("r_name")
                .agg(F.count(F.lit(1)), F.avg("rn"))
                .count()
            )
            # localCheckpoint + anti-join + broadcast machinery (the
            # iterative-closure path loads these classes on first use).
            ck = n.select("n_nationkey").localCheckpoint(eager=True)
            ck.join(r.select(F.col("r_regionkey").alias("n_nationkey")), "n_nationkey", "left_anti").isEmpty()
            n.join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"]).count()
            # The iterative-closure plan shapes (powered-step joins,
            # groupBy-min, anti-join over checkpoints) compile distinct
            # codegen classes; warm them on a 64-node synthetic tree so the
            # measured run hits the codegen cache like any steady-state job.
            from cehrbert_data_spark.operators.closure import transitive_closure

            rng = spark.range(64).select(F.col("id").alias("k"))
            te = (
                rng.select(F.col("k").alias("src"), (F.col("k") * 2).alias("dst"))
                .union(rng.select(F.col("k").alias("src"), (F.col("k") * 2 + 1).alias("dst")))
                .where("dst <= 64 and dst > src")
            )
            transitive_closure(te, "src", "dst").count()
            # Dedup/similarity codegen (explode+md5+stack banding; quantized
            # dot products) on 4 synthetic rows.
            from cehrbert_data_spark.operators.dedup import minhash_lsh_pairs
            from cehrbert_data_spark.operators.similarity import cosine_topk

            toy = spark.createDataFrame(
                [(i, "a b c d e f g h i j " * 3) for i in range(4)], "doc_id: long, text: string"
            )
            minhash_lsh_pairs(toy, "doc_id", "text").count()
            vecs = spark.createDataFrame(
                [(i, [float(i), 1.0, 0.5]) for i in range(4)],
                "id: long, vec: array<float>",
            )
            cosine_topk(vecs, vecs.limit(2), "id", "vec", k=1).count()
        except Exception as exc:  # noqa: BLE001 — warmup must never fail the bench
            print(f"bench: warmup skipped: {exc}", file=sys.stderr)
    qs = all_queries()

    best_of = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    load_avg = load_now()

    # Failure-isolated: one broken query must never erase the other
    # measurements (round 3 lost ALL perf numbers to a single crash).
    timings: dict[str, float | None] = {}
    # Hot/cold split (round-10 verdict ask 8: ~10 s cold-page-cache runs vs
    # 7.6 s warm runs conflated under one "idle" number): each query's FIRST
    # run is its cold figure (first touch of its parquet pages this
    # process), min(runs) is the warm figure. value/queries keep the warm
    # (best-of) semantics every prior round recorded, so round-over-round
    # comparison is unbroken; value_cold/queries_cold are the new axis.
    timings_cold: dict[str, float | None] = {}
    all_runs: dict[str, list[float]] = {}
    # 1-min load at the start of EVERY run (round-7 verdict ask: a load
    # spike mid-bench was only visible as a start-of-bench footnote; now
    # each query's runs carry their own ambient-load annotation so
    # cross-round comparisons can discount contaminated lines in place).
    run_loads: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    total = 0.0
    total_cold = 0.0
    for name in HEADLINE:
        fn = qs[name]
        runs: list[float] = []
        loads: list[float] = []

        def one_run() -> bool:
            from pyspark.sql import functions as F

            ld = load_now()
            t0 = time.time()
            try:
                # Force EVERY output column (see module docstring): one
                # xxhash64 per row reduced to a single BIT_XOR row — full
                # evaluation, zero result serialization, no overflow (a
                # SUM of 64-bit hashes trips ANSI arithmetic). Built as one
                # expression string (r11 RPC pass 4): same forced
                # computation, byte-identical analyzed plan (seed-42
                # xxhash64 + bit_xor either way), ~50 fewer Py4J round
                # trips of harness overhead per timed run.
                df = fn(spark, sf_dir)
                # Backtick-escape embedded backticks (r12 advice): the old
                # F.xxhash64(*cols) handled any name; the string form must too.
                cols = ", ".join(f"`{c.replace('`', '``')}`" for c in df.columns)
                df.selectExpr(f"xxhash64({cols}) AS __h").agg(
                    F.expr("bit_xor(__h)")
                ).collect()
            except Exception as exc:  # noqa: BLE001 — record and keep benching
                errors[name] = f"{type(exc).__name__}: {exc}"[:300]
                print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
                return False
            runs.append(time.time() - t0)
            # Appended only alongside a recorded timing, so
            # run_loads[name][i] is always the load sampled at the start of
            # runs[name][i] — failed attempts record neither (round-8 ADVICE).
            if ld is not None:
                loads.append(ld)
            return True

        for _ in range(best_of):
            if not one_run():
                break
        # Sub-second queries: ±30 ms of scheduler noise is >5% relative, so
        # take best-of-(best_of+2) — the extra runs cost <2 s total and pull
        # run-to-run variance of the small lines under the 5% bar.
        while runs and min(runs) < 1.0 and len(runs) < best_of + 2:
            if not one_run():
                break
        if not runs:
            timings[name] = None
            timings_cold[name] = None
            continue
        all_runs[name] = [round(t, 3) for t in runs]
        if loads:
            run_loads[name] = loads
        best = min(runs)
        timings[name] = round(best, 3)
        timings_cold[name] = round(runs[0], 3)
        total += best
        total_cold += runs[0]

    out = {
        "metric": "headline_total",
        "value": round(total, 3),
        "value_cold": round(total_cold, 3),
        "unit": "sec",
        "queries": timings,
        "queries_cold": timings_cold,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "best_of": best_of,
        "runs": all_runs,
        "load_gate": load_gate,
    }
    if run_loads:
        out["run_loads"] = run_loads
        peak = max(x for v in run_loads.values() for x in v)
        out["load_avg_peak"] = peak
        if peak > 1.0:
            print(
                f"bench: WARNING peak ambient load {peak:.1f} during the run — "
                "per-query run_loads shows which lines are contaminated",
                file=sys.stderr,
            )
    if load_avg is not None:
        out["load_avg_start"] = round(load_avg, 2)
        if load_avg > 1.0:
            print(
                f"bench: WARNING ambient load {load_avg:.1f} at start — "
                "timings may be inflated; best-of-N mitigates but compare trends",
                file=sys.stderr,
            )
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
