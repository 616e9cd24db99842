"""10,000× stretch rung (round-9 verdict stretch ask): scale-invariant
queries — r1_transitive_closure, o1_global_topk, d_exact_dedup,
a6_conditional_agg, j5_scalar_max, and (r11, verdict ask 3) the dedup/
similarity pillar rows d_minhash_capped (50M docs) and sim_cosine_topk
(5 queries × 20M vectors) — at 10× the 1000× dir: 1.5B orders / 1B events /
150M customers / 50M documents flowing through the UNCHANGED query code on
both engines. Optional trailing args select a query subset so the long
dedup rows run in their own sessions.

A materialized 10,000× dir would be ~240 GB of parquet — more than this
box's disk — so the extra decade is synthesized EXACTLY the way
tools/make_scaled_sf.py materializes one, just lazily:

* Spark side: ``queries.*.read_table`` is shimmed (documented monkeypatch,
  restored after) to return the 10-way union of key-shifted scans of the
  1000× dir — same SHIFTED column map as make_scaled_sf, wrapper offset
  10¹⁰ per replica (the 1000× keys live below 10¹⁰, so replica key spaces
  stay disjoint), document text perturbed per replica ('q<i> ' prefix)
  so corpora aren't pure clones. The query functions themselves run
  unchanged — zero construction drift.
* DuckDB side: views with the IDENTICAL construction via a
  ``CROSS JOIN range(10)`` — lazy, never materialized.

Each query's full output is folded to one row per engine with the
checksum discipline of queries/checksums.py (COUNT + BIT_XOR + DECIMAL
SUM over a 60-bit md5 of a canonical integer serialization), so the
compare is exact over the FULL population with no megarow collect.
Doubles are canonicalized as ROUND(x·100) BIGINT (o_totalprice is
cents-exact; both engines hold bit-identical doubles, pinned by the o1
oracle at every materialized rung).

Usage:  python tools/sweep_10000x.py [scaled_dir] [wrap] [out.json]
        # defaults: /tmp/sf1000x 10 SWEEP_10000x_r10.json
Run solo; SPARK_DRIVER_MEMORY=16g recommended.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: wrapper key offset: 1000x keys are < 10^10 (base < 10M + 999*10M).
WRAP_OFFSET = 10_000_000_000

#: table -> key columns to shift, mirroring tools/make_scaled_sf.SHIFTED.
SHIFTED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

QUERIES = [
    "r1_transitive_closure",
    "o1_global_topk",
    "d_exact_dedup",
    # round-10 extension: a 1B-row hash agg and a scan + 1-row broadcast
    "a6_conditional_agg",
    "j5_scalar_max",
    # round-11 extension (verdict ask 3): the dedup/similarity pillar.
    # d_minhash_capped CAN run at 50M docs precisely because the cap
    # bounds pair volume by cap·rows (the capped-LSH scale argument,
    # now measured at its fourth decade). sim_cosine_topk is the
    # query-vs-corpus ANN shape — linear in the corpus (5 queries × 20M
    # vectors). The ALL-PAIRS similarity forms (sim_ivf/sim_lsh/
    # d_minhash_lsh uncapped) are excluded by arithmetic, not engine
    # limits: their candidate volume is Σ|bucket|² — for ivf_topk's
    # fraction-parameterized codebook the assignment alone is
    # n²·nprobe/mod ≈ 1.25e13 centroid scores at 20M vectors — so their
    # documented ceiling stays the 100× full-corpus verdicts, and the
    # linear-scale paths (capped buckets, query-vs-corpus, trained
    # fixed-k codebook via ml_kmeans at 1000×) are what ship at 100 TB.
    "d_minhash_capped",
    "sim_cosine_topk",
    # round-11 continuation: the full-population checksum duals of the
    # megarow agg/window queries (r10's cs_* battery entries), whose
    # largest measured rung was 1000x. Each ALREADY returns a single
    # (n_rows, xor_h, sum_h) fold row, so the sweep's outer fold is a
    # symmetric double-fold on both engines. cs_a1 hash-aggregates 1.5B
    # orders into 150M customer groups; cs_a2 1B events into hourly
    # buckets; cs_w7 sessionizes 1B events per user; cs_w1 is the window
    # rank-1 over 1.5B orders (the one full-width shuffle - run it in its
    # own session last, per the heartbeat lesson). cs_a5 is excluded by
    # disk arithmetic, not engine limits: lineitem at this rung is 6B
    # rows and its 1.5B-group shuffle plus the DuckDB spill exceeds the
    # box's free disk.
    "cs_a1_multi_agg",
    "cs_a2_hourly_mean",
    "cs_w7_sessionize",
    "cs_w1_latest_order",
]

#: the cs_* queries return one fold row; canon is the fold triple itself.
_CS_CANON = ["n_rows", "xor_h", "sum_h"]

#: canonical BIGINT serializations of each query's output columns.
CANON_SPARK = {
    "r1_transitive_closure": lambda: [F.col("src"), F.col("dst"), F.col("distance")],
    "o1_global_topk": lambda: [
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.round(F.col("o_totalprice") * 100).cast("long"),
    ],
    "d_exact_dedup": lambda: [F.col("digest"), F.col("n_docs"), F.col("keep_id")],
    # high_rate = n_high/n is a pure function of the hashed operands
    # (the cs_a2 convention); hashing a formatted double is not portable.
    "a6_conditional_agg": lambda: [F.col("event_type"), F.col("n"), F.col("n_high")],
    # prices are cents-exact doubles straight from parquet (identical bits
    # on both engines), so ROUND(x*100) is an exact integer canon.
    "j5_scalar_max": lambda: [
        F.col("p_partkey"),
        F.round(F.col("p_retailprice") * 100).cast("long"),
        F.round(F.col("max_price") * 100).cast("long"),
    ],
    "d_minhash_capped": lambda: [
        F.col("id_a"), F.col("id_b"), F.col("n_bands")
    ],
    # cosine = exact-int dot / (sqrt·sqrt): identical IEEE doubles on both
    # engines (the sim_* oracle discipline), so ROUND(x·1e12) is a shared
    # integer canon — never hash a formatted double.
    "sim_cosine_topk": lambda: [
        F.col("q_id"),
        F.col("n_id"),
        F.round(F.col("cosine") * 1e12).cast("long"),
        F.col("rank"),
    ],
    "cs_a1_multi_agg": lambda: [F.col(c) for c in _CS_CANON],
    "cs_a2_hourly_mean": lambda: [F.col(c) for c in _CS_CANON],
    "cs_w7_sessionize": lambda: [F.col(c) for c in _CS_CANON],
    "cs_w1_latest_order": lambda: [F.col(c) for c in _CS_CANON],
}
CANON_SQL = {
    "r1_transitive_closure": ["src", "dst", "distance"],
    "o1_global_topk": [
        "o_orderkey",
        "o_custkey",
        "CAST(ROUND(o_totalprice * 100) AS BIGINT)",
    ],
    "d_exact_dedup": ["digest", "n_docs", "keep_id"],
    "a6_conditional_agg": ["event_type", "n", "n_high"],
    "j5_scalar_max": [
        "p_partkey",
        "CAST(ROUND(p_retailprice * 100) AS BIGINT)",
        "CAST(ROUND(max_price * 100) AS BIGINT)",
    ],
    "d_minhash_capped": ["id_a", "id_b", "n_bands"],
    "sim_cosine_topk": [
        "q_id",
        "n_id",
        "CAST(ROUND(cosine * 1e12) AS BIGINT)",
        "rank",
    ],
    "cs_a1_multi_agg": _CS_CANON,
    "cs_a2_hourly_mean": _CS_CANON,
    "cs_w7_sessionize": _CS_CANON,
    "cs_w1_latest_order": _CS_CANON,
}


def fold_spark(df, canon):
    # Single definition of the byte-sensitive checksum fold (r10 advice:
    # two independent copies of a canonical-serialization contract drift).
    from cehrbert_data_spark.queries.checksums import _fold

    return _fold(df, canon).collect()[0].asDict()


def fold_sql(con, base_sql, canon_exprs):
    from cehrbert_data_spark.queries.checksums import _fold_sql

    row = con.execute(_fold_sql(base_sql, canon_exprs)).fetchone()
    return {"n_rows": row[0], "xor_h": row[1], "sum_h": row[2]}


def shifted_read_table_factory(real_read_table, wrap: int):
    def shifted(spark, sf_dir, name):
        base = real_read_table(spark, sf_dir, name)
        shift_cols = set(SHIFTED.get(name, []))
        outs = []
        for rep in range(wrap):
            cols = []
            for c in base.columns:
                if c in shift_cols:
                    cols.append((F.col(c) + rep * WRAP_OFFSET).alias(c))
                elif name == "documents" and c == "text":
                    cols.append(
                        F.concat(F.lit(f"q{rep} "), F.col(c)).alias(c)
                    )
                elif name == "documents" and c == "n_chars":
                    cols.append(
                        (F.col(c) + len(f"q{rep} ")).cast("long").alias(c)
                    )
                else:
                    cols.append(F.col(c))
            outs.append(base.select(cols))
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out

    return shifted


def duck_views(con, sf_dir: str, wrap: int) -> None:
    for name, shift_cols in SHIFTED.items():
        path = os.path.join(sf_dir, f"{name}.parquet")
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{path}'").fetchall()
        ]
        exprs = []
        for c in cols:
            if c in shift_cols:
                exprs.append(f"{c} + rep * {WRAP_OFFSET} AS {c}")
            elif name == "documents" and c == "text":
                exprs.append(f"'q' || rep || ' ' || text AS text")
            elif name == "documents" and c == "n_chars":
                exprs.append(f"n_chars + LENGTH('q' || rep || ' ') AS n_chars")
            else:
                exprs.append(c)
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT {', '.join(exprs)} FROM '{path}' "
            f"CROSS JOIN (SELECT CAST(range AS BIGINT) AS rep FROM range({wrap}))"
        )
    for name in ("region", "nation"):
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{path}'")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1000x"
    wrap = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    out_path = sys.argv[3] if len(sys.argv) > 3 else "SWEEP_10000x_r10.json"
    # optional query subset (heartbeat lesson: run the long dedup rows in
    # their own sessions)
    subset = [q for q in sys.argv[4:]] or QUERIES
    unknown = [q for q in subset if q not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries {unknown}; declared: {QUERIES}")

    from cehrbert_data_spark.queries import checksums, graph, llm, relational
    from cehrbert_data_spark.session import build_session

    spark = build_session("sweep_10000x")
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # Bound the oracle's memory and let it spill: the unbounded default
    # (80% of RAM) plus the resident Spark JVM OOM-killed the process on
    # the 50M-doc minhash row (2.2B-row DISTINCT(id, shingle)) — and the
    # kill was silent under `| tee` (pipeline status is tee's). 48 GB cap
    # + explicit temp_directory turns that into disk spill.
    con.execute("SET memory_limit = '48GB'")
    con.execute("SET temp_directory = '/tmp/duck_spill'")
    con.execute("SET preserve_insertion_order = false")
    duck_views(con, sf_dir, wrap)

    q_fns = {}
    for mod in (graph, relational, llm, checksums):
        for name in QUERIES:
            if name in mod.QUERIES:
                q_fns[name] = mod.QUERIES[name]

    results, ok = {}, True
    mods = (graph, relational, llm, checksums)
    real = {m: m.read_table for m in mods}
    try:
        for m in mods:
            m.read_table = shifted_read_table_factory(real[m], wrap)
        for name in subset:
            fn, oracle_sql = q_fns[name]
            t0 = time.time()
            s = fold_spark(fn(spark, sf_dir), CANON_SPARK[name]())
            spark_wall = time.time() - t0
            # print the Spark fold IMMEDIATELY: if the oracle side dies
            # (OOM, spill-disk exhaustion) the engine evidence survives in
            # the log
            print(
                f"spark  {name}: {s} [{spark_wall:.1f}s]; oracle starting",
                flush=True,
            )
            t1 = time.time()
            d = fold_sql(con, oracle_sql, CANON_SQL[name])
            duck_wall = time.time() - t1
            match = (
                s["n_rows"] == d["n_rows"]
                and s["xor_h"] == d["xor_h"]
                and s["sum_h"] == d["sum_h"]
            )
            ok = ok and match
            results[name] = {
                "status": "PASS" if match else "FAIL",
                "n_rows": s["n_rows"],
                "spark": s,
                "duckdb": d,
                "spark_sec": round(spark_wall, 1),
                "duckdb_sec": round(duck_wall, 1),
            }
            print(
                f"{'PASS' if match else 'FAIL'}  {name} "
                f"({s['n_rows']} rows) [spark {spark_wall:.1f}s, duck {duck_wall:.1f}s]",
                flush=True,
            )
    finally:
        for m in mods:
            m.read_table = real[m]

    record = {
        "rung": f"{wrap}x wrapper over {sf_dir} (lazy key-shifted union, "
        "construction identical to make_scaled_sf)",
        "tables": "orders 1.5B, events 1B, lineitem 6B untouched, customer 150M, part 2M, documents 50M at default args",
        "compare": "full-population checksum fold (COUNT + BIT_XOR + SUM of 60-bit md5)",
        "results": results,
        "pass": sum(1 for r in results.values() if r["status"] == "PASS"),
        "fail": sum(1 for r in results.values() if r["status"] == "FAIL"),
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: v["status"] for k, v in results.items()}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
