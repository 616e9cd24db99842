"""Synthesize an N× scale-up of a driver testdata SF by key-shifted
replication — the scale evidence layer above the largest shipped SF.

Replicates every fact table N times with a consistent key offset
(10M × replica on every BIGINT key column, so all FK pairs — customer↔
orders, orders↔lineitem, part/supplier↔lineitem, user↔events — stay
consistent across replicas) and leaves the tiny dims (region, nation)
untouched. Document text is perturbed per replica ('r<i> ' prefix, n_chars
recomputed) so corpora aren't pure clones; embeddings replicate as-is
(exact-duplicate vectors are a legitimate — and adversarial — dedup
stress). Timestamps are unchanged: the scale axis is entity count, which
is how a real corpus grows.

Because the output is plain parquet with the same table names, BOTH halves
of the correctness gate run on it unchanged:

    python tools/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1.0_synth 10
    python tools/verify_oracle.py /tmp/sf1.0_synth
    SPARK_GRAFT_SF_DIR=/tmp/sf1.0_synth python bench.py

Pure DuckDB — runs in seconds, no Spark session needed.
"""

from __future__ import annotations

import os
import sys

import duckdb

#: Per-replica key offset: far above any key in the shipped SFs, so replica
#: key spaces are disjoint and FK consistency is a single shared shift.
OFFSET = 10_000_000

#: table -> list of key columns to shift per replica.
SHIFTED: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

COPIED = ["region", "nation"]


def scale_table(con, src_dir: str, out_dir: str, table: str, n: int) -> int:
    src = os.path.join(src_dir, f"{table}.parquet")
    dst = os.path.join(out_dir, f"{table}.parquet")
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    shifted = set(SHIFTED[table])
    exprs = []
    for c in cols:
        if c in shifted:
            exprs.append(f"{c} + rep * {OFFSET} AS {c}")
        elif table == "documents" and c == "text":
            exprs.append(
                "CASE WHEN rep = 0 THEN text "
                "ELSE 'r' || CAST(rep AS VARCHAR) || ' ' || text END AS text"
            )
        elif table == "documents" and c == "n_chars":
            exprs.append(
                "CAST(LENGTH(CASE WHEN rep = 0 THEN text ELSE 'r' || "
                "CAST(rep AS VARCHAR) || ' ' || text END) AS BIGINT) AS n_chars"
            )
        else:
            exprs.append(c)
    con.execute(
        f"COPY (SELECT {', '.join(exprs)} FROM '{src}', "
        f"(SELECT UNNEST(range({n})) AS rep) ORDER BY rep) "
        f"TO '{dst}' (FORMAT PARQUET)"
    )
    return con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]


def main() -> int:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_scaled"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        con.execute(
            f"COPY (SELECT * FROM '{os.path.join(src_dir, t)}.parquet') "
            f"TO '{os.path.join(out_dir, t)}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t in SHIFTED:
        rows = scale_table(con, src_dir, out_dir, t, n)
        print(f"{t}: {rows} rows ({n}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
