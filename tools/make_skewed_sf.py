"""Synthesize a SKEWED N× scale-up: key-shifted replication (exactly
tools/make_scaled_sf.py's construction) plus a deterministic hot-key remap
— the zipf-head stress the uniform rungs can't exercise (r10 verdict ask 1:
every scale rung replicated entities uniformly, so the salted operators had
oracle passes but no measured hot-key evidence).

Skew shape: ONE global hot key owning ~p of each skewed fact table —
  * events.user_id  -> HOT_USER  for rows where event_id  % round(1/p) == 0
  * orders.o_custkey -> HOT_CUST for rows where o_orderkey % round(1/p) == 0
The remap runs AFTER the per-replica key shift, so every replica funnels
into the SAME hot key: at N× with p=1%, one user owns ~1% of N·|events| —
the "one patient with 100k+ visits" hazard at corpus scale. Row-unique ids
(event_id, o_orderkey) drive the remap, so membership is deterministic and
exactly p (every p-th id). HOT_USER/HOT_CUST are base-replica keys (7), so
FK joins (orders⋈customer) stay valid.

Everything else is make_scaled_sf verbatim (its SHIFTED/OFFSET/COPIED are
imported, not copied), so both halves of the correctness gate run on the
output unchanged:

    python tools/make_skewed_sf.py /root/testdata/sf0.1 /tmp/sf_skew10x 10 0.01
    python tools/verify_oracle.py /tmp/sf_skew10x          # full battery, skewed
    python tools/skew_gate.py /tmp/sf_skew1000x ...        # salted-vs-unsalted A/B

Pure DuckDB — no Spark session needed. Optional 5th arg limits generation
to a comma-separated table list (the big A/B rung only needs
events,orders,customer + dims).
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_scaled_sf import COPIED, OFFSET, SHIFTED  # noqa: E402

#: the global hot key every replica's remapped rows funnel into
HOT_KEY = 7

#: table -> (key column to remap, row-unique column driving membership)
HOT_REMAP: dict[str, tuple[str, str]] = {
    "events": ("user_id", "event_id"),
    "orders": ("o_custkey", "o_orderkey"),
}


def skew_table(
    con, src_dir: str, out_dir: str, table: str, n: int, hot_mod: int
) -> int:
    src = os.path.join(src_dir, f"{table}.parquet")
    dst = os.path.join(out_dir, f"{table}.parquet")
    cols = [r[0] for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()]
    shifted = set(SHIFTED[table])
    remap = HOT_REMAP.get(table)
    exprs = []
    for c in cols:
        if remap is not None and c == remap[0]:
            # shift first (replica-disjoint), then funnel every hot_mod-th
            # row-unique id into the one global hot key
            exprs.append(
                f"CASE WHEN {remap[1]} % {hot_mod} = 0 THEN {HOT_KEY} "
                f"ELSE {c} + rep * {OFFSET} END AS {c}"
            )
        elif c in shifted:
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
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_skewed"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    p = float(sys.argv[4]) if len(sys.argv) > 4 else 0.01
    only = set(sys.argv[5].split(",")) if len(sys.argv) > 5 else None
    hot_mod = max(2, round(1.0 / p))
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        if only is not None and t not in only:
            continue
        con.execute(
            f"COPY (SELECT * FROM '{os.path.join(src_dir, t)}.parquet') "
            f"TO '{os.path.join(out_dir, t)}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied", flush=True)
    for t in SHIFTED:
        if only is not None and t not in only:
            continue
        rows = skew_table(con, src_dir, out_dir, t, n, hot_mod)
        note = ""
        if t in HOT_REMAP:
            key, _ = HOT_REMAP[t]
            hot = con.execute(
                f"SELECT COUNT(*) FROM '{os.path.join(out_dir, t)}.parquet' "
                f"WHERE {key} = {HOT_KEY}"
            ).fetchone()[0]
            note = f", hot {key}={HOT_KEY}: {hot} rows ({100.0 * hot / rows:.2f}%)"
        print(f"{t}: {rows} rows ({n}x{note})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
