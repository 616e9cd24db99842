"""Synthesize an N× scale-up with a STRETCHED time axis — the scale shape
key-shifted replication cannot produce.

``make_scaled_sf.py`` multiplies entities but leaves timestamps unchanged,
so any TIME-OVERLAP workload's true pair volume grows quadratically in the
replica count by construction (every replica's intervals overlap every
other replica's — ~5e10 genuine pairs for j6b at 100×, in BOTH engines;
documented in SWEEP_100x_r08.json). That is a data-shape artifact, not how
a real corpus grows: real growth extends the time axis too, and overlap
density per unit time stays roughly constant.

This tool models that growth: every replica is a coherent TIME-TRANSLATED
copy — all DATE/TIMESTAMP columns in every fact table shift by
``rep × STRETCH_DAYS`` (3000 days, longer than any shipped table's span,
so replica time ranges are pairwise disjoint) on top of the same key
shifts make_scaled_sf applies. Intra-replica relationships (order↔lineitem
date arithmetic, event sessions, visit spans) are preserved exactly, so
every battery query stays semantically valid; time-overlap pair volume is
exactly N × the base SF's (disjoint ranges add, never cross), keeping
oracle verification linear at any N:

    python tools/make_stretched_sf.py /root/testdata/sf0.1 /tmp/sf100x_stretch 100
    python tools/verify_oracle.py /tmp/sf100x_stretch j6b_overlap_buckets

Pure DuckDB — seconds, no Spark session. This is the evidence path for
``overlap_join_buckets`` past 10× (VERDICT r8 ask 3): the bucket join's
Σ|bucket|² cost is linear when per-bucket density is constant, which is
exactly the regime this data reproduces.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_scaled_sf import COPIED, OFFSET, SHIFTED  # noqa: E402

#: Per-replica time translation. Must exceed every shipped table's time
#: span (orders/lineitem cover ~2500 days; events 30 days) plus any window
#: a query adds (7-day fulfilment windows, day-granularity visit bounds).
STRETCH_DAYS = 3000


def stretch_table(con, src_dir: str, out_dir: str, table: str, n: int) -> int:
    src = os.path.join(src_dir, f"{table}.parquet")
    dst = os.path.join(out_dir, f"{table}.parquet")
    desc = con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
    shifted = set(SHIFTED[table])
    exprs = []
    for name, dtype, *_ in desc:
        base = dtype.upper()
        if name in shifted:
            exprs.append(f"{name} + rep * {OFFSET} AS {name}")
        elif base.startswith(("DATE", "TIMESTAMP")):
            exprs.append(f"{name} + rep * INTERVAL {STRETCH_DAYS} DAY AS {name}")
        else:
            exprs.append(name)
    con.execute(
        f"COPY (SELECT {', '.join(exprs)} FROM '{src}', "
        f"(SELECT UNNEST(range({n})) AS rep) ORDER BY rep) "
        f"TO '{dst}' (FORMAT PARQUET)"
    )
    return con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()[0]


def main() -> int:
    src_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf_stretched"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in COPIED:
        con.execute(
            f"COPY (SELECT * FROM '{os.path.join(src_dir, t)}.parquet') "
            f"TO '{os.path.join(out_dir, t)}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t in SHIFTED:
        rows = stretch_table(con, src_dir, out_dir, t, n)
        print(f"{t}: {rows} rows ({n}x, time axis stretched)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
