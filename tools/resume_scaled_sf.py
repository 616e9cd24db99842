"""Resume a partially-generated make_scaled_sf output dir, table by table.

The full-run generator was once OOM-killed mid-`lineitem` at the 1000x rung
while sharing the box with two Spark JVMs — and `python ... | tail` masked
the kill as exit 0 (the pipeline reports tail's status; the round-10 sweep
hit the identical trap with tee). This wrapper (a) generates ONLY the
tables missing from the output dir, (b) caps DuckDB memory and gives it a
spill directory so the big ORDER BY rep COPYs degrade to disk instead of
dying, and (c) is meant to be run with `; echo EXIT=$?` NOT a pipe.

Usage: python tools/resume_scaled_sf.py <src_dir> <out_dir> <n>
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_scaled_sf import COPIED, SHIFTED, scale_table  # noqa: E402


def main() -> int:
    src_dir, out_dir, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET memory_limit = '40GB'")
    con.execute("SET temp_directory = '/tmp/duck_spill'")
    con.execute("SET preserve_insertion_order = false")
    for t in COPIED:
        dst = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(dst):
            print(f"{t}: exists, skipped", flush=True)
            continue
        con.execute(
            f"COPY (SELECT * FROM '{os.path.join(src_dir, t)}.parquet') "
            f"TO '{dst}' (FORMAT PARQUET)"
        )
        print(f"{t}: copied", flush=True)
    for t in SHIFTED:
        dst = os.path.join(out_dir, f"{t}.parquet")
        # a kill mid-COPY leaves a 0-byte (or footer-less) file — treat
        # anything DuckDB can't read a count from as missing
        if os.path.exists(dst):
            try:
                con.execute(f"SELECT COUNT(*) FROM '{dst}'").fetchone()
                print(f"{t}: exists, skipped", flush=True)
                continue
            except Exception:
                print(f"{t}: unreadable partial file, regenerating", flush=True)
                os.remove(dst)
        rows = scale_table(con, src_dir, out_dir, t, n)
        print(f"{t}: {rows} rows ({n}x)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
