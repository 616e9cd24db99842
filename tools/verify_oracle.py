"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the same scale factor, then compares row count, schema arity, and
order-insensitive values (columns sorted by name, rows sorted by their string
rendering). Usage:

    python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from cehrbert_data_spark.session import build_session

    spark = build_session("verify_oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_rows = sdf.collect()
            s_cols = sdf.columns
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(s_rows)} rows, no oracle) [{time.time()-t0:.1f}s]")
            continue
        # Representation guard: the driver hashes typed values, so a DuckDB
        # HUGEINT (int128) or a list-typed column hash-mismatches Spark even
        # when the values are equal. str()-normalized compare below can't see
        # that, so flag it at the type level.
        type_flags = []
        for f in sdf.schema.fields:
            if f.dataType.typeName() in ("array", "map", "struct"):
                type_flags.append(f"spark {f.name}: {f.dataType.simpleString()}")
        try:
            for col_name, col_type, *_ in con.execute(
                f"DESCRIBE {oracles[name]}"
            ).fetchall():
                if "HUGEINT" in col_type.upper() or "[]" in col_type:
                    type_flags.append(f"duckdb {col_name}: {col_type}")
        except Exception:
            pass
        if type_flags:
            print(f"FAIL  {name}: driver-unhashable result types: {type_flags}")
            failures.append(name)
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {exc}")
            failures.append(name)
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL  {name}: row count spark={len(s_rows)} duckdb={len(d_rows)}")
            failures.append(name)
            continue
        if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
            print(f"FAIL  {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            failures.append(name)
            continue
        _, s_norm = _normalize(s_rows, [c.lower() for c in s_cols])
        _, d_norm = _normalize(d_rows, [c.lower() for c in d_cols])
        if s_norm != d_norm:
            n_diff = sum(1 for a, b in zip(s_norm, d_norm) if a != b)
            print(f"FAIL  {name}: values differ ({n_diff}/{len(s_norm)} rows)")
            for a, b in list(zip(s_norm, d_norm))[:200]:
                if a != b:
                    print(f"   spark : {a}")
                    print(f"   duckdb: {b}")
                    break
            failures.append(name)
            continue
        print(f"PASS  {name} ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
