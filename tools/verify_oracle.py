"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
the same scale factor, then compares row count, schema arity, and
order-insensitive values (columns sorted by name, rows sorted by their string
rendering). Usage:

    python tools/verify_oracle.py [sf_dir] [--sample N] [query ...] [--exclude q ...]

``--exclude`` consumes names until the next ``-``-prefixed flag, and every
consumed name must be a known query (an unknown token — e.g. a positional
sf_dir mistakenly placed after it — aborts with exit 2 instead of being
silently treated as an exclusion). Place positionals BEFORE --exclude.

SCALE-SWEEP PREREQUISITE (round-9 finding): DuckDB's ordered-LIST
aggregations at 10M+ rows drive the process to ~65k distinct memory
mappings — exactly the default ``vm.max_map_count`` (65530). At the
boundary, mmap failures surface as ``Out of Memory Error ... (bad
allocation)`` at tiny block sizes and poison the WHOLE process allocator
(every later 2 KB malloc fails too), so one rich aggregate can read as
dozens of phantom engine failures. Raise the limit before 100×-class
sweeps::

    sysctl -w vm.max_map_count=1048576    # resets on reboot

This tool warns when the limit is at the default and the target dir is
scaled-sweep sized.

``--sample N`` verifies against a deterministic md5-sampled 1/N subset of
the ``documents`` and ``embeddings`` tables (other tables untouched). This
exists for the all-pairs dedup queries (d_embed_neardup,
d_embed_neardup_exact, d_ngram_jaccard) at SCALED sf dirs: their DuckDB
oracles are quadratic in document count and stop terminating around 50k
docs, so scaled sweeps verify them on the sampled subset — Spark and
DuckDB both read the same sampled parquet, so the comparison stays exact;
only coverage (which pairs) is sampled, never precision. Full-population
checks stay at sf0.01.
"""

from __future__ import annotations

import gc
import math
import os
import sys
import tempfile
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


#: (table, key column) pairs eligible for --sample subsetting
SAMPLED_TABLES = {"documents": "doc_id", "embeddings": "vec_id"}


def build_sampled_dir(sf_dir: str, n: int) -> str:
    """Materialize a deterministic 1/n md5-sample of documents/embeddings
    under a temp dir; symlink every other table unchanged."""
    out = tempfile.mkdtemp(prefix=f"sf_sampled_{n}_")
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in SAMPLED_TABLES:
            key = SAMPLED_TABLES[t]
            con.execute(
                f"COPY (SELECT * FROM '{src}' WHERE "
                f"('0x' || substr(md5(CAST({key} AS VARCHAR)), 1, 6))::BIGINT % {n} = 0) "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            os.symlink(src, dst)
    con.close()
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    sample_n = None
    if "--sample" in argv:
        i = argv.index("--sample")
        sample_n = int(argv[i + 1])
        del argv[i : i + 2]
    # --exclude a b c: run everything EXCEPT the named queries. Scaled-sweep
    # lever for queries whose TRUE result size is quadratic in the replica
    # count by construction of the key-shifted scaled data (entities
    # multiply, the time axis doesn't, so time-overlap pair volume grows
    # as SF² — e.g. j6b_overlap_buckets at 100× emits ~5e10 genuine pairs
    # in BOTH engines; a data-shape artifact, not an engine defect).
    # Consumes names up to the next flag, and every consumed name must be a
    # known query — otherwise a positional sf_dir/query placed after
    # --exclude would be swallowed silently (round-8 ADVICE).
    excluded: set[str] = set()
    if "--exclude" in argv:
        i = argv.index("--exclude")
        j = i + 1
        while j < len(argv) and not argv[j].startswith("-"):
            j += 1
        excluded = set(argv[i + 1 : j])
        del argv[i:j]
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as _e  # cheap: no JVM until build_session

        unknown = excluded - set(_e.queries())
        if unknown:
            print(f"--exclude: unknown queries {sorted(unknown)}", file=sys.stderr)
            return 2
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if only:
        # Same trap as --exclude (round-8 ADVICE): an unknown positional
        # query name would filter EVERYTHING out and report a vacuous
        # "0 failures". Validate against the registry before any work.
        sys.path.insert(0, "/root/repo")
        import __spark_entry__ as _e2  # cheap: no JVM until build_session

        unknown_only = only - set(_e2.queries())
        if unknown_only:
            print(f"unknown queries {sorted(unknown_only)}", file=sys.stderr)
            return 2
    if sample_n:
        sf_dir = build_sampled_dir(sf_dir, sample_n)
        print(f"sampled 1/{sample_n} subset at {sf_dir}")
    else:
        # Footgun guard (cost a 25-minute 80 GB DuckDB grind in round 7):
        # the all-pairs oracles (d_embed_neardup*, d_ngram_jaccard,
        # d_semantic_dedup) are quadratic in document/vector count and stop
        # terminating around 50k docs. Warn LOUDLY before starting — the
        # sweep still runs (explicitness over auto-magic), but the operator
        # sees the fix before losing half an hour.
        try:
            n_docs = duckdb.sql(
                f"SELECT count(*) FROM '{os.path.join(sf_dir, 'documents.parquet')}'"
            ).fetchone()[0]
        except Exception:  # noqa: BLE001 — missing table: nothing to warn about
            n_docs = 0
        if n_docs > 30_000 and not only:
            print(
                f"WARNING: {n_docs} documents and no --sample N — the "
                "quadratic all-pairs oracles will grind for hours past ~50k "
                "docs. Scaled sweeps should use '--sample 10' "
                "(doc/embedding queries verify on a deterministic 1/10 "
                "subset; everything else runs full).",
                flush=True,
            )

    try:
        max_maps = int(open("/proc/sys/vm/max_map_count").read())
    except OSError:
        max_maps = None
    if max_maps is not None and max_maps < 262144:
        print(
            f"WARNING: vm.max_map_count={max_maps} — DuckDB's ordered-LIST "
            "aggregations at scaled-sweep volume exhaust the default 65530 "
            "mappings and fail with misleading 'bad allocation' OOMs that "
            "poison the whole process (see module docstring). Run "
            "'sysctl -w vm.max_map_count=1048576' first.",
            flush=True,
        )

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from cehrbert_data_spark.session import build_session

    spark = build_session("verify_oracle")

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name in excluded:
            print(f"SKIP  {name}: --exclude")
            continue
        # Fresh DuckDB connection per query and a function frame whose
        # giant collected/normalized lists die on return, plus an explicit
        # gc.collect(): at 100× a single megarow compare holds tens of GB
        # transiently, and without the release a long sweep exhausts the
        # process allocator mid-run — every later 2 KB DuckDB malloc then
        # fails with "bad allocation" and the cascade reads like 39 engine
        # failures (round-9 lesson).
        con = duckdb.connect()
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        if not _check_one(spark, con, sf_dir, name, fn, oracles):
            failures.append(name)
        con.close()
        gc.collect()

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


def _check_one(spark, con, sf_dir, name, fn, oracles) -> bool:
    t0 = time.time()
    try:
        sdf = fn(spark, sf_dir)
        s_rows = sdf.collect()
        s_cols = sdf.columns
    except Exception as exc:
        print(f"FAIL  {name}: spark error: {exc}")
        return False
    if name not in oracles:
        print(f"ok?   {name}: rows-only ({len(s_rows)} rows, no oracle) [{time.time()-t0:.1f}s]")
        return True
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
        return False
    try:
        cur = con.execute(oracles[name])
        d_cols = [d[0] for d in cur.description]
        d_rows = cur.fetchall()
    except Exception as exc:
        print(f"FAIL  {name}: duckdb error: {exc}")
        return False
    if len(s_rows) != len(d_rows):
        print(f"FAIL  {name}: row count spark={len(s_rows)} duckdb={len(d_rows)}")
        return False
    if sorted(c.lower() for c in s_cols) != sorted(c.lower() for c in d_cols):
        print(f"FAIL  {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        return False
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
        return False
    print(f"PASS  {name} ({len(s_rows)} rows) [{time.time()-t0:.1f}s]")
    return True


if __name__ == "__main__":
    raise SystemExit(main())
