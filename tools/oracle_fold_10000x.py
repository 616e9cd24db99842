"""DuckDB-only half of a sweep_10000x row, for oracles too big to share
the box with a Spark JVM.

The 50M-doc d_minhash_capped oracle's ungrouped intermediate (2.2B hashed
shingle rows ≈ 70 GB) exceeds this box's spill headroom when a 20 GB JVM
is resident (two deaths: unbounded RAM → OOM reaper; 48 GB cap → spill
disk exhausted at the ~94 GB filesystem ceiling). Run the two engines in
SEPARATE sessions: sweep_10000x prints the Spark fold immediately (banked
in the log, reproduced bit-identically across runs), then this tool
computes the DuckDB fold with the whole machine's RAM
(memory_limit=100GB, threads=16 to bound thread-local pre-agg tables) and
compares against the Spark fold passed on the command line.

Usage:
    python tools/oracle_fold_10000x.py <query> <sf_dir> <wrap> \
        <spark_n_rows> <spark_xor_h> <spark_sum_h> <spark_sec> [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from sweep_10000x import CANON_SQL, duck_views, fold_sql  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> int:
    name = sys.argv[1]
    sf_dir = sys.argv[2]
    wrap = int(sys.argv[3])
    spark = {
        "n_rows": int(sys.argv[4]),
        "xor_h": int(sys.argv[5]),
        "sum_h": sys.argv[6],
    }
    spark_sec = float(sys.argv[7])
    out_path = sys.argv[8] if len(sys.argv) > 8 else f"/tmp/oracle_fold_{name}.json"

    from cehrbert_data_spark.queries import graph, llm, relational

    oracle_sql = None
    for mod in (graph, relational, llm):
        if name in mod.QUERIES:
            oracle_sql = mod.QUERIES[name][1]
    assert oracle_sql, f"no oracle for {name}"

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    con.execute("SET memory_limit = '100GB'")
    con.execute("SET temp_directory = '/tmp/duck_spill'")
    con.execute("SET preserve_insertion_order = false")
    duck_views(con, sf_dir, wrap)

    t0 = time.time()
    from cehrbert_data_spark.queries.llm import _minhash_banded_cte

    cte = _minhash_banded_cte()
    if cte in oracle_sql:
        # Chunked evaluation of the shared banded CTE. The minhash
        # signature is PER-DOCUMENT, so `banded` can be built in doc-id
        # chunks with bounded intermediates — the single-query form's
        # ungrouped 2.2B-row shingle stream needed >100 GB RAM + 57 GB
        # spill at 50M docs (three deaths on this box). The materialized
        # banded table is only |docs|·8 skinny rows (~400M at the 10,000×
        # rung); the tail (bucket cap + pair join + fold) runs against it
        # unchanged via exact CTE-prefix substitution, so WHAT is computed
        # is byte-identical to the registry oracle.
        chunks = 8
        # clone the wrap-construction view under a new name (views bind
        # lazily by name — documents_all AS SELECT * FROM documents would
        # recurse once documents is redefined)
        ddl = con.execute(
            "SELECT sql FROM duckdb_views() WHERE view_name = 'documents'"
        ).fetchone()[0]
        con.execute(
            ddl.replace("VIEW documents", "VIEW documents_all", 1).replace(
                "CREATE VIEW", "CREATE OR REPLACE VIEW", 1
            )
        )
        con.execute("DROP TABLE IF EXISTS banded_mat")
        first = True
        for i in range(chunks):
            con.execute(
                "CREATE OR REPLACE VIEW documents AS "
                f"SELECT * FROM documents_all WHERE doc_id % {chunks} = {i}"
            )
            chunk_sql = f"{cte}\nSELECT id, band, band_key FROM banded"
            if first:
                con.execute(f"CREATE TABLE banded_mat AS {chunk_sql}")
                first = False
            else:
                con.execute(f"INSERT INTO banded_mat {chunk_sql}")
            print(f"banded chunk {i + 1}/{chunks} done "
                  f"[{time.time() - t0:.0f}s]", flush=True)
        # restore the full view (tail SQL may reference documents via the
        # substituted prefix only, but keep the catalog consistent)
        con.execute("CREATE OR REPLACE VIEW documents AS SELECT * FROM documents_all")
        tail_sql = oracle_sql.replace(
            cte, "WITH banded AS (SELECT * FROM banded_mat)"
        )
        assert tail_sql != oracle_sql
        d = fold_sql(con, tail_sql, CANON_SQL[name])
    else:
        d = fold_sql(con, oracle_sql, CANON_SQL[name])
    duck_wall = time.time() - t0
    match = (
        spark["n_rows"] == d["n_rows"]
        and spark["xor_h"] == d["xor_h"]
        and spark["sum_h"] == d["sum_h"]
    )
    record = {
        name: {
            "status": "PASS" if match else "FAIL",
            "n_rows": d["n_rows"],
            "spark": spark,
            "duckdb": d,
            "spark_sec": spark_sec,
            "duckdb_sec": round(duck_wall, 1),
            "note": (
                "two-session protocol: Spark fold banked by sweep_10000x "
                "(identical across two independent runs), oracle computed "
                "solo with memory_limit=100GB"
            ),
        }
    }
    with open(out_path, "w") as f:
        json.dump(record, f, indent=2)
    print(f"{'PASS' if match else 'FAIL'}  {name} duck={d} [{duck_wall:.1f}s]")
    return 0 if match else 1


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "tools"))
    raise SystemExit(main())
