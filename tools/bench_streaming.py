"""Streaming-pillar throughput + parity bench: the micro-batch RUNTIME at
volume.

The streaming operators (cehrbert_data_spark/streaming/operators.py) carry
stream==batch parity tests at toy size and five batch duals under the
driver oracle gate — but until this tool, the micro-batch execution path
itself had never been measured at volume. This bench drives millions of
events through a real file-source stream (chunked parquet arriving as
time-ordered micro-batches, the shape a Kafka topic would feed a 100 TB
cluster) and, for every operator:

  * measures wall + events/sec + micro-batch count from the query progress,
  * proves EXACT output parity with the batch form of the same operator via
    the repo's standard checksum fold (COUNT + BIT_XOR + DECIMAL-SUM over a
    60-bit md5 of the canonical row serialization — one definition,
    imported from queries/checksums.py per the round-10 advice).

Append-mode finalization: windowed aggregates only emit once the watermark
passes a window's end, so the LAST time slice would stay in state forever
on a finite file stream. The bench appends a single sentinel row
(uid = -1, ts far in the future) as the final file; it advances the global
watermark past every real window and its own rows are filtered out of both
sides of the comparison. File order is forced by explicit mtimes (the file
source orders by modification time), chunks are time-sliced with a bounded
inter-chunk overlap smaller than every operator's watermark delay, so no
real row is ever late-dropped and stream output == batch output exactly.

Usage:
    python tools/bench_streaming.py [n_events] [out_json]
    # defaults: 20_000_000 events, BENCH_STREAM_r12.json

Data (deterministic, DuckDB-generated): ~n_events rows over N_CHUNKS
time-sliced parquet files spanning ~10 days, N_UIDS users, ~5% exact
duplicate rows (dedup stress), plus a 1k-row static dim for the
stream-static join.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_UIDS = 100_000
N_CHUNKS = 40
FILES_PER_TRIGGER = 2          # -> ~20 real micro-batches + the sentinel
CHUNK_HOURS = 6                # each chunk owns a 6h slice ...
OVERLAP_MINUTES = 45           # ... with +-45min spill into neighbours
BASE_TS = "TIMESTAMP '2020-03-01 00:00:00'"


def generate(data_dir: str, n_events: int) -> dict:
    """Time-sliced chunk files + dim + sentinel, deterministic. Returns the
    generation census."""
    src = os.path.join(data_dir, "events")
    os.makedirs(src, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() // 2)}")
    per_chunk = n_events // N_CHUNKS
    total = 0
    for c in range(N_CHUNKS):
        path = os.path.join(src, f"chunk_{c:03d}.parquet")
        # Rows own slice [c*6h, (c+1)*6h) but each row shifts by a hash-spread
        # offset in [-45min, +45min] -- realistic disorder, bounded so the
        # 4h watermark delay never late-drops anything. ~5% of rows emit an
        # exact duplicate (same uid, ts, v) for the dedup operator.
        con.execute(
            f"""
            COPY (
              WITH base AS (
                SELECT
                  i,
                  CAST(hash(i * 31 + 7) % {N_UIDS} AS INT) AS uid,
                  {BASE_TS}
                    + INTERVAL ({c} * {CHUNK_HOURS} * 3600) SECOND
                    + INTERVAL (CAST(hash(i * 17 + 3) % ({CHUNK_HOURS} * 3600) AS INT)) SECOND
                    + INTERVAL (CAST(hash(i * 13 + 11) % {2 * OVERLAP_MINUTES * 60} AS INT)
                                - {OVERLAP_MINUTES * 60}) SECOND AS ts,
                  CAST((hash(i * 7 + 5) % 100000) AS DOUBLE) / 100.0 AS v
                FROM range({c * per_chunk}, {(c + 1) * per_chunk}) t(i)
              )
              SELECT uid, ts, v FROM base
              UNION ALL
              SELECT uid, ts, v FROM base WHERE hash(i * 41 + 1) % 20 = 0
            ) TO '{path}' (FORMAT PARQUET)
            """
        )
        total += con.execute(
            f"SELECT count(*) FROM read_parquet('{path}')"
        ).fetchone()[0]
        os.utime(path, (1_600_000_000 + c, 1_600_000_000 + c))
    # Sentinel: one far-future row, newest mtime, so it forms the final
    # micro-batch and pushes the watermark past every real window.
    sentinel = os.path.join(src, "zz_sentinel.parquet")
    con.execute(
        f"""
        COPY (SELECT CAST(-1 AS INT) AS uid,
                     {BASE_TS} + INTERVAL 40 DAY AS ts,
                     CAST(0.0 AS DOUBLE) AS v)
        TO '{sentinel}' (FORMAT PARQUET)
        """
    )
    os.utime(sentinel, (1_600_000_000 + N_CHUNKS + 10,) * 2)
    dim = os.path.join(data_dir, "dim")
    con.execute(
        f"""
        COPY (SELECT CAST(i AS INT) AS uid,
                     'seg_' || CAST(i % 17 AS VARCHAR) AS segment
              FROM range({N_UIDS}) t(i))
        TO '{dim}.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return {"events": total, "chunks": N_CHUNKS, "uids": N_UIDS,
            "duplicate_rate": "1/20 of base rows duplicated exactly"}


def _fold_df(df):
    from pyspark.sql import functions as F
    from cehrbert_data_spark.queries.checksums import _fold

    cols = [F.col(c) for c in sorted(df.columns)]
    r = _fold(df, cols).collect()[0]
    return {"n_rows": r["n_rows"], "xor_h": r["xor_h"], "sum_h": r["sum_h"]}


def run_stream(spark, data_dir: str, work_dir: str, name: str, build,
               mode: str = "append"):
    """Drive `build(df) -> df` over the chunked file stream; return metrics +
    the sink fold. ``mode='update'`` (applyInPandasWithState operators)
    routes through foreachBatch — the parquet sink only accepts append."""
    src = os.path.join(data_dir, "events")
    sink = os.path.join(work_dir, f"sink_{name}")
    ckpt = os.path.join(work_dir, f"ckpt_{name}")
    for d in (sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)
    stream = (
        spark.readStream.schema("uid int, ts timestamp, v double")
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(src)
    )
    out = build(stream)
    t0 = time.time()
    writer = out.writeStream.outputMode(mode)
    if mode == "append":
        writer = writer.format("parquet").option("path", sink)
    else:
        writer = writer.foreachBatch(
            lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
        )
    q = (
        writer.option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    # availableNow never self-terminates while an applyInPandasWithState
    # ProcessingTimeTimeout is registered (the engine waits to fire it);
    # block on the data instead, then stop.
    q.processAllAvailable()
    wall = time.time() - t0
    progress = q.recentProgress
    q.stop()
    n_batches = len([p for p in progress if p["numInputRows"] > 0])
    in_rows = sum(p["numInputRows"] for p in progress)
    from pyspark.sql import functions as F

    sunk = spark.read.parquet(sink)
    if "uid" in sunk.columns:
        sunk = sunk.filter(F.col("uid") >= 0)
    return {
        "wall_s": round(wall, 2),
        "micro_batches": n_batches,
        "input_rows": in_rows,
        "events_per_sec": round(in_rows / wall),
    }, sunk


def main() -> int:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else "BENCH_STREAM_r12.json"
    work_dir = os.environ.get("SPARK_GRAFT_STREAM_DIR", "/tmp/stream_bench")
    data_dir = os.path.join(work_dir, "data")
    os.makedirs(work_dir, exist_ok=True)

    print(f"[gen] {n_events} events -> {data_dir}", flush=True)
    t0 = time.time()
    census = generate(data_dir, n_events)
    census["gen_s"] = round(time.time() - t0, 1)
    print(f"[gen] {census}", flush=True)

    from pyspark.sql import SparkSession, functions as F
    from cehrbert_data_spark.operators.windows import top1_per_group_agg
    from cehrbert_data_spark.streaming import (
        hourly_rollup_stream,
        running_key_stats_stream,
        session_window_stream,
        sliding_rollup_stream,
        stream_static_enrich,
        streaming_dedup,
    )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("bench_streaming")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    dim = spark.read.parquet(os.path.join(data_dir, "dim.parquet"))
    batch_all = spark.read.schema("uid int, ts timestamp, v double").parquet(
        os.path.join(data_dir, "events")
    )
    batch = batch_all.filter(F.col("uid") >= 0)  # sentinel excluded

    # Watermark delay 4h everywhere: the inter-chunk disorder is bounded by
    # +-45min, and the worst-case watermark after chunk c is
    # slice_end(c) + 45min - 4h -- far below any row still to arrive, so no
    # real row is EVER late relative to a finalized window and stream output
    # is exactly the batch output (the parity contract this bench asserts).
    WM = "4 hours"

    # key_stats (applyInPandasWithState — the Arrow-state escape hatch,
    # the only Python-side state path in the tree) emits RUNNING totals
    # per key per batch; its batch fallback returns final totals. Parity:
    # reduce the sink to the last emission per key (n_events is strictly
    # monotone within a key, so rank-1 by n_events desc — dogfooding the
    # agg-form top-1 operator) and canonicalize the double sum to exact
    # cents: v carries 2 decimals, so the true sum is an integer number of
    # cents and the ~1e-11 arrival-order double drift rounds away exactly.
    def _last_per_key(df):
        return top1_per_group_agg(
            df, ["uid"], ["n_events", "last_ts", "sum_value"],
            descending=True,
        )

    def _cents_canon(df):
        return df.select(
            "uid", "n_events", "last_ts",
            F.round(F.col("sum_value") * 100).cast("long").alias("sum_cents"),
        )

    # name -> (stream builder, sink post-reduction, canonicalizer)
    OPS = {
        "hourly_rollup": (lambda df: hourly_rollup_stream(
            df, ["uid"], "ts", "v", watermark=WM), None, None),
        "sliding_rollup": (lambda df: sliding_rollup_stream(
            df, ["uid"], "ts", "v", watermark=WM), None, None),
        "session_window": (lambda df: session_window_stream(
            df, ["uid"], "ts", watermark=WM), None, None),
        "streaming_dedup": (lambda df: streaming_dedup(
            df, ["uid", "ts", "v"], "ts", watermark=WM), None, None),
        "static_enrich": (lambda df: stream_static_enrich(
            df, dim, ["uid"]), None, None),
        "key_stats_state": (lambda df: running_key_stats_stream(
            df, ["uid"], "ts", "v", watermark=WM,
            state_timeout_ms=None), _last_per_key,
            _cents_canon),
    }
    MODES = {"key_stats_state": "update"}

    record = {
        "metric": "streaming_micro_batch_throughput",
        "round": 12,
        "config": {
            "n_events": n_events,
            "files_per_trigger": FILES_PER_TRIGGER,
            "chunk_hours": CHUNK_HOURS,
            "overlap_minutes": OVERLAP_MINUTES,
            "cpus": cpus,
            **census,
        },
        "operators": {},
    }
    ok = True
    for name, (build, post, canon) in OPS.items():
        print(f"[run] {name} (stream)", flush=True)
        metrics, sunk = run_stream(
            spark, data_dir, work_dir, name, build,
            mode=MODES.get(name, "append"),
        )
        if post is not None:
            sunk = post(sunk)
        if canon is not None:
            sunk = canon(sunk)
        print(f"[run] {name} (batch dual + folds)", flush=True)
        tb = time.time()
        # The batch dual: the SAME operator on the batch read (unified API).
        bout = build(batch)
        if canon is not None:
            bout = canon(bout)
        bfold = _fold_df(bout)
        batch_wall = round(time.time() - tb, 2)
        sfold = _fold_df(sunk)
        match = sfold == bfold
        ok = ok and match
        metrics.update(
            batch_wall_s=batch_wall,
            parity={"stream": sfold, "batch": bfold, "match": match},
        )
        record["operators"][name] = metrics
        print(f"[res] {name}: {metrics}", flush=True)

    record["all_parity_match"] = ok
    with open(out_json, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps({"metric": "stream_bench", "ok": ok,
                      "out": out_json}), flush=True)
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
