"""Streaming operators driven through a real micro-batch stream (rate-less:
a file stream over a temp parquet dir) and checked against batch semantics."""

from __future__ import annotations

import pytest

import datetime
import os
import time
from collections import Counter

from pyspark.sql import functions as F

from cehrbert_data_spark.streaming import (
    asof_join_stream,
    minhash_dedup_stream,
    stream_static_enrich,
    hourly_rollup_stream,
    running_key_stats_stream,
    session_window_stream,
    streaming_dedup,
)


def _events(spark):
    rows = [
        (1, datetime.datetime(2020, 1, 1, 10, 0), 1.0),
        (1, datetime.datetime(2020, 1, 1, 10, 10), 3.0),
        (1, datetime.datetime(2020, 1, 1, 12, 0), 10.0),
        (2, datetime.datetime(2020, 1, 1, 10, 5), 5.0),
    ]
    return spark.createDataFrame(rows, "uid: int, ts: timestamp, v: double")


def test_session_window_batch_semantics(spark):
    out = session_window_stream(_events(spark), ["uid"], "ts", gap="30 minutes")
    got = sorted((r["uid"], r["n_events"]) for r in out.collect())
    assert got == [(1, 2), (1, 1), (2, 1)] or got == [(1, 1), (1, 2), (2, 1)]


def test_hourly_rollup_batch_semantics(spark):
    out = hourly_rollup_stream(_events(spark), ["uid"], "ts", "v")
    got = {(r["uid"], r["bucket_start"].hour): r["mean_value"] for r in out.collect()}
    assert got == {(1, 10): 2.0, (1, 12): 10.0, (2, 10): 5.0}


def test_streaming_end_to_end(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    out_dir = os.path.join(str(tmp_path), "sink")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _events(spark).write.parquet(src)

    stream = (
        spark.readStream.schema("uid int, ts timestamp, v double").parquet(src)
    )
    rolled = hourly_rollup_stream(stream, ["uid"], "ts", "v")
    q = (
        rolled.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # With availableNow + watermark, windows finalize only when later data
    # arrives — append mode may emit nothing for a single static batch, but
    # the query must run and commit without error.
    assert q.lastProgress is not None

    # complete-mode aggregation to memory sink observes the actual values
    q2 = (
        rolled.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rollup_mem")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    got = {
        (r["uid"], r["bucket_start"].hour): r["mean_value"]
        for r in spark.sql("SELECT * FROM rollup_mem").collect()
    }
    assert got == {(1, 10): 2.0, (1, 12): 10.0, (2, 10): 5.0}


def test_streaming_dedup_batch(spark):
    df = _events(spark).unionByName(_events(spark))
    assert streaming_dedup(df, ["uid", "ts"], "ts").count() == 4


def _asof_sides(spark):
    lefts = spark.createDataFrame(
        [
            (1, datetime.datetime(2020, 1, 1, 10, 0), "l1"),
            (1, datetime.datetime(2020, 1, 1, 12, 0), "l2"),
            (2, datetime.datetime(2020, 1, 1, 9, 0), "l3"),   # before any right
            (1, datetime.datetime(2020, 1, 3, 12, 0), "l4"),  # beyond lookback
        ],
        "uid: int, ts: timestamp, tag: string",
    )
    rights = spark.createDataFrame(
        [
            (1, datetime.datetime(2020, 1, 1, 9, 30), 10.0),
            (1, datetime.datetime(2020, 1, 1, 11, 0), 20.0),
            (2, datetime.datetime(2020, 1, 1, 9, 30), 30.0),
        ],
        "uid: int, ts: timestamp, value: double",
    )
    return lefts, rights


#: expected most-recent-right within a 1-day lookback, per left tag
_ASOF_EXPECTED = {"l1": 10.0, "l2": 20.0, "l3": None, "l4": None}


def test_asof_join_stream_batch_fallback(spark):
    lefts, rights = _asof_sides(spark)
    out = asof_join_stream(lefts, rights, ["uid"], "ts", "value", lookback_s=86400.0)
    got = {r["tag"]: r["asof_value"] for r in out.collect()}
    assert got == _ASOF_EXPECTED
    assert set(out.columns) == {"uid", "ts", "tag", "asof_ts", "asof_value"}


@pytest.mark.slow
def test_asof_join_stream_end_to_end(spark, tmp_path):
    lefts, rights = _asof_sides(spark)
    lsrc, rsrc = str(tmp_path / "l"), str(tmp_path / "r")
    lefts.write.parquet(lsrc)
    rights.write.parquet(rsrc)
    lstream = spark.readStream.schema("uid int, ts timestamp, tag string").parquet(lsrc)
    rstream = spark.readStream.schema("uid int, ts timestamp, value double").parquet(rsrc)
    joined = asof_join_stream(lstream, rstream, ["uid"], "ts", "value", lookback_s=86400.0)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("asof_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM asof_mem").collect()
    got = {r["tag"]: r["asof_value"] for r in rows}
    # single micro-batch: every right row is visible to every left row,
    # so the stream must reproduce the batch-fallback semantics exactly
    assert got == _ASOF_EXPECTED


def _dup_docs(spark):
    text_a = "the quick brown fox jumps over the lazy dog again and again today"
    text_b = "completely different words about spark structured streaming state"
    rows = [
        (1, text_a),
        (2, text_a),  # exact dup of 1 -> collides in every band
        (3, text_b),
        (7, text_a + " slightly"),  # near-dup of 1 (shares most shingles)
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_minhash_dedup_batch(spark):
    out = minhash_dedup_stream(_dup_docs(spark), "doc_id", "text")
    pairs = {(r["id"], r["keeper"]) for r in out.collect()}
    assert (2, 1) in pairs          # exact dup collides
    assert all(k < i for i, k in pairs)  # keeper is always the bucket min
    assert not any(i == 3 or k == 3 for i, k in pairs)  # unrelated doc clean


@pytest.mark.slow
def test_minhash_dedup_stream_end_to_end(spark, tmp_path):
    docs = _dup_docs(spark)
    src = str(tmp_path / "docs")
    docs.write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        minhash_dedup_stream(stream, "doc_id", "text")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mhd_mem")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["id"], r["keeper"]) for r in spark.sql("SELECT * FROM mhd_mem").collect()}
    # single micro-batch: must equal the batch fallback's collision set
    want = {
        (r["id"], r["keeper"])
        for r in minhash_dedup_stream(docs, "doc_id", "text").collect()
    }
    assert got == want and (2, 1) in got


def test_stream_static_enrich(spark, tmp_path):
    dim = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "uid: int, uname: string"
    )
    # batch semantics
    out = stream_static_enrich(_events(spark), dim, ["uid"])
    assert {(r["uid"], r["uname"]) for r in out.collect()} == {(1, "alpha"), (2, "beta")}

    # streaming: stateless stream-static join, no watermark required
    src = str(tmp_path / "src")
    _events(spark).write.parquet(src)
    stream = spark.readStream.schema("uid int, ts timestamp, v double").parquet(src)
    q = (
        stream_static_enrich(stream, dim, ["uid"])
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("enrich_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM enrich_mem").collect()
    assert len(rows) == 4 and all(r["uname"] in ("alpha", "beta") for r in rows)


def test_running_key_stats_batch_fallback(spark):
    out = running_key_stats_stream(_events(spark), ["uid"], "ts", "v")
    got = {(r["uid"]): (r["n_events"], r["sum_value"]) for r in out.collect()}
    assert got == {1: (3, 14.0), 2: (1, 5.0)}


@pytest.mark.slow
def test_running_key_stats_stream_stateful(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src2")
    _events(spark).write.parquet(src)
    stream = spark.readStream.schema("uid int, ts timestamp, v double").parquet(src)

    from cehrbert_data_spark.streaming import running_key_stats_stream as rks

    stats = rks(stream, ["uid"], "ts", "v")
    q = (
        stats.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM running_mem").collect()
    # last emitted state per key == batch totals
    final = {}
    for r in rows:
        final[r["uid"]] = (r["n_events"], r["sum_value"])
    assert final == {1: (3, 14.0), 2: (1, 5.0)}


@pytest.mark.slow
def test_hll_register_stream_matches_batch(spark, tmp_path):
    """Registers accumulated over micro-batches == batch registers over the
    same rows (mergeability-in-motion), and the streaming state is bounded
    at 2^p buckets per group."""
    import random as _random

    from cehrbert_data_spark.operators.sketches import hll_registers
    from cehrbert_data_spark.streaming import hll_register_stream

    rng = _random.Random(2024)
    rows = [("g%d" % (i % 2), rng.randrange(10**8)) for i in range(2000)]
    df = spark.createDataFrame(rows, "g string, v long")

    # batch fallback path
    batch = {
        (r["g"], r["bucket"]): r["register"]
        for r in hll_register_stream(df, ["g"], "v", p=5).collect()
    }
    expected = {
        (r["g"], r["bucket"]): r["register"]
        for r in hll_registers(df, ["g"], __import__("pyspark.sql.functions", fromlist=["col"]).col("v"), p=5).collect()
    }
    assert batch == expected

    # streaming path: two parquet files -> availableNow micro-batches
    src = os.path.join(str(tmp_path), "hll_src")
    df.where("v % 2 = 0").write.mode("append").parquet(src)
    df.where("v % 2 = 1").write.mode("append").parquet(src)
    stream = spark.readStream.schema("g string, v long").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    regs = hll_register_stream(stream, ["g"], "v", p=5)
    q = (
        regs.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["g"], r["bucket"]): r["register"]
        for r in spark.sql("SELECT * FROM hll_mem").collect()
    }
    assert got == expected
    assert len(got) <= 2 * 32  # state bound: |groups| * 2^p


@pytest.mark.slow
def test_hist_bin_stream_matches_batch_and_quantile(spark, tmp_path):
    """Bins accumulated over micro-batches == batch bins over the same
    rows, and the quantile folded from the streamed bin table equals the
    batch histogram_quantile answer."""
    import math
    import random as _random

    from cehrbert_data_spark.operators.aggregations import histogram_quantile
    from cehrbert_data_spark.streaming import hist_bin_stream

    rng = _random.Random(99)
    rows = [("g%d" % (i % 2), rng.uniform(-30.0, 120.0)) for i in range(1500)]
    df = spark.createDataFrame(rows, "g string, v double")

    # batch fallback == plain bin-count aggregation
    batch = {
        (r["g"], r["bin"]): r["cnt"]
        for r in hist_bin_stream(df, ["g"], "v", bin_width=8.0).collect()
    }
    expected = Counter((g, math.floor(v / 8.0)) for g, v in rows)
    assert batch == dict(expected)

    # streaming path over two micro-batches
    src = os.path.join(str(tmp_path), "hist_src")
    df.where("v < 40").write.mode("append").parquet(src)
    df.where("v >= 40").write.mode("append").parquet(src)
    stream = spark.readStream.schema("g string, v double").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        hist_bin_stream(stream, ["g"], "v", bin_width=8.0)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hist_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.sql("SELECT * FROM hist_mem").collect()
    got = {(r["g"], r["bin"]): r["cnt"] for r in streamed}
    assert got == dict(expected)

    # fold the STREAMED bin table to the p90 and compare to the batch op
    def fold(g, q_num, q_den):
        bins = sorted((b, c) for (gg, b), c in got.items() if gg == g)
        total = sum(c for _, c in bins)
        cum = 0
        for b, c in bins:
            cum += c
            if cum * q_den >= total * q_num:
                return b, total
    batch_q = {
        r["g"]: (r["q_bin"], r["n_rows"])
        for r in histogram_quantile(df, ["g"], "v", 9, 10, 8.0).collect()
    }
    assert {g: fold(g, 9, 10) for g in ("g0", "g1")} == batch_q


# --- cross-batch state recurrence --------------------------------------------
# GroupState.get is a PROPERTY; the three applyInPandasWithState operators
# once called it as a method, which only explodes when a key RECURS across
# micro-batches (state.exists True). Every earlier streaming test was a
# single availableNow batch, so the 20M-event throughput bench found it
# first. These tests pin the fix: two time-ordered files, maxFilesPerTrigger
# = 1, same keys in both batches.


def _list_parts(src):
    return {
        f for f in os.listdir(src) if f.endswith(".parquet") and not f.startswith("_")
    }


def _two_file_stream(tmp_path, spark, schema, rows1, rows2, sub):
    src = os.path.join(str(tmp_path), sub)
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    batch1 = _list_parts(src)  # part names embed a random uuid: capture the
    # write-1 files NOW — sorting names later would order batches by uuid
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)
    parts = sorted(batch1) + sorted(_list_parts(src) - batch1)
    # force batch order = declaration order (the file source sorts by mtime)
    for i, f in enumerate(parts):
        os.utime(os.path.join(src, f), (1_600_000_000 + i,) * 2)
    return spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)


def test_running_key_stats_state_recurs_across_batches(spark, tmp_path):
    from cehrbert_data_spark.streaming import running_key_stats_stream as rks

    t = datetime.datetime
    stream = _two_file_stream(
        tmp_path, spark, "uid int, ts timestamp, v double",
        [(1, t(2020, 1, 1, 10, 0), 1.0), (1, t(2020, 1, 1, 10, 5), 3.0)],
        [(1, t(2020, 1, 1, 11, 0), 10.0), (2, t(2020, 1, 1, 11, 5), 5.0)],
        "rks_src",
    )
    q = (
        rks(stream, ["uid"], "ts", "v", state_timeout_ms=None)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rks_recur_mem")
        .option("checkpointLocation", os.path.join(str(tmp_path), "rks_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()  # state_timeout_ms=None (NoTimeout): with a
    # ProcessingTimeTimeout registered, availableNow spins forever on
    # empty timeout-check batches and never self-terminates
    q.stop()
    rows = spark.sql("SELECT * FROM rks_recur_mem").collect()
    final = {}
    for r in rows:  # update mode: later emissions overwrite
        if r["uid"] not in final or r["n_events"] > final[r["uid"]][0]:
            final[r["uid"]] = (r["n_events"], r["sum_value"])
    # uid 1 accumulated ACROSS batches: 2 events in batch 1 + 1 in batch 2
    assert final == {1: (3, 14.0), 2: (1, 5.0)}
    assert any(r["uid"] == 1 and r["n_events"] == 2 for r in rows)  # batch-1 emission


def test_minhash_dedup_state_recurs_across_batches(spark, tmp_path):
    from cehrbert_data_spark.streaming import minhash_dedup_stream

    text_a = "the quick brown fox jumps over the lazy dog again and again today"
    stream = _two_file_stream(
        tmp_path, spark, "doc_id long, text string",
        [(1, text_a)],
        [(2, text_a)],  # exact dup arrives one batch LATER
        "mhd_src",
    )
    q = (
        minhash_dedup_stream(stream, "doc_id", "text", state_timeout_ms=None)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("mhd_recur_mem")
        .option("checkpointLocation", os.path.join(str(tmp_path), "mhd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()  # state_timeout_ms=None (NoTimeout): with a
    # ProcessingTimeTimeout registered, availableNow spins forever on
    # empty timeout-check batches and never self-terminates
    q.stop()
    got = {(r["id"], r["keeper"]) for r in spark.sql("SELECT * FROM mhd_recur_mem").collect()}
    # doc 2 must collide with the BUFFERED batch-1 keeper, not a fresh bucket
    assert (2, 1) in got


def test_asof_state_recurs_across_batches(spark, tmp_path):
    """Left rows in batch 2 must join rights BUFFERED from batch 1."""
    t = datetime.datetime
    lsrc = os.path.join(str(tmp_path), "asof_l")
    rsrc = os.path.join(str(tmp_path), "asof_r")
    spark.createDataFrame(
        [(1, t(2020, 1, 1, 10, 0), "early")], "uid int, ts timestamp, tag string"
    ).coalesce(1).write.mode("append").parquet(lsrc)
    lbatch1 = _list_parts(lsrc)  # write-order capture, as in _two_file_stream
    spark.createDataFrame(
        [(1, t(2020, 1, 1, 12, 0), "late")], "uid int, ts timestamp, tag string"
    ).coalesce(1).write.mode("append").parquet(lsrc)
    lparts = sorted(lbatch1) + sorted(_list_parts(lsrc) - lbatch1)
    for i, f in enumerate(lparts):
        os.utime(os.path.join(lsrc, f), (1_600_000_000 + i,) * 2)
    spark.createDataFrame(
        [(1, t(2020, 1, 1, 11, 0), 20.0)], "uid int, ts timestamp, value double"
    ).write.parquet(rsrc)

    lstream = (
        spark.readStream.schema("uid int, ts timestamp, tag string")
        .option("maxFilesPerTrigger", 1)
        .parquet(lsrc)
    )
    rstream = spark.readStream.schema("uid int, ts timestamp, value double").parquet(rsrc)
    joined = asof_join_stream(lstream, rstream, ["uid"], "ts", "value",
                              lookback_s=86400.0, state_timeout_ms=None)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("asof_recur_mem")
        .option("checkpointLocation", os.path.join(str(tmp_path), "asof_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()  # state_timeout_ms=None (NoTimeout): with a
    # ProcessingTimeTimeout registered, availableNow spins forever on
    # empty timeout-check batches and never self-terminates
    q.stop()
    got = {r["tag"]: r["asof_value"] for r in spark.sql("SELECT * FROM asof_recur_mem").collect()}
    # batch 2's left row ('late', 12:00) sees the right (11:00, 20.0) only
    # through the cross-batch buffer
    assert got["late"] == 20.0
