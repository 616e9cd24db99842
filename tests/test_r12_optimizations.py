"""Round-12 optimization guards.

Each test pins an r12 change: the size-aware widen target, the hardened
schema-cache key, the windows fast-path quoting/collision guards, and the
map-lookup sketch probes (parity with the r11 explode+join forms).
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F


# --- size-aware widen target (partitioning.py, verdict ask 2) -----------------

def test_widen_target_scales_with_input_bytes(spark, tmp_path):
    from cehrbert_data_spark.operators.partitioning import widen_for_fanout

    path = str(tmp_path / "tiny")
    spark.range(1000).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)
    size = os.path.getsize(
        next(str(p) for p in (tmp_path / "tiny").iterdir() if str(p).endswith(".parquet"))
    )
    out = widen_for_fanout(df, by="id")
    # the tiny file must NOT fan out to defaultParallelism partitions:
    # the byte cap bounds the target at ceil(bytes / chunk)
    chunk = int(os.environ.get("SPARK_GRAFT_WIDEN_BYTES_PER_PART", str(64 << 10)))
    expected = max(1, -(-size // chunk))
    parallelism = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() <= min(parallelism, max(expected, 1))
    # rows unchanged
    assert out.count() == 1000


def test_widen_explicit_min_partitions_bypasses_cap(spark, tmp_path):
    from cehrbert_data_spark.operators.partitioning import widen_for_fanout

    path = str(tmp_path / "tiny2")
    spark.range(100).coalesce(1).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path)
    out = widen_for_fanout(df, min_partitions=4, by="id")
    assert out.rdd.getNumPartitions() == 4


# --- schema cache: in-place part rewrite re-infers (readers.py, ask 7) --------

def test_schema_cache_reinfers_on_inplace_part_rewrite(spark, tmp_path):
    from cehrbert_data_spark.sources import readers

    sf_dir = str(tmp_path)
    tbl = os.path.join(sf_dir, "t")
    spark.range(10).selectExpr("id AS a").write.parquet(tbl)
    first = readers.read_table(spark, sf_dir, "t")
    assert [f.name for f in first.schema.fields] == ["a"]
    # rewrite the SAME part filename in place with a different schema,
    # keeping the directory mtime fixed (POSIX: replacing file contents
    # does not touch the parent dir's mtime when the name set is unchanged)
    parts = [p for p in os.listdir(tbl) if p.endswith(".parquet")]
    import pyarrow as pa
    import pyarrow.parquet as pq

    dir_stat = os.stat(tbl)
    for p in parts:
        pq.write_table(
            pa.table({"b": pa.array([1, 2], type=pa.int64())}),
            os.path.join(tbl, p),
        )
        # drop the stale Hadoop checksum sidecar for the rewritten bytes
        crc = os.path.join(tbl, f".{p}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        # make the entry mtime visibly newer than the cached key
        future = time.time() + 5
        os.utime(os.path.join(tbl, p), (future, future))
    os.utime(tbl, (dir_stat.st_atime, dir_stat.st_mtime))  # freeze dir mtime
    again = readers.read_table(spark, sf_dir, "t")
    assert [f.name for f in again.schema.fields] == ["b"]


# --- windows fast-path guards (ADVICE r11) ------------------------------------

def test_ordered_rank_reserved_word_partition(spark):
    from cehrbert_data_spark.operators.windows import ordered_rank

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 30)], "order: int, v: int"
    )
    out = ordered_rank(df, ["order"], ["v DESC"], out="rk")
    rows = {(r["order"], r["v"]): r["rk"] for r in out.collect()}
    assert rows[(1, 20)] == 1 and rows[(1, 10)] == 2 and rows[(2, 30)] == 1


def test_ordered_rank_existing_out_column_is_replaced(spark):
    from cehrbert_data_spark.operators.windows import ordered_rank

    df = spark.createDataFrame([(1, 10, 99), (1, 20, 99)], "k: int, v: int, rk: int")
    out = ordered_rank(df, ["k"], ["v ASC"], out="rk")
    # the Column path REPLACES the pre-existing column; the fast path must
    # not produce a duplicate/ambiguous one
    assert out.columns.count("rk") == 1
    assert {r["rk"] for r in out.collect()} == {1, 2}


def test_sessionize_bool_gap_takes_column_path(spark):
    from cehrbert_data_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (1, "2020-01-01 02:00:00")],
        "user_id: int, ts: string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    # bool gap is degenerate: invalid SQL ('True') on the string path and a
    # boolean-vs-double comparison on the Column path — must raise crisply
    with pytest.raises(ValueError, match="bool"):
        sessionize(df, ["user_id"], ["ts ASC"], ts="ts", gap=True)


def test_sessionize_scientific_float_gap(spark):
    from cehrbert_data_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (1, "2020-01-01 00:00:01")],
        "user_id: int, ts: string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    out = sessionize(df, ["user_id"], ["ts ASC"], ts="ts", gap=1e-05)
    assert [r["session_id"] for r in out.orderBy("ts").collect()] == [0, 1]


def test_sessionize_existing_out_column_is_replaced(spark):
    from cehrbert_data_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00", 7)], "user_id: int, ts: string, session_id: int"
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "session_id")
    out = sessionize(df, ["user_id"], ["ts ASC"], ts="ts", gap=60)
    assert out.columns.count("session_id") == 1
    assert out.collect()[0]["session_id"] == 0


# --- sketch probes: map-lookup form == explode+join form ----------------------

def test_bloom_probe_plan_has_no_probe_side_shuffle(spark):
    from cehrbert_data_spark.operators.sketches import bloom_build, bloom_probe

    build = spark.range(100).selectExpr("id AS v")
    probe = spark.range(200).selectExpr("id AS v")
    filt = bloom_build(build, F.col("v"), m_bits=4096, k=4)
    out = bloom_probe(probe, filt, F.col("v"), m_bits=4096, k=4, assume_distinct=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # with assume_distinct the probe path is a projection + one-row
    # broadcast attach: the only Generate (explode) is the filter BUILD
    # side, and the probe key never hash-partitions
    assert plan.count("Generate") == 1
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "hashpartitioning(probe_key" not in plan
    # membership results: every built key passes (no false negatives)
    flags = {r["probe_key"]: r["bloom_maybe"] for r in out.collect()}
    assert all(flags[i] for i in range(100))


def test_cms_estimate_assume_distinct_matches_default(spark):
    from cehrbert_data_spark.operators.sketches import cms_build, cms_estimate

    data = spark.range(500).selectExpr("CAST(id % 37 AS LONG) AS v")
    probe = spark.range(37).selectExpr("id AS v")
    sk = cms_build(data, F.col("v"), depth=4, width=64)
    a = {
        r["probe_key"]: r["cms_est"]
        for r in cms_estimate(probe, sk, F.col("v"), depth=4, width=64).collect()
    }
    b = {
        r["probe_key"]: r["cms_est"]
        for r in cms_estimate(
            probe, sk, F.col("v"), depth=4, width=64, assume_distinct=True
        ).collect()
    }
    assert a == b
    # CMS never underestimates the true count (500 rows over 37 keys)
    for key, est in a.items():
        true = 500 // 37 + (1 if key < 500 % 37 else 0)
        assert est >= true
