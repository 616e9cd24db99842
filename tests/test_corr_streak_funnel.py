"""Unit + differential tests for the round-6 additions: exact-integer
correlation/regression, gaps-and-islands streaks, first-failing-rule quality
funnel, and the sliding-window rollup (batch semantics + streaming parity)."""

from __future__ import annotations

import datetime
import os

import numpy as np
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.aggregations import corr_regression
from cehrbert_data_spark.operators.text import quality_funnel
from cehrbert_data_spark.operators.windows import streaks
from cehrbert_data_spark.streaming import sliding_rollup_stream


# --- corr_regression ---------------------------------------------------------

def test_corr_regression_matches_numpy(spark):
    rng = np.random.RandomState(7)
    x = rng.uniform(1, 50, 200).round(2)
    y = (3.5 * x + rng.normal(0, 10, 200)).round(2)
    rows = [("g", float(a), float(b)) for a, b in zip(x, y)]
    df = spark.createDataFrame(rows, "k: string, x: double, y: double")
    got = corr_regression(df, ["k"], "x", "y", scale=100).collect()[0]

    xq = np.round(x * 100).astype(np.int64)
    yq = np.round(y * 100).astype(np.int64)
    assert got["n_rows"] == 200
    assert abs(got["corr"] - np.corrcoef(xq, yq)[0, 1]) < 1e-9
    slope, intercept = np.polyfit(xq, yq, 1)
    assert abs(got["slope"] - slope) < 1e-9
    assert abs(got["intercept"] - intercept) < 1e-6
    # slope is scale-invariant: quantized fit == raw fit
    raw_slope = np.polyfit(x, y, 1)[0]
    assert abs(got["slope"] - raw_slope) < 1e-3


def test_corr_regression_zero_variance_guard(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 2.0), ("g", 1.0, 3.0)], "k: string, x: double, y: double"
    )
    row = corr_regression(df, ["k"], "x", "y").collect()[0]
    assert row["corr"] is None and row["slope"] is None and row["intercept"] is None


def test_corr_regression_overflow_guard_raises(spark):
    """|quantized| >= 1e18 must raise loudly (in ANY ANSI mode), never
    silently NULL out of the DECIMAL(18,0) accumulators while n_rows still
    counts the row."""
    import pytest

    df = spark.createDataFrame(
        [("g", 2.0e16, 1.0), ("g", 3.0e16, 2.0), ("g", 4.0e16, 3.0)],
        "k: string, x: double, y: double",
    )
    with pytest.raises(Exception, match="corr_regression|ASSERT|overflow"):
        corr_regression(df, ["k"], "x", "y", scale=100).collect()
    # under the wire (just below 1e18 after quantization) still works
    ok = spark.createDataFrame(
        [("g", 9.0e15, 1.0), ("g", 8.0e15, 2.0), ("g", 7.0e15, 3.0)],
        "k: string, x: double, y: double",
    )
    row = corr_regression(ok, ["k"], "x", "y", scale=100).collect()[0]
    assert row["corr"] is not None and row["n_rows"] == 3


# --- streaks -----------------------------------------------------------------

def test_streaks_islands(spark):
    def d(day):
        return datetime.datetime(2020, 1, day, 12, 0)

    rows = [
        # user 1: days 1,2,3 then 5,6 then 9 — and day 2 has THREE events
        (1, d(1)), (1, d(2)), (1, d(2)), (1, d(2)), (1, d(3)),
        (1, d(5)), (1, d(6)), (1, d(9)),
        # user 2: one day only
        (2, d(4)),
    ]
    df = spark.createDataFrame(rows, "uid: int, ts: timestamp")
    out = {
        (r["uid"], r["streak_start"].day): (r["streak_end"].day, r["streak_len"])
        for r in streaks(df, ["uid"], "ts").collect()
    }
    assert out == {
        (1, 1): (3, 3),
        (1, 5): (6, 2),
        (1, 9): (9, 1),
        (2, 4): (4, 1),
    }


# --- merge_intervals ---------------------------------------------------------

def test_merge_intervals_islands(spark):
    def d(day):
        return datetime.date(2020, 1, day)

    rows = [
        # user 1: [1,5] ∪ [3,7] overlap; [7,8] touches (merges); [12,13] apart
        (1, d(1), d(5)), (1, d(3), d(7)), (1, d(7), d(8)), (1, d(12), d(13)),
        # user 1: contained interval must not extend the island
        (1, d(2), d(4)),
        # user 2: inverted + NULL rows dropped, one valid island
        (2, d(9), d(2)), (2, None, d(5)), (2, d(20), d(21)),
    ]
    df = spark.createDataFrame(rows, "uid: int, s: date, e: date")
    from cehrbert_data_spark.operators.windows import merge_intervals

    out = {
        (r["uid"], r["island_start"].day): (r["island_end"].day, r["n_intervals"])
        for r in merge_intervals(df, ["uid"], "s", "e").collect()
    }
    assert out == {
        (1, 1): (8, 4),
        (1, 12): (13, 1),
        (2, 20): (21, 1),
    }


# --- quality_funnel ----------------------------------------------------------

def test_quality_funnel_first_failing_rule_wins(spark):
    df = spark.createDataFrame(
        [(1, 50, 45), (2, 50, 1), (3, 50, 40), (4, 5, 1)],
        "doc_id: int, n_words: int, n_distinct: int",
    )
    out = quality_funnel(
        df,
        [
            ("too_short", F.col("n_words") < 10),
            ("low_diversity", F.col("n_distinct") * 10 < F.col("n_words") * 5),
        ],
    )
    got = {r["doc_id"]: r["verdict"] for r in out.collect()}
    # doc 4 fails BOTH rules -> attributed to the first
    assert got == {1: "pass", 2: "low_diversity", 3: "pass", 4: "too_short"}


# --- sliding_rollup_stream ---------------------------------------------------

def _sliding_events(spark):
    rows = [
        (1, datetime.datetime(2020, 1, 1, 10, 0), 1.0),   # boundary event
        (1, datetime.datetime(2020, 1, 1, 10, 20), 3.0),
        (1, datetime.datetime(2020, 1, 1, 10, 40), 5.0),
        (2, datetime.datetime(2020, 1, 1, 11, 10), 7.0),
    ]
    return spark.createDataFrame(rows, "uid: int, ts: timestamp, v: double")


#: each event must land in exactly width/slide = 2 windows
_SLIDING_EXPECTED = {
    (1, (9, 30)): (2, 4.0),    # 09:30-10:30 gets 10:00, 10:20
    (1, (10, 0)): (3, 9.0),    # 10:00-11:00 gets all three
    (1, (10, 30)): (1, 5.0),   # 10:30-11:30 gets 10:40
    (2, (10, 30)): (1, 7.0),
    (2, (11, 0)): (1, 7.0),
}


def _sliding_key(r):
    return (r["uid"], (r["win_start"].hour, r["win_start"].minute))


def test_sliding_rollup_batch_semantics(spark):
    out = sliding_rollup_stream(_sliding_events(spark), ["uid"], "ts", "v")
    got = {_sliding_key(r): (r["n_events"], r["sum_value"]) for r in out.collect()}
    assert got == _SLIDING_EXPECTED
    # window bounds are width apart and slide-aligned
    for r in out.collect():
        assert (r["win_end"] - r["win_start"]).total_seconds() == 3600
        assert r["win_start"].minute in (0, 30)


def test_sliding_rollup_stream_matches_batch(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    _sliding_events(spark).write.parquet(src)
    stream = spark.readStream.schema("uid int, ts timestamp, v double").parquet(src)
    rolled = sliding_rollup_stream(stream, ["uid"], "ts", "v")
    q = (
        rolled.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sliding_mem")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        _sliding_key(r): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM sliding_mem").collect()
    }
    assert got == _SLIDING_EXPECTED


# --- exact_group_median --------------------------------------------------------

def test_exact_median_vs_bruteforce(spark):
    import random

    from cehrbert_data_spark.operators.aggregations import exact_group_median

    rng = random.Random(99)
    rows = []
    for g, n in [("odd", 101), ("even", 80), ("tiny", 1), ("neg", 50)]:
        for _ in range(n):
            v = rng.uniform(-50, 200) if g == "neg" else rng.uniform(0, 300)
            rows.append((g, round(v, 3)))
    rows.append(("nulls", None))
    rows += [("nulls", float(v)) for v in (5, 1, 9)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    got = {
        r["g"]: (r["n_rows"], r["median"])
        for r in exact_group_median(df, ["g"], "v", bin_width=7.0).collect()
    }
    from collections import defaultdict

    vals = defaultdict(list)
    for g, v in rows:
        if v is not None:
            vals[g].append(v)
    exp = {
        g: (len(vs), sorted(vs)[(len(vs) + 1) // 2 - 1]) for g, vs in vals.items()
    }
    assert got == exp


def test_exact_median_duplicate_values(spark):
    from cehrbert_data_spark.operators.aggregations import exact_group_median

    df = spark.createDataFrame(
        [("g", 5.0)] * 10 + [("g", 1.0)] * 3 + [("g", 9.0)] * 3,
        "g: string, v: double",
    )
    row = exact_group_median(df, ["g"], "v").collect()[0]
    assert (row["n_rows"], row["median"]) == (16, 5.0)


def test_exact_quantile_arbitrary_q_vs_bruteforce(spark):
    import random

    from cehrbert_data_spark.operators.aggregations import exact_group_quantile

    rng = random.Random(123)
    rows = [("g", round(rng.uniform(0, 500), 3)) for _ in range(173)]
    df = spark.createDataFrame(rows, "g: string, v: double")
    vs = sorted(v for _, v in rows)
    for q_num, q_den in [(1, 10), (1, 4), (9, 10), (99, 100), (1, 1)]:
        got = exact_group_quantile(df, ["g"], "v", q_num, q_den, 7.0).collect()[0]
        k = (len(vs) * q_num + q_den - 1) // q_den
        assert got["q_value"] == vs[k - 1], (q_num, q_den)


def test_exact_quantile_rejects_out_of_range_fraction(spark):
    import pytest

    from cehrbert_data_spark.operators.aggregations import exact_group_quantile

    df = spark.createDataFrame([("g", 1.0)], "g: string, v: double")
    # q_num=0 or q_num>q_den used to make groups silently vanish (k=0 or
    # k>n matches no rank); now they must error at the driver, eagerly.
    for q_num, q_den in [(0, 2), (3, 2), (1, 0), (-1, 2), (1, -2)]:
        with pytest.raises(ValueError):
            exact_group_quantile(df, ["g"], "v", q_num, q_den)


def test_word_entropy_matches_bruteforce(spark):
    from collections import Counter

    from cehrbert_data_spark.queries.llm import t_word_entropy

    # run on the real sf0.001 docs and recheck 10 of them in pure Python
    got = {
        r["doc_id"]: (r["n_words"], r["n_distinct"], r["bits_sum"])
        for r in t_word_entropy(spark, "/root/testdata/sf0.001").collect()
    }
    import duckdb

    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 10"
    ).fetchall()
    for doc_id, text in rows:
        counts = Counter(text.strip().lower().split())
        n = sum(counts.values())
        bits = sum(c * (((n * 1024) // c).bit_length() - 1) for c in counts.values())
        assert got[doc_id] == (n, len(counts), bits), doc_id
