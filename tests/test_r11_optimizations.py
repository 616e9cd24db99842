"""Focused parity tests for the r11 optimization changes: results must be
identical across the old and new physical forms (the optimizations change
plans, never rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.joins import asof_join
from cehrbert_data_spark.operators.partitioning import widen_for_fanout


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def asof_inputs(spark):
    left = spark.createDataFrame(
        [(1, "2020-01-01"), (2, "2020-02-01"), (3, "2020-03-01")],
        "k: int, start: string",
    ).withColumn("start", F.to_timestamp("start"))
    right = spark.createDataFrame(
        [
            (1, "2020-01-05", 10),
            (1, "2020-01-03", 11),
            (1, "2020-01-03", 9),   # ts tie -> tiebreak by seq
            (2, "2020-02-20", 20),
            (3, "2021-01-01", 30),  # outside the window -> no match
        ],
        "k: int, ts: string, seq: int",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def test_asof_agg_strategy_matches_window(spark, asof_inputs):
    left, right = asof_inputs
    kw = dict(
        on="k",
        point=right["ts"],
        lower=left["start"],
        upper=F.expr("start + INTERVAL 30 DAYS"),
        left_key="k",
    )
    win = asof_join(
        left, right,
        metric=[F.col("ts").asc(), F.col("seq").asc()],
        **kw,
    )
    agg = asof_join(left, right, metric=["ts", "seq"], strategy="agg", **kw)
    assert _rows(win.select("k", "ts", "seq")) == _rows(agg.select("k", "ts", "seq"))
    # the agg form elects by partial aggregation: no Window in the plan
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_min" in plan


def test_asof_agg_strategy_guards(spark, asof_inputs):
    left, right = asof_inputs
    kw = dict(
        on="k",
        point=right["ts"],
        lower=left["start"],
        upper=F.expr("start + INTERVAL 30 DAYS"),
        left_key="k",
    )
    with pytest.raises(ValueError, match="how='inner'"):
        asof_join(left, right, metric=["ts"], strategy="agg", how="left", **kw)
    with pytest.raises(ValueError, match="column NAMES"):
        asof_join(left, right, metric=[F.col("ts").asc()], strategy="agg", **kw)


def test_widen_by_key_hash_partitions_and_reuses_exchange(spark):
    df = spark.createDataFrame(
        [(i, i % 7) for i in range(1000)], "id: long, v: long"
    )
    out = widen_for_fanout(df, min_partitions=8, by="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(id" in plan
    # round-robin pays a sort-before-repartition; the hash form must not
    assert "RoundRobinPartitioning" not in plan
    # a groupBy on the widen key reuses the exchange: exactly ONE exchange
    agg = widen_for_fanout(df, min_partitions=8, by="id").groupBy("id").count()
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert agg_plan.count("Exchange") == 1
    # identical rows either way
    assert _rows(out) == _rows(df)


def test_closure_loop_broadcast_and_shuffle_paths_agree(spark):
    from cehrbert_data_spark.operators.closure import _closure_loop

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)] + [(1, 4), (2, 6)],
        "src: int, dst: int",
    )
    level_1 = edges.select("src", "dst", F.lit(1).alias("distance"))
    step = edges.select(
        F.col("src").alias("e_src"), F.col("dst").alias("e_dst")
    )

    def run(bcast):
        seed = level_1.distinct().localCheckpoint(eager=False)
        out = _closure_loop(
            seed, seed, step, 50, hop_batch=2,
            bcast_small=bcast, pairs_so_far=9,
        )
        return _rows(out)

    assert run(True) == run(False)


def test_closure_early_stop_short_of_capacity_matches_plain_bfs(spark):
    """Path 0->1->...->8 (max min-distance 8): with hop_batch=4 the second
    iteration's max lands short of its capacity 9, so the loop stops
    WITHOUT running the empty-check iteration. Rows (incl. distances) must
    equal plain frontier BFS, which never early-stops."""
    from cehrbert_data_spark.operators.closure import transitive_closure

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src: int, dst: int"
    )
    batched = _rows(transitive_closure(edges, hop_batch=4))
    plain = _rows(transitive_closure(edges, hop_batch=1))
    assert batched == plain
    assert len(batched) == 36  # 9 nodes: all ordered pairs, minimal distances


def test_closure_early_stop_boundary_depth_equals_capacity(spark):
    """Path of max min-distance 5 == first-iteration capacity (1 + B): the
    max-distance signal is ambiguous there, the loop must run the next
    iteration (which proves emptiness) rather than stop early."""
    from cehrbert_data_spark.operators.closure import transitive_closure

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "src: int, dst: int"
    )
    batched = _rows(transitive_closure(edges, hop_batch=4))
    plain = _rows(transitive_closure(edges, hop_batch=1))
    assert batched == plain
    assert max(r[2] for r in batched) == 5


def test_closure_early_stop_diamond_fanout_distances_minimal(spark):
    """Diamond + shortcut graph: pairs reachable by multiple path lengths
    must record the MINIMAL distance under the early-stopping batched loop."""
    from cehrbert_data_spark.operators.closure import transitive_closure

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (1, 4), (4, 7)],
        "src: int, dst: int",
    )
    batched = _rows(transitive_closure(edges, hop_batch=4))
    plain = _rows(transitive_closure(edges, hop_batch=1))
    assert batched == plain
    by_pair = {(s, d): dist for s, d, dist in batched}
    assert by_pair[(1, 7)] == 2  # 1->4->7 via the shortcuts, not 6 hops


# --- r11 RPC pass 4: expression-string twins must build IDENTICAL trees ----

def _norm_analyzed(df):
    """Analyzed plan with expression ids and auto-generated lambda variable
    names normalized away — the same discipline as
    tools/snapshot_logical_plans.py."""
    import re

    s = df._jdf.queryExecution().analyzed().toString()
    s = re.sub(r"lambda [a-z_0-9]+", "lambda <x>", s)
    seen: dict[str, str] = {}

    def sub(m):
        k = m.group(0)
        seen.setdefault(k, f"#{len(seen)}")
        return seen[k]

    return re.sub(r"#\d+", sub, s)


def test_words_sql_twin_matches_words(spark):
    from cehrbert_data_spark.operators.text import words, words_sql

    df = spark.createDataFrame([("a b  c",)], "t: string")
    a = df.select(words(F.col("t")).alias("w"))
    b = df.selectExpr(f"{words_sql('t')} AS w")
    assert _norm_analyzed(a) == _norm_analyzed(b)


def test_md5_long_sql_twin_matches_md5_long(spark):
    from cehrbert_data_spark.operators.text import md5_long, md5_long_sql

    df = spark.createDataFrame([("abc",)], "t: string")
    a = df.select(md5_long(F.col("t")).alias("h"), md5_long(F.col("t"), 48).alias("h48"))
    b = df.selectExpr(f"{md5_long_sql('t')} AS h", f"{md5_long_sql('t', 48)} AS h48")
    assert _norm_analyzed(a) == _norm_analyzed(b)


def test_epoch_seconds_sql_twin_matches_epoch_seconds(spark):
    from cehrbert_data_spark.functions.temporal import epoch_seconds, epoch_seconds_sql

    df = spark.createDataFrame([("2020-01-01 00:00:01",)], "t: string").selectExpr(
        "CAST(t AS TIMESTAMP) AS ts"
    )
    a = df.select(epoch_seconds(F.col("ts")).alias("e"))
    b = df.selectExpr(f"{epoch_seconds_sql('ts')} AS e")
    assert _norm_analyzed(a) == _norm_analyzed(b)


def test_quality_features_tree_matches_column_form(spark):
    """The selectExpr build of quality_features must produce the same
    analyzed tree as the composed-Column original (lambda names aside)."""
    from cehrbert_data_spark.operators.text import (
        EN_STOPWORDS,
        quality_features,
        regex_tokens,
        stopword_ratio,
        words,
    )

    df = spark.createDataFrame([(1, "the cat sat on the mat")], "doc_id: long, text: string")
    new = quality_features(df)
    w = words(F.col("text"))
    n_words = F.size(w)
    total_word_chars = F.aggregate(
        w, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    old = df.select(
        "*",
        F.length("text").alias("q_n_chars"),
        n_words.alias("q_n_words"),
        F.size(regex_tokens(F.col("text"))).alias("q_n_tokens"),
        (total_word_chars.cast("double") / F.greatest(n_words, F.lit(1))).alias(
            "q_mean_word_len"
        ),
        (
            F.size(F.array_distinct(w)).cast("double")
            / F.greatest(n_words, F.lit(1))
        ).alias("q_distinct_ratio"),
        stopword_ratio(w, EN_STOPWORDS).alias("q_stopword_ratio"),
    )
    assert _norm_analyzed(new) == _norm_analyzed(old)


def test_sessionize_string_fast_path_matches_column_form(spark):
    from cehrbert_data_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00", 1), (1, "2020-01-01 02:00:00", 2), (2, "2020-01-01 00:00:00", 3)],
        "user_id: int, ts: string, event_id: int",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "event_id")
    fast = sessionize(df, ["user_id"], ["ts ASC", "event_id ASC"], ts="ts", gap=1800.0)
    slow = sessionize(
        df, ["user_id"], [F.col("ts").asc(), F.col("event_id").asc()],
        ts="ts", gap=F.lit(1800.0),
    )
    assert _norm_analyzed(fast) == _norm_analyzed(slow)
    assert _rows(fast) == _rows(slow)


def test_ordered_rank_string_fast_path_matches_column_form(spark):
    from cehrbert_data_spark.operators.windows import ordered_rank, top_n_per_group

    df = spark.createDataFrame(
        [(1, 10, 3), (1, 20, 1), (2, 5, 2)], "k: int, v: int, u: int"
    )
    for kind in ("row_number", "dense_rank", "rank"):
        fast = ordered_rank(df, ["k"], ["v DESC", "u ASC"], kind=kind)
        slow = ordered_rank(df, ["k"], [F.col("v").desc(), F.col("u").asc()], kind=kind)
        assert _norm_analyzed(fast) == _norm_analyzed(slow), kind
        assert _rows(fast) == _rows(slow), kind
    fast_top = top_n_per_group(df, ["k"], ["v DESC", "u ASC"], n=1)
    slow_top = top_n_per_group(df, ["k"], [F.col("v").desc(), F.col("u").asc()], n=1)
    assert _rows(fast_top) == _rows(slow_top)
