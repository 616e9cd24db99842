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
