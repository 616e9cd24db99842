from __future__ import annotations

from pyspark.sql import functions as F

from cehrbert_data_spark.operators.closure import descendants, transitive_closure
from cehrbert_data_spark.operators.ids import dense_ids, ids_above_max


def test_transitive_closure_diamond(spark):
    # 1 -> 2 -> 4, 1 -> 3 -> 4 (diamond): (1,4) reachable at distance 2, once.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "src: int, dst: int"
    )
    rows = {(r["src"], r["dst"]): r["distance"] for r in transitive_closure(edges).collect()}
    assert rows == {(1, 2): 1, (1, 3): 1, (2, 4): 1, (3, 4): 1, (1, 4): 2}


def test_descendants_lookup(spark):
    anc = spark.createDataFrame(
        [(10, 11), (10, 12), (20, 21)],
        "ancestor_concept_id: int, descendant_concept_id: int",
    )
    seeds = spark.createDataFrame([(10,)], "concept_id: int")
    out = sorted(r["concept_id"] for r in descendants(anc, seeds).collect())
    assert out == [11, 12]


def test_dense_ids(spark):
    df = spark.createDataFrame([("c",), ("a",), ("b",)], "v: string")
    out = {r["v"]: r["id"] for r in dense_ids(df, [F.col("v")]).collect()}
    assert out == {"a": 1, "b": 2, "c": 3}


def test_ids_above_max(spark):
    existing = spark.createDataFrame([(5,), (9,)], "vid: int")
    new = spark.createDataFrame([("x",), ("y",)], "tag: string")
    out = ids_above_max(new, existing, "vid", "vid").collect()
    ids = [r["vid"] for r in out]
    assert len(set(ids)) == 2 and min(ids) > 9
