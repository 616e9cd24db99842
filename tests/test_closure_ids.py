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


def test_pagerank_matches_integer_bruteforce(spark):
    from collections import defaultdict

    from cehrbert_data_spark.operators.closure import pagerank

    edges = [(1, 2, 3), (2, 1, 1), (2, 3, 1), (3, 1, 2), (4, 1, 5)]
    df = spark.createDataFrame(edges, "src: long, dst: long, w: long")
    got = {
        r["node"]: r["rank_scaled"]
        for r in pagerank(df, weight="w", iters=3).collect()
    }

    scale, dn, dd = 1_000_000, 85, 100
    outw = defaultdict(int)
    for s, d, w in edges:
        outw[s] += w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    r = {n: scale for n in nodes}
    base = scale * (dd - dn) // dd
    for _ in range(3):
        s = defaultdict(int)
        for u, v, w in edges:
            s[v] += (r[u] * w) // outw[u]
        r = {n: base + (dn * s[n]) // dd for n in nodes}
    assert got == r
    # node 4 has no in-edges: teleport-only mass
    assert got[4] == base
