"""Distributed k-means (operators/clustering.py): partition/determinism
contracts, the trained-codebook IVF path, and the registry entry.

The cross-engine value semantics are pinned by the ml_kmeans oracle entry
(generated MATERIALIZED-CTE chain) and the pure-Python differential in
test_differential_random.py; these tests pin the operator-level contracts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.clustering import kmeans_fit, kmeans_summary


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.mark.slow
def test_kmeans_partitions_input_and_is_deterministic(spark, emb):
    n = emb.count()
    s1 = {r["cid"]: (r["n_members"], r["inertia"])
          for r in kmeans_summary(emb, "vec_id", "embedding", k=8, n_iter=3).collect()}
    assert sorted(s1) == list(range(8))  # every cluster non-empty here
    assert sum(m for m, _ in s1.values()) == n  # exact partition of the input
    # layout independence: 1 vs 16 upstream partitions, same result
    s2 = {r["cid"]: (r["n_members"], r["inertia"])
          for r in kmeans_summary(
              emb.repartition(16), "vec_id", "embedding", k=8, n_iter=3
          ).collect()}
    assert s1 == s2


def test_kmeans_fit_shapes(spark, emb):
    cents = kmeans_fit(emb, "vec_id", "embedding", k=5, n_iter=2).collect()
    assert sorted(r["cid"] for r in cents) == list(range(5))
    dim = len(emb.select("embedding").first()["embedding"])
    assert all(len(r["cvec"]) == dim for r in cents)


def test_ivf_topk_with_trained_codebook(spark, emb):
    from cehrbert_data_spark.operators.similarity import cosine_topk, ivf_topk

    codebook = kmeans_fit(emb, "vec_id", "embedding", k=8, n_iter=2)
    got = ivf_topk(emb, "vec_id", "embedding", k=3, nprobe=2, codebook=codebook)
    rows = got.collect()
    assert rows, "trained-codebook IVF returned nothing"
    per_q: dict[int, list[int]] = {}
    for r in rows:
        per_q.setdefault(r["q_id"], []).append(r["rank"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per_q.values())
    # every reported neighbor's cosine must equal the exact cosine (IVF
    # approximates RECALL, never the reported scores)
    exact = {
        (r["q_id"], r["n_id"]): r["cosine"]
        for r in cosine_topk(emb, emb, "vec_id", "embedding", k=500).collect()
    }
    for r in rows:
        assert r["cosine"] == pytest.approx(exact[(r["q_id"], r["n_id"])], abs=0)


def test_ml_kmeans_registry_entry(spark):
    from cehrbert_data_spark.queries import all_queries
    from cehrbert_data_spark.queries.llm import ML_KMEANS_SQL

    assert "ml_kmeans" in all_queries()
    assert "MATERIALIZED" in ML_KMEANS_SQL  # the PageRank-oracle lesson


@pytest.mark.slow
def test_kmeans_exact_mean_guard_raises_past_2_53(spark):
    # round-9 verdict nit: the floor-quantized centroid mean is exact only
    # while |per-cluster component sum| < 2^53; the guard must RAISE there
    # instead of silently degrading. 6.1M identical 1-dim vectors at value
    # 1.5e6 quantize (x1000) to 1.5e9 each -> sum 9.15e15 > 2^53 (9.007e15),
    # while every intermediate (inorm2 = 2.25e18, dist2 terms) stays inside
    # BIGINT, so the ONLY failure is the one under test.
    n = 6_100_000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.5e6)).cast("array<double>").alias("embedding"),
    )
    with pytest.raises(Exception, match="kmeans_fit"):
        kmeans_fit(df, "vec_id", "embedding", k=1, n_iter=1).collect()
    # just inside the bound (6.0M rows -> sum 9.0e15 < 2^53): must succeed
    ok = spark.range(6_000_000).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.5e6)).cast("array<double>").alias("embedding"),
    )
    cents = kmeans_fit(ok, "vec_id", "embedding", k=1, n_iter=1).collect()
    assert cents[0]["cvec"] == [1_500_000_000]
