"""Distributed k-means over embedding columns — the codebook trainer the
IVF ANN path wants at scale (beyond-ref; ``similarity.ivf_assign``'s
deterministic id-mod codebook is honest about being untrained — this is
the training step, built so the result is bit-identical across engines).

Design for cross-engine determinism (the property every operator here
shares): all arithmetic is exact.

* vectors quantize to integers once (``similarity.quantize``, ×1000);
* distances are exact squared L2 in BIGINT:
  ``|x|² + |c|² − 2⟨x,c⟩`` from integer norms and dot products;
* assignment ties break on centroid id;
* centroid updates floor-quantize the component mean back to BIGINT
  (``FLOOR(sum/count)`` — sums of quantized components stay well inside
  exact-double range, so both engines floor the same value);
* init is the k vectors with the smallest ``(md5(id), id)`` — a
  deterministic pseudo-random sample reproducible in any engine.

Fixed-iteration Lloyd's (no data-dependent convergence test, so the
oracle can mirror it as a finite CTE chain). At scale each iteration is
one broadcast-join assignment pass (centroids are k×d — tiny) and one
(cid, dim)-grain aggregation: the corpus never shuffles on anything wider
than its exploded components, and the k×d centroid table is the only
thing that crosses iterations (localCheckpoint barrier keeps the plan
from growing with the iteration count — same pattern as
``operators/closure.py``'s PageRank).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.similarity import int_dot, with_quantized_norm
from cehrbert_data_spark.operators.text import md5_long


def _norm2(vec_col):
    return int_dot(F.col(vec_col), F.col(vec_col))


def kmeans_fit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Train a k-centroid codebook; returns (cid, cvec) with cvec a
    BIGINT-quantized array. See module docstring for the determinism
    contract. ``n_iter`` is fixed (no early stop) so any engine replays
    the identical computation."""
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    q = with_quantized_norm(df, vec_col).select(
        F.col(id_col).alias("id"), "ivec", "inorm2"
    )
    hw = Window.orderBy(md5_long(F.col("id").cast("string")), F.col("id"))
    # k rows — the global window runs on a k-bounded sorted sample, not the
    # corpus: take the k smallest (hash, id) pairs per partition first, so
    # only ~k×partitions rows reach the single-partition ranking
    pw = Window.partitionBy(F.spark_partition_id()).orderBy(
        md5_long(F.col("id").cast("string")), F.col("id")
    )
    seeds = (
        q.withColumn("__pr", F.row_number().over(pw))
        .where(F.col("__pr") <= k)
        .withColumn("__r", F.row_number().over(hw))
        .where(F.col("__r") <= k)
        .select((F.col("__r") - 1).cast("long").alias("cid"), F.col("ivec").alias("cvec"))
    )
    centroids = checkpoint_barrier(seeds)
    for _ in range(n_iter):
        assigned = _assign(q, centroids)
        comp = (
            assigned.select("cid", F.posexplode("ivec").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cid", "pos",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("m"),
            )
        )
        new = comp.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cvec")
        )
        # empty clusters keep their previous centroid
        centroids = checkpoint_barrier(
            centroids.select("cid", F.col("cvec").alias("prev"))
            .join(new, "cid", "left")
            .select("cid", F.coalesce("cvec", "prev").alias("cvec"))
        )
    return centroids


def _assign(q: DataFrame, centroids: DataFrame) -> DataFrame:
    """One Lloyd assignment pass: nearest centroid by exact squared L2,
    ties to the lowest cid. Broadcast-join — the corpus never shuffles."""
    c = centroids.select(
        "cid", "cvec", _norm2("cvec").alias("cnorm2")
    )
    dist2 = (
        F.col("inorm2") + F.col("cnorm2")
        - 2 * int_dot(F.col("ivec"), F.col("cvec"))
    )
    scored = q.crossJoin(F.broadcast(c)).select(
        "id", "ivec", "inorm2", "cid", dist2.alias("dist2")
    )
    w = Window.partitionBy("id").orderBy("dist2", "cid")
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def kmeans_summary(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    n_iter: int = 3,
) -> DataFrame:
    """Report-grain k-means result: per cluster (cid, n_members, inertia)
    after ``n_iter`` Lloyd iterations — inertia is the exact BIGINT sum of
    squared L2 distances to the final centroid (the battery/oracle surface;
    array-typed centroids don't hash cross-engine, cluster stats do)."""
    q = with_quantized_norm(df, vec_col).select(
        F.col(id_col).alias("id"), "ivec", "inorm2"
    )
    final = _assign(q, kmeans_fit(df, id_col, vec_col, k=k, n_iter=n_iter))
    return final.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("dist2").alias("inertia"),
    )
