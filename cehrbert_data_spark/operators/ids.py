"""Distributed id assignment without single-partition windows.

The reference assigns global ids with ``dense_rank()`` over an unpartitioned
window (cohorts/spark_app_base.py:507) or ``monotonically_increasing_id``
plus a checkpoint (tools/ehrshot_to_omop.py:488-494). The global window
shuffles the entire dataset to ONE partition — the engine's worst scale
hazard at 100 TB. These helpers provide the same observable contracts
(dense 1..N ids; "new ids > max existing id") with distributed plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def monotonic_ids(df: DataFrame, out: str = "id", start: int = 0) -> DataFrame:
    """Unique (not dense) ids, fully parallel. Checkpoint before reuse —
    ``monotonically_increasing_id`` is plan-nondeterministic."""
    return df.withColumn(out, F.monotonically_increasing_id() + F.lit(start)).localCheckpoint(
        eager=True
    )


def dense_ids(df: DataFrame, order_by: list[Column], out: str = "id", start: int = 1) -> DataFrame:
    """Dense sequential ids 1..N in ``order_by`` order without a
    single-partition window and without routing rows through Python.

    Pure-DataFrame two-pass prefix-sum:
      1. range-partition + sort-within-partitions on ``order_by`` (the one
         full shuffle — identical to what any global sort pays), then stamp
         ``monotonically_increasing_id`` whose layout is documented as
         ``partition_id << 33 | row_in_partition`` and checkpoint to pin its
         nondeterminism;
      2. per-partition row counts (tiny agg: one row per partition) →
         driver-side prefix sums → broadcast-joined offsets.

    ``id = start + offset[partition] + row_in_partition`` — dense, ordered,
    fully JVM-side. Scales: the offset table is O(num_partitions), never the
    data.

    Durability: the staged frame must be checkpointed (the stamped ``__mid``
    is plan-nondeterministic). When a reliable checkpoint directory is
    configured (``spark.sparkContext.setCheckpointDir``) it is used, so the
    materialized blocks survive executor loss — set one on a real cluster.
    Otherwise ``localCheckpoint`` stores blocks in executor memory/disk:
    faster, but an executor loss after lineage truncation makes the staged
    data unrecoverable, and the blocks stay pinned until the returned
    DataFrame is garbage-collected driver-side (ContextCleaner unpersists
    them then).
    """
    spark = df.sparkSession
    staged = (
        df.repartitionByRange(*order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("__mid", F.monotonically_increasing_id())
    )
    try:
        reliable = spark.sparkContext.getCheckpointDir() is not None
    except Exception:
        reliable = False
    staged = staged.checkpoint(eager=True) if reliable else staged.localCheckpoint(eager=True)
    counts = (
        staged.groupBy(F.shiftright(F.col("__mid"), 33).alias("__pid"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .collect()
    )
    offsets, acc = [], 0
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], acc))
        acc += row["__cnt"]
    offs_df = spark.createDataFrame(offsets, "__pid long, __off long")
    local_idx = F.col("__mid").bitwiseAND(F.lit((1 << 33) - 1))
    return (
        staged.withColumn("__pid", F.shiftright(F.col("__mid"), 33))
        .join(F.broadcast(offs_df), "__pid")
        .withColumn(out, (F.lit(start) + F.col("__off") + local_idx).cast("long"))
        .drop("__pid", "__off", "__mid")
    )


def ids_above_max(df: DataFrame, existing: DataFrame, id_col: str, out: str) -> DataFrame:
    """Mint ids strictly greater than ``max(existing[id_col])`` (the
    artificial-visit contract, reference: utils/spark_utils.py:662-825):
    rank new rows with a hash-partitioned window when a natural partition
    exists, else monotonic ids offset by the broadcast max."""
    max_df = existing.select(F.max(F.col(id_col)).alias("__max_id"))
    with_max = df.crossJoin(F.broadcast(max_df))
    return (
        with_max.withColumn(out, F.monotonically_increasing_id() + F.col("__max_id") + 1)
        .drop("__max_id")
        .localCheckpoint(eager=True)
    )
