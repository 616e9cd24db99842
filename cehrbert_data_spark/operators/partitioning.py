"""Partition-width hygiene for fan-out operators.

Operators that explode a row into many (shingles, per-word, per-dimension
rows) inherit the INPUT's partitioning: a small parquet file arrives as one
partition, so the entire fan-out and everything map-side after it runs on a
single core no matter how wide the cluster is. At 100 TB the input is
already thousands of partitions and widening is a no-op; the guard below
only pays the (tiny pre-explode) shuffle when the input is narrower than the
session's parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_fanout(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition up to the session default parallelism iff the plan is
    narrower — cheap on small inputs (shuffles pre-explode rows), no-op on
    inputs that are already wide."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
