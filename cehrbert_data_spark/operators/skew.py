"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these explicit operators cover the two places AQE can't:
broadcast-ineligible skewed joins where one hot key dominates a partition,
and high-cardinality aggregations whose hot groups bottleneck single
reducers (the reference's hazard shape: a few patients with 100k+ events).

Salting contract: results are identical to the unsalted operator — the salt
only changes the physical key distribution.

Measured boundaries (r11 zipf rung, SWEEP_SKEW_r11.json — one key owning
1%/10%/50% of 150M orders / 100M events, outputs checksum-identical at
every point):

* ``salted_join`` vs plain + AQE: AQE wins at 1% and 50% hotness, the
  salt wins at 10% — AQE's runtime split is the correct FIRST line for
  equi-joins; reach for the salt only where AQE's thresholds miss.
* ``salted_count`` vs plain ``groupBy().count()``: plain wins at every
  hotness (map-side partial aggregation already spreads combinable
  aggregates) — exactly the boundary the docstring below states. The
  pattern matters for NON-combinable aggregates only.
* The skew shape AQE can never fix is a window over the hot key — for
  those, use ``joins.asof_join_union(salt_bucket_seconds=...)`` (2.4×
  at 50% hotness, SLOWER below the crossover) or the always-flat
  ``windows.top1_per_group_agg`` for single-direction rank-1.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``num_salts``
    buckets and the right side replicated ``num_salts``× (explode of a
    sequence — no driver loop). Use when the LEFT side is large and skewed
    and the right side is too big to broadcast but small enough to
    replicate ``num_salts``×."""
    on = [on] if isinstance(on, str) else list(on)
    left_salted = left.withColumn(
        "__salt", (F.rand(seed=42) * num_salts).cast("int")
    )
    right_salted = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    joined = left_salted.join(right_salted, on + ["__salt"], how)
    return joined.drop("__salt")


def salted_count(
    df: DataFrame,
    keys: Sequence[str],
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase count for skewed group keys: partial count per (keys, salt),
    then final sum per keys. Identical result to ``groupBy(keys).count()``;
    the hot key's rows spread over ``num_salts`` reducers in phase one.

    (For built-in aggregates Spark's map-side partial aggregation usually
    makes this unnecessary — the pattern matters for aggregates without
    partial pushdown, e.g. exact ``collect_list`` pipelines.)
    """
    keys = list(keys)
    partial = (
        df.withColumn("__salt", (F.rand(seed=42) * num_salts).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("count"))
