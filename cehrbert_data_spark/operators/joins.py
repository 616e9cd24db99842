"""Join operators: equi, semi/anti, interval (range), as-of, scalar broadcast.

SURVEY.md §2.3. The two named first-class operators the reference composes by
hand everywhere:

* **interval_join** (J6) — point-in-range join, e.g. event datetime within
  [visit_start, visit_end] (reference: utils/spark_utils.py:740-747,
  cohorts/spark_app_base.py:229-242).
* **asof_join** (J7) — interval/theta join then keep the best candidate per
  left row by a metric (earliest start: utils/spark_utils.py:748-752;
  smallest |time gap|: tools/ehrshot_to_omop.py:502-510).

Scale notes: both join on an equality key first (person_id/custkey) so
Catalyst executes a hash/sort-merge join on the key and evaluates the range
predicate as a post-join filter — never a cartesian product. Small right
sides should be passed through ``pyspark.sql.functions.broadcast`` by the
caller when known-small; AQE otherwise converts at runtime.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def semi_filter(df: DataFrame, keys: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J3: keep rows whose key appears in ``keys`` (EXISTS). The reference
    spells this as join-on-distinct-keys (utils/spark_utils.py:902-907);
    ``left_semi`` gives Catalyst the same semantics without a dedup shuffle."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(keys.select(*on).distinct(), on, "left_semi")


def anti_filter(df: DataFrame, keys: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """J4: drop rows whose key appears in ``keys`` (NOT EXISTS)
    (reference: decorators/artificial_time_token_decorator.py:412-416)."""
    on = [on] if isinstance(on, str) else list(on)
    return df.join(keys.select(*on).distinct(), on, "left_anti")


def with_scalar_max(df: DataFrame, col: str, alias: str) -> DataFrame:
    """J5: attach ``max(col)`` to every row without collecting to the driver.

    The reference cross-joins a 1-row aggregate
    (decorators/death_event_decorator.py:38,65) — kept here because the 1-row
    side broadcasts for free; this is the distributed alternative to
    ``collect()[0]`` (utils/spark_utils.py:769), which stalls the driver.
    """
    scalar = df.select(F.max(F.col(col)).alias(alias))
    return df.crossJoin(F.broadcast(scalar))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    point: Column,
    lower: Column,
    upper: Column,
    how: str = "inner",
) -> DataFrame:
    """J6: equi-key + point-in-[lower, upper] join.

    ``point`` references ``left``; ``lower``/``upper`` reference ``right``.
    The equality key keeps the physical plan a hash/SMJ join; the range
    predicate is evaluated post-match (no cartesian explosion).
    """
    on = [on] if isinstance(on, str) else list(on)
    cond = None
    for k in on:
        eq = left[k] == right[k]
        cond = eq if cond is None else (cond & eq)
    cond = cond & point.between(lower, upper)
    joined = left.join(right, cond, how)
    # De-duplicate the equality key columns (keep the left's).
    for k in on:
        joined = joined.drop(right[k])
    return joined


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    point: Column,
    lower: Column,
    upper: Column,
    metric: Column | Sequence[Column],
    left_key: str | Sequence[str] = None,
    how: str = "inner",
) -> DataFrame:
    """J7: interval join, then rank-1 per left row by ``metric``.

    ``left_key`` identifies a left row uniquely (defaults to ``on`` — pass the
    left PK for correctness when keys repeat). ``metric`` orders candidates;
    ties broken deterministically by appending the metric columns only —
    callers needing total determinism include a unique right column in
    ``metric``.
    """
    on_list = [on] if isinstance(on, str) else list(on)
    lk = left_key if left_key is not None else on_list
    lk = [lk] if isinstance(lk, str) else list(lk)
    metrics = [metric] if isinstance(metric, Column) else list(metric)
    joined = interval_join(left, right, on_list, point, lower, upper, how)
    w = Window.partitionBy(*[F.col(c) for c in lk]).orderBy(*metrics)
    return (
        joined.withColumn("__asof_rank", F.row_number().over(w))
        .where(F.col("__asof_rank") == 1)
        .drop("__asof_rank")
    )
