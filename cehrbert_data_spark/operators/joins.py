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
    strategy: str = "window",
) -> DataFrame:
    """J7: interval join, then rank-1 per left row by ``metric``.

    ``left_key`` identifies a left row uniquely (defaults to ``on`` — pass the
    left PK for correctness when keys repeat). ``metric`` orders candidates;
    ties broken deterministically by appending the metric columns only —
    callers needing total determinism include a unique right column in
    ``metric``.

    ``strategy`` (r11, guide §2.3 "aggregate before you shuffle"):

    * ``"window"`` (default) — row_number over the candidate fan-out, then
      keep rank 1. Every candidate pair crosses the rank exchange and the
      hottest left key funnels through one reducer's sort.
    * ``"agg"`` — elect the winner by ``min(struct(metrics…, payload))``
      partial aggregation (the relink/o2 promotion applied to the as-of):
      each map task keeps ONE candidate per left key before the shuffle, so
      the exchange carries ~|left| rows instead of Σ|candidates|, and a hot
      key stays spread across map tasks (the skew shape AQE cannot split —
      it only rewrites joins). Restrictions, asserted: ``how='inner'``,
      every ``metric`` is a plain column NAME (election is ascending
      min(struct); pass the window form for mixed/desc orderings), and the
      metric columns must be non-null on candidates (NULL field ordering in
      struct min differs from the window's NULLS FIRST). Rows identical to
      the window form whenever (metrics…) is a total order within each left
      key — the same precondition a deterministic rank 1 already requires.
    """
    on_list = [on] if isinstance(on, str) else list(on)
    lk = left_key if left_key is not None else on_list
    lk = [lk] if isinstance(lk, str) else list(lk)
    joined = interval_join(left, right, on_list, point, lower, upper, how)
    if strategy == "agg":
        if how != "inner":
            raise ValueError("asof_join(strategy='agg') requires how='inner'")
        metric_names = [metric] if isinstance(metric, str) else list(metric)
        bad = [m for m in metric_names if not isinstance(m, str)]
        if bad:
            raise ValueError(
                "asof_join(strategy='agg') needs metric column NAMES "
                f"(ascending election); got {bad}"
            )
        from cehrbert_data_spark.operators.windows import top1_per_group_agg

        return top1_per_group_agg(joined, lk, metric_names)
    if strategy != "window":
        raise ValueError(f"unknown asof strategy {strategy!r}")
    metrics = [metric] if isinstance(metric, Column) else list(metric)
    w = Window.partitionBy(*[F.col(c) for c in lk]).orderBy(*metrics)
    return (
        joined.withColumn("__asof_rank", F.row_number().over(w))
        .where(F.col("__asof_rank") == 1)
        .drop("__asof_rank")
    )


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    how: str = "inner",
    tiebreak: str | None = None,
    salt_bucket_seconds: int | None = None,
) -> DataFrame:
    """J7 (merge form): for each left row, the LAST right row at-or-before
    its timestamp — computed as a union + one window, with NO join fan-out.

    The windowed form (:func:`asof_join`) materializes every candidate pair
    before ranking; with a long lookback its intermediate is
    Σ|candidates per left row|. This form tags the two inputs, unions them,
    and carries each key's most recent right payload forward with a single
    ``last(ignorenulls)`` running window — cost is one shuffle + sort of
    |left|+|right| regardless of match density, the shape that survives an
    unbounded lookback at 100 TB (the streaming as-of operator's batch dual,
    streaming/operators.py merge_asof).

    ``right``'s non-key columns must not collide with ``left``'s. At
    (key, ts) ties, rights sort before lefts (at-or-before is inclusive).
    Among right rows tied on (key, ts), the winner is the greatest
    ``tiebreak`` value when given (pass a unique right column — e.g. its PK
    — for total determinism); without ``tiebreak`` the greatest payload
    STRUCT wins, which is deterministic only if the first projected right
    column is unique within ties.

    NULL timestamps never participate: right rows with NULL ``right_ts``
    are dropped (a row with no time cannot be "at or before" anything), and
    left rows with NULL ``left_ts`` are dropped under ``how='inner'`` /
    kept with NULL right columns under ``how='left'``.
    ``how='left'`` keeps unmatched left rows with NULL right columns.

    **Skew hardening** (``salt_bucket_seconds``): the plain form windows
    over the key alone, so one pathological key (a person with millions of
    visits) serializes a single task. With ``salt_bucket_seconds`` set, the
    running window is SEGMENTED by epoch time-bucket: a local window runs
    per (key, bucket) — the largest task is bounded by the busiest (key,
    bucket), not the busiest key — and cross-bucket carry-in is resolved on
    the per-(key, bucket) summary table (one row per key×bucket: the
    bucket's latest right payload, prefix-max'd over earlier buckets and
    joined back on the SAME (key, bucket) partitioning). Results are
    IDENTICAL to the unsalted form (test-pinned); pick a bucket near the
    key's typical event spread (e.g. 30 days) so buckets stay balanced.

    Measured dial (r11, SWEEP_SKEW_r11.json — 100M events, one hot user):
    plain 5.3/8.5/30.9 s at 1%/10%/50% hotness vs salted 19.0/18.1/13.0 s.
    The plain wall grows with the hot key, the salted wall is flat, and
    the crossover sits between 10% and 50%: below it the segmented form's
    3 shuffles cost more than the straggler they remove. A DIAL for
    genuinely monstrous keys, not a default.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"asof_join_union supports inner/left, got {how!r}")
    on_list = [on] if isinstance(on, str) else list(on)
    # NULL-ts guard (see docstring): a NULL-ts right row would sort first
    # (ascending nulls-first) and its payload would be carried into every
    # left row with no genuine match — even under how='inner'.
    null_ts_left = left.where(F.col(left_ts).isNull()) if how == "left" else None
    left = left.where(F.col(left_ts).isNotNull())
    right = right.where(F.col(right_ts).isNotNull())
    right_value_cols = [
        c for c in right.columns if c not in on_list and c != right_ts
    ]
    r_struct = F.struct(
        *[F.col(c) for c in right_value_cols], F.col(right_ts).alias("__r_ts")
    )
    left_value_cols = [
        c for c in left.columns if c not in on_list and c != left_ts
    ]

    if tiebreak is not None and tiebreak not in right.columns:
        raise ValueError(f"tiebreak {tiebreak!r} is not a column of right")
    tb_right = F.col(tiebreak) if tiebreak is not None else F.lit(0)
    tagged_left = left.select(
        *[F.col(c) for c in on_list],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left_value_cols]).alias("__l"),
        F.lit(None).alias("__r_pre"),
        F.lit(None).alias("__tb_pre"),
    )
    tagged_right = right.select(
        *[F.col(c) for c in on_list],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).alias("__l_pre"),
        r_struct.alias("__r"),
        tb_right.alias("__tb"),
    )
    # align the null placeholders to the other side's types
    tagged_left = (
        tagged_left.withColumn(
            "__r", F.col("__r_pre").cast(dict(tagged_right.dtypes)["__r"])
        )
        .withColumn("__tb", F.col("__tb_pre").cast(dict(tagged_right.dtypes)["__tb"]))
        .drop("__r_pre", "__tb_pre")
    )
    tagged_right = tagged_right.withColumn(
        "__l", F.col("__l_pre").cast(dict(tagged_left.dtypes)["__l"])
    ).drop("__l_pre")

    unioned = tagged_left.select("*").unionByName(
        tagged_right.select(tagged_left.columns)
    )
    if salt_bucket_seconds is None:
        w = (
            Window.partitionBy(*on_list)
            .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__tb"), F.col("__r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(
            "__carried", F.last("__r", ignorenulls=True).over(w)
        ).where(F.col("__is_left") == 1)
    else:
        # Segmented running window: local pass per (key, time-bucket), then
        # cross-bucket carry-in off the tiny per-(key, bucket) summary.
        unioned = unioned.withColumn(
            "__b",
            F.floor(
                F.unix_timestamp(F.col("__ts").cast("timestamp"))
                / F.lit(salt_bucket_seconds)
            ),
        )
        w_local = (
            Window.partitionBy(*on_list, "__b")
            .orderBy(F.col("__ts"), F.col("__is_left"), F.col("__tb"), F.col("__r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = unioned.withColumn(
            "__local", F.last("__r", ignorenulls=True).over(w_local)
        )
        # Latest right payload per (key, bucket): max of struct(ts, tb, r)
        # is exactly the window's (ts, tb, r) ordering among right rows
        # (left rows carry no payload, so __is_left never discriminates).
        # Physical shape (plan-pinned in tests/test_plan_shapes): Catalyst
        # prunes the window out of this branch entirely and pushes a
        # PARTIAL aggregate below its exchange, so the big data shuffles
        # exactly once (the window's own exchange) — the finals branch
        # re-scans the pruned sources but moves only one row per
        # (key, bucket) per mapper, and the carry table broadcasts into
        # the final join (no reshuffle of the windowed rows). Buckets with
        # only left rows still appear (their carry-in comes wholly from
        # earlier buckets), hence the null-safe max over the full union.
        finals = local.groupBy(*on_list, "__b").agg(
            F.max(
                F.when(
                    F.col("__is_left") == 0,
                    F.struct(F.col("__ts"), F.col("__tb"), F.col("__r")),
                )
            ).alias("__fin")
        )
        w_carry = (
            Window.partitionBy(*on_list)
            .orderBy("__b")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = finals.withColumn("__in", F.max("__fin").over(w_carry)).select(
            *on_list, "__b", F.col("__in.__r").alias("__carry_in")
        )
        carried = (
            local.join(carry, on_list + ["__b"])
            .withColumn("__carried", F.coalesce(F.col("__local"), F.col("__carry_in")))
            .where(F.col("__is_left") == 1)
        )
    if how == "inner":
        carried = carried.where(F.col("__carried").isNotNull())
    out = carried.select(
        *[F.col(c) for c in on_list],
        F.col("__ts").alias(left_ts),
        *[F.col(f"__l.{c}").alias(c) for c in left_value_cols],
        *[F.col(f"__carried.{c}").alias(c) for c in right_value_cols],
        F.col("__carried.__r_ts").alias(right_ts),
    )
    if null_ts_left is not None:
        nulls = null_ts_left.select(
            *[F.col(c) for c in on_list],
            F.col(left_ts),
            *[F.col(c) for c in left_value_cols],
            *[F.lit(None).cast(dict(out.dtypes)[c]).alias(c) for c in right_value_cols],
            F.lit(None).cast(dict(out.dtypes)[right_ts]).alias(right_ts),
        )
        out = out.unionByName(nulls)
    return out


def overlap_join_buckets(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_seconds: int = 7 * 24 * 3600,
    extra_condition: Column | None = None,
) -> DataFrame:
    """Interval-OVERLAP join with NO selective equality key, made
    hash-joinable by epoch bucketing (beyond-ref; the shape
    :func:`interval_join` cannot serve when no key carries selectivity).

    Each interval explodes to the epoch buckets it covers; the join is a
    plain equi-join on bucket id plus the exact overlap predicate. A pair
    sharing several buckets is emitted EXACTLY once — it is credited only
    in the bucket containing the overlap's start (max of the two starts) —
    so no distinct/dedup shuffle follows the join. Cost is
    Σ_bucket |left_b|·|right_b|: pick ``bucket_seconds`` near the typical
    interval length so intervals explode to ~2 buckets and bucket
    populations stay balanced. Column names must be disjoint across inputs.

    Malformed intervals (NULL endpoints, or end < start) are EXCLUDED on
    both sides before bucketing: ``F.sequence(b_lo, b_hi)`` with b_hi < b_lo
    would still explode (descending), and the exactly-once credit-bucket
    proof assumes start <= end — such rows would otherwise join in some
    buckets and be silently dropped by the credit filter in others.
    """
    def _epoch(col: str) -> Column:
        return F.unix_timestamp(F.col(col).cast("timestamp"))

    def _bucketed(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        well_formed = (
            F.col(start).isNotNull()
            & F.col(end).isNotNull()
            & (_epoch(start) <= _epoch(end))
        )
        b_lo = F.floor(_epoch(start) / bucket_seconds)
        b_hi = F.floor(_epoch(end) / bucket_seconds)
        return df.where(well_formed).withColumn(
            f"__{side}_bucket", F.explode(F.sequence(b_lo, b_hi))
        )

    l = _bucketed(left, left_start, left_end, "l")
    r = _bucketed(right, right_start, right_end, "r")
    credit_bucket = F.floor(
        F.greatest(_epoch(left_start), _epoch(right_start)) / bucket_seconds
    )
    cond = (
        (F.col("__l_bucket") == F.col("__r_bucket"))
        & (_epoch(left_start) <= _epoch(right_end))
        & (_epoch(right_start) <= _epoch(left_end))
        & (F.col("__l_bucket") == credit_bucket)
    )
    if extra_condition is not None:
        cond = cond & extra_condition
    return l.join(r, cond).drop("__l_bucket", "__r_bucket")
