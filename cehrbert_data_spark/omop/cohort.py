"""D8 — templated-SQL cohort framework.

The user-facing surface is the reference's (QuerySpec / AncestorTableSpec /
QueryBuilder — cohorts/query_builder.py:25-153): users write Spark SQL
templates against registered temp views. The builders are re-expressed as
composable functions over DataFrames instead of a stateful class pipeline,
and views are registered in the SESSION catalog (not global_temp) so parallel
builds don't collide.

Semantics sources:
  base cohort   — cohorts/spark_app_base.py:89-273 (dependency views →
                  ancestor tables → dependency/entry/negative/main/post
                  queries → observation-period interval join → demographics)
  labeled join  — cohorts/spark_app_base.py:421-608 (exclusions, bounded/
                  unbounded outcome window, dedup, single contribution,
                  MEDS renames, time_to_event)

Scale note: cohort_member_id keeps the reference's dense_rank contract
(dense 1..N over (person_id, index_date, visit_occurrence_id) order) but the
ids come from the distributed two-pass ranker in operators.ids by DEFAULT —
the reference's unpartitioned window (spark_app_base.py:507) shuffles every
cohort row to ONE partition and is opt-in only
(``global_window_member_ids=True``, id-parity pinned by
tests/test_omop_cohort.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cehrbert_data_spark.sources.writers import checkpoint_barrier

ENTRY_COHORT = "entry_cohort"
NEGATIVE_COHORT = "negative_cohort"

COHORT_REQUIRED_COLUMNS = ["person_id", "index_date", "visit_occurrence_id"]


@dataclass(frozen=True)
class QuerySpec:
    """A templated Spark-SQL query materialized as a named view
    (reference: cohorts/query_builder.py:25-31)."""

    table_name: str
    query_template: str
    parameters: dict = field(default_factory=dict)

    def render(self) -> str:
        return self.query_template.format(**self.parameters)


@dataclass(frozen=True)
class AncestorTableSpec:
    """Seed concepts whose descendants materialize as a view
    (reference: cohorts/query_builder.py:34-44). ``is_standard`` picks the
    closure table (R2) over the iterative BFS (R1)."""

    table_name: str
    ancestor_concept_ids: list[int]
    is_standard: bool


@dataclass(frozen=True)
class QueryBuilder:
    """Declarative cohort definition (reference: query_builder.py:47-153)."""

    cohort_name: str
    dependency_list: list[str]
    query: QuerySpec
    negative_query: QuerySpec | None = None
    entry_cohort_query: QuerySpec | None = None
    dependency_queries: list[QuerySpec] | None = None
    post_queries: list[QuerySpec] | None = None
    ancestor_table_specs: list[AncestorTableSpec] | None = None


def validate_cohort(cohort: DataFrame) -> DataFrame:
    """Required-column assertion (reference: spark_app_base.py:44-65)."""
    for col in COHORT_REQUIRED_COLUMNS:
        if col not in cohort.columns:
            raise AssertionError(f"{col} is a required column in the cohort")
    return cohort


def register_cohort_view(df: DataFrame, name: str) -> None:
    """Register a cohort dependency/intermediate view under BOTH the session
    catalog and ``global_temp``.

    The reference registers everything globally
    (spark_app_base.py:68-74 ``createOrReplaceGlobalTempView``) and all of
    its shipped cohort SQL says ``global_temp.x``
    (e.g. cohorts/heart_failure.py:104-146), while this engine's own
    templates use session views so parallel builds in one JVM don't collide.
    Dual registration lets a reference cohort template run VERBATIM while
    keeping the session-scoped behavior for the in-repo library."""
    df.createOrReplaceTempView(name)
    df.createOrReplaceGlobalTempView(name)


def create_cohort(
    spark: SparkSession,
    builder: QueryBuilder,
    tables: dict[str, DataFrame],
    ancestor_table_fn: Callable[[AncestorTableSpec], DataFrame] | None = None,
) -> DataFrame:
    """Materialize a QueryBuilder: register dependency views, run ancestor /
    dependency / entry / negative / main / post queries in order
    (reference: spark_app_base.py:146-192). ``tables`` supplies the
    dependency DataFrames (replacing the reference's folder reads)."""
    for name in builder.dependency_list:
        register_cohort_view(tables[name], name)

    if builder.ancestor_table_specs:
        if ancestor_table_fn is None:
            raise ValueError("ancestor_table_specs given but no ancestor_table_fn")
        for spec in builder.ancestor_table_specs:
            register_cohort_view(ancestor_table_fn(spec), spec.table_name)

    for spec_list in (builder.dependency_queries, ):
        for spec in spec_list or []:
            # Dependency views are consumed by SEVERAL downstream queries
            # (main + negative + entry, then again per prediction pipeline);
            # a lazy temp view re-expands the whole subtree in every
            # consumer — measured 302 shuffle exchanges for t2dm_hf vs ~92
            # for single-consumer cohorts. Materializing once behind a
            # checkpoint collapses the repeated lineage (and at scale stops
            # the heavy ancestry/intermediate SQL recomputing 3-5×).
            register_cohort_view(
                checkpoint_barrier(spark.sql(spec.render())), spec.table_name
            )
    if builder.entry_cohort_query:
        register_cohort_view(
            spark.sql(builder.entry_cohort_query.render()),
            builder.entry_cohort_query.table_name,
        )
    if builder.negative_query:
        register_cohort_view(
            spark.sql(builder.negative_query.render()),
            builder.negative_query.table_name,
        )

    cohort = spark.sql(builder.query.render())
    register_cohort_view(cohort, builder.query.table_name)
    for spec in builder.post_queries or []:
        cohort = spark.sql(spec.render())
        register_cohort_view(cohort, builder.query.table_name)
    return validate_cohort(cohort)


def apply_observation_period(
    cohort: DataFrame,
    observation_period: DataFrame,
    prior_days: int,
    post_days: int,
) -> DataFrame:
    """Keep members whose observation period covers
    [index−prior, index+post] (reference: spark_app_base.py:229-242) — an
    interval join on person_id."""
    op = observation_period.select(
        F.col("person_id").alias("__op_person_id"),
        "observation_period_start_date",
        "observation_period_end_date",
    )
    joined = cohort.join(
        op,
        (cohort["person_id"] == op["__op_person_id"])
        & (
            F.expr(f"index_date - INTERVAL {prior_days} DAY")
            >= F.col("observation_period_start_date")
        )
        & (
            F.expr(f"index_date + INTERVAL {post_days} DAY")
            <= F.col("observation_period_end_date")
        ),
    )
    return joined.select(cohort.columns)


def add_demographics(cohort: DataFrame, person: DataFrame) -> DataFrame:
    """Attach age/gender/race at index (reference: spark_app_base.py:248-262)."""
    return validate_cohort(
        cohort.join(person, "person_id")
        .withColumn(
            "year_of_birth", F.coalesce(F.year("birth_datetime"), F.col("year_of_birth"))
        )
        .withColumn("age", F.year("index_date") - F.col("year_of_birth"))
        .select(
            "person_id", "age", "gender_concept_id", "race_concept_id",
            "index_date", "visit_occurrence_id",
        )
        .distinct()
    )


def build_base_cohort(
    spark: SparkSession,
    builder: QueryBuilder,
    tables: dict[str, DataFrame],
    age_lower_bound: int,
    age_upper_bound: int,
    date_lower_bound: str,
    date_upper_bound: str,
    prior_observation_period: int = 0,
    post_observation_period: int = 0,
    ancestor_table_fn=None,
) -> DataFrame:
    """The full BaseCohortBuilder.build() flow (spark_app_base.py:194-213)."""
    cohort = create_cohort(spark, builder, tables, ancestor_table_fn)
    cohort = apply_observation_period(
        cohort, tables["observation_period"], prior_observation_period, post_observation_period
    )
    cohort = add_demographics(cohort, tables["person"])
    return cohort.where(
        F.col("age").between(age_lower_bound, age_upper_bound)
    ).where(F.col("index_date").between(F.lit(date_lower_bound), F.lit(date_upper_bound)))


def label_cohort(
    target_cohort: DataFrame,
    outcome_cohort: DataFrame,
    observation_period: DataFrame,
    prediction_start_days: int = 0,
    prediction_window: int = 30,
    prediction_window_unbounded: bool = False,
    entry_cohort: DataFrame | None = None,
    negative_cohort: DataFrame | None = None,
    remove_index_prediction_starts: bool = False,
    single_contribution: bool = False,
    global_window_member_ids: bool = False,
) -> DataFrame:
    """NestedCohortBuilder.build() label semantics
    (reference: spark_app_base.py:421-529), as DataFrame ops:

      1. optional exclusions (first-time outcome via entry cohort,
         questionable outcomes, outcomes inside the washout window);
      2. left join outcomes in [index+ps, index+pw] (bounded requires the
         observation period to cover the window) or [index+ps, ∞);
      3. label = outcome present; dense cohort_member_id; keep one row per
         index date (positive label wins); optional single contribution per
         person (most recent positive, else most recent negative).
    """
    t = target_cohort

    if entry_cohort is not None:
        prior = entry_cohort.select(F.col("person_id"), F.col("index_date").alias("__e_index"))
        t = (
            t.join(
                prior,
                (t["person_id"] == prior["person_id"])
                & (
                    F.expr(f"index_date + INTERVAL {prediction_start_days} DAY")
                    > F.col("__e_index")
                ),
                "left_outer",
            )
            .where(prior["person_id"].isNull())
            .select(t.columns)
        )
    if negative_cohort is not None:
        t = t.join(
            negative_cohort.select("person_id").distinct(), "person_id", "left_anti"
        )
    if remove_index_prediction_starts:
        washout = max(prediction_start_days - 1, 0)
        excl = outcome_cohort.select(
            F.col("person_id").alias("__x_person_id"), F.col("index_date").alias("__x_index")
        )
        t = (
            t.join(
                excl,
                (t["person_id"] == F.col("__x_person_id"))
                & F.col("__x_index").between(
                    t["index_date"], F.expr(f"index_date + INTERVAL {washout} DAY")
                ),
                "left_outer",
            )
            .where(F.col("__x_person_id").isNull())
            .select(t.columns)
            .distinct()
        )

    o = outcome_cohort.select(
        F.col("person_id").alias("__o_person_id"), F.col("index_date").alias("outcome_date")
    )
    if prediction_window_unbounded:
        labeled = t.join(
            o,
            (t["person_id"] == F.col("__o_person_id"))
            & (
                F.col("outcome_date")
                >= F.expr(f"index_date + INTERVAL {prediction_start_days} DAY")
            ),
            "left_outer",
        )
    else:
        op = observation_period.select(
            F.col("person_id").alias("__op_person_id"), "observation_period_end_date"
        )
        labeled = (
            t.join(
                op,
                (t["person_id"] == F.col("__op_person_id"))
                & (
                    F.expr(f"index_date + INTERVAL {prediction_window} DAY")
                    <= F.col("observation_period_end_date")
                ),
                "left_outer",
            )
            .join(
                o,
                (t["person_id"] == F.col("__o_person_id"))
                & F.col("outcome_date").between(
                    F.expr(f"index_date + INTERVAL {prediction_start_days} DAY"),
                    F.expr(f"index_date + INTERVAL {prediction_window} DAY"),
                ),
                "left_outer",
            )
            .where(F.col("__op_person_id").isNotNull() | F.col("__o_person_id").isNotNull())
            .drop("__op_person_id", "observation_period_end_date")
        )

    labeled = (
        labeled.withColumn("label", F.col("__o_person_id").isNotNull().cast("int"))
        .drop("__o_person_id")
        .distinct()
    )

    # Dense member ids in (person, index, visit) order — the reference's
    # observable contract (spark_app_base.py:507).
    if global_window_member_ids:
        # Reference-literal path: single-partition shuffle of the whole
        # cohort. Kept only for semantics comparison.
        labeled = labeled.withColumn(
            "cohort_member_id",
            F.dense_rank().over(W.orderBy("person_id", "index_date", "visit_occurrence_id")),
        )
    else:
        # Default scale path: identical ids without the single-partition
        # global window — dense 1..N over the DISTINCT (person, index, visit)
        # triples via the two-pass ranker, joined back null-safely
        # (visit_occurrence_id can be null in visit-less cohorts).
        from cehrbert_data_spark.operators.ids import dense_ids

        member_cols = ["person_id", "index_date", "visit_occurrence_id"]
        triples = labeled.select(*member_cols).distinct()
        ranked = dense_ids(
            triples, [F.col(c) for c in member_cols], out="cohort_member_id"
        )
        cond = None
        for c in member_cols:
            eq = labeled[c].eqNullSafe(ranked[c])
            cond = eq if cond is None else (cond & eq)
        labeled = labeled.join(ranked, cond).drop(*[ranked[c] for c in member_cols])

    # One row per index date; positive label wins (spark_app_base.py:515-520).
    dedup_rank = F.row_number().over(
        W.partitionBy("person_id", "cohort_member_id", "index_date").orderBy(F.desc("label"))
    )
    labeled = labeled.withColumn("__rr", dedup_rank).where("__rr == 1").drop("__rr")

    if single_contribution:
        contribution_rank = F.row_number().over(
            W.partitionBy("person_id").orderBy(F.desc("label"), F.desc("index_date"))
        )
        labeled = labeled.withColumn("__cr", contribution_rank).where("__cr == 1").drop("__cr")
    return labeled


def add_time_to_event(
    cohort: DataFrame,
    observation_period: DataFrame | None,
    prediction_window: int,
    prediction_window_unbounded: bool = False,
    index_date_column: str = "index_date",
    person_id_column: str = "person_id",
) -> DataFrame:
    """study_end_date = outcome, else window end (bounded) or observation end
    (unbounded); time_to_event in days (reference: spark_app_base.py:559-583).

    When the outcome index came from an untyped external table (e.g. the
    ``vent`` table's string ``earliest_placement_instant``), legacy Spark
    widens COALESCE(string, date) to STRING; ANSI mode would instead cast
    the string down to DATE and silently truncate the time component. Follow
    the reference's widening by casting the fallback to string."""

    def _study_end(fallback: F.Column) -> F.Column:
        if dict(cohort.dtypes).get("outcome_date") == "string":
            fallback = fallback.cast("string")
        return F.coalesce(F.col("outcome_date"), fallback)

    if prediction_window_unbounded:
        op = observation_period.select(
            F.col("person_id").alias("__op_pid"), "observation_period_end_date"
        )
        cohort = (
            cohort.join(op, cohort[person_id_column] == F.col("__op_pid"))
            .withColumn(
                "study_end_date",
                _study_end(F.col("observation_period_end_date")),
            )
            .drop("__op_pid", "observation_period_end_date")
        )
    else:
        cohort = cohort.withColumn(
            "study_end_date",
            _study_end(
                F.expr(f"{index_date_column} + INTERVAL {prediction_window} DAYS")
            ),
        )
    return cohort.withColumn("time_to_event", F.datediff("study_end_date", index_date_column))


def to_meds_format(cohort: DataFrame) -> DataFrame:
    """D11 — MEDS renames (reference: spark_app_base.py:544-557)."""
    return (
        cohort.withColumnRenamed("person_id", "subject_id")
        .withColumnRenamed("index_date", "prediction_time")
        .withColumnRenamed("label", "boolean_value")
        .withColumn("prediction_time", F.to_timestamp("prediction_time"))
        .withColumn("boolean_value", F.col("boolean_value").cast("boolean"))
    )
