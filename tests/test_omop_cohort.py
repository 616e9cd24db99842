from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cehrbert_data_spark.omop.cohort import (
    QueryBuilder,
    QuerySpec,
    add_time_to_event,
    build_base_cohort,
    label_cohort,
    to_meds_format,
)


def _d(m, d):
    return datetime.date(2020, m, d)


def _cohort_df(spark, rows):
    return spark.createDataFrame(
        rows, "person_id: long, index_date: date, visit_occurrence_id: long"
    )


def test_build_base_cohort_sql_template(spark):
    person = spark.createDataFrame(
        [(1, datetime.datetime(1960, 1, 1), 1960, 8507, 8527),
         (2, datetime.datetime(2015, 1, 1), 2015, 8532, 8516)],
        "person_id: long, birth_datetime: timestamp, year_of_birth: int, "
        "gender_concept_id: int, race_concept_id: int",
    )
    visits = spark.createDataFrame(
        [(10, 1, _d(6, 1)), (20, 2, _d(6, 1))],
        "visit_occurrence_id: long, person_id: long, visit_start_date: date",
    )
    observation_period = spark.createDataFrame(
        [(1, _d(1, 1), _d(12, 31)), (2, _d(1, 1), _d(12, 31))],
        "person_id: long, observation_period_start_date: date, "
        "observation_period_end_date: date",
    )
    builder = QueryBuilder(
        cohort_name="test",
        dependency_list=["visit_occurrence"],
        query=QuerySpec(
            table_name="test_cohort",
            query_template="""
                SELECT person_id, visit_start_date AS index_date, visit_occurrence_id
                FROM visit_occurrence WHERE visit_start_date >= '{start}'
            """,
            parameters={"start": "2020-01-01"},
        ),
    )
    cohort = build_base_cohort(
        spark,
        builder,
        {"visit_occurrence": visits, "person": person,
         "observation_period": observation_period},
        age_lower_bound=18,
        age_upper_bound=100,
        date_lower_bound="2020-01-01",
        date_upper_bound="2020-12-31",
        prior_observation_period=30,
        post_observation_period=0,
    )
    rows = cohort.collect()
    # person 2 (age 5) fails the age filter; person 1 (age 60) passes.
    assert [(r["person_id"], r["age"]) for r in rows] == [(1, 60)]


def test_label_cohort_bounded_window(spark):
    target = _cohort_df(spark, [(1, _d(1, 1), 10), (2, _d(1, 1), 20), (3, _d(1, 1), 30)])
    outcome = _cohort_df(spark, [(1, _d(1, 15), 11), (3, _d(3, 1), 31)])
    observation_period = spark.createDataFrame(
        [(1, _d(12, 31)), (2, _d(12, 31)), (3, _d(1, 10))],
        "person_id: long, observation_period_end_date: date",
    )
    labeled = label_cohort(
        target, outcome, observation_period,
        prediction_start_days=0, prediction_window=30,
    )
    got = {r["person_id"]: (r["label"], r["outcome_date"]) for r in labeled.collect()}
    # person 1: outcome inside [index, index+30] -> positive with date
    assert got[1] == (1, _d(1, 15))
    # person 2: no outcome, observation covers the window -> negative
    assert got[2] == (0, None)
    # person 3: outcome at day 60 (outside window) AND observation ends early
    # -> excluded entirely (reference's WHERE op OR o clause)
    assert 3 not in got
    # dense member ids over (person, index, visit)
    ids = sorted(r["cohort_member_id"] for r in labeled.collect())
    assert ids == [1, 2]


def test_label_cohort_single_contribution_and_dedup(spark):
    target = _cohort_df(spark, [(1, _d(1, 1), 10), (1, _d(2, 1), 11)])
    outcome = _cohort_df(spark, [(1, _d(2, 10), 12)])
    observation_period = spark.createDataFrame(
        [(1, _d(12, 31))], "person_id: long, observation_period_end_date: date"
    )
    labeled = label_cohort(
        target, outcome, observation_period,
        prediction_start_days=0, prediction_window=30,
        single_contribution=True,
    )
    rows = labeled.collect()
    # Only the most recent positive remains.
    assert [(r["index_date"], r["label"]) for r in rows] == [(_d(2, 1), 1)]


def test_time_to_event_and_meds(spark):
    target = _cohort_df(spark, [(1, _d(1, 1), 10), (2, _d(1, 1), 20)])
    outcome = _cohort_df(spark, [(1, _d(1, 15), 11)])
    observation_period = spark.createDataFrame(
        [(1, _d(12, 31)), (2, _d(12, 31))],
        "person_id: long, observation_period_end_date: date",
    )
    labeled = label_cohort(target, outcome, observation_period,
                           prediction_start_days=0, prediction_window=30)
    final = add_time_to_event(labeled, None, prediction_window=30)
    got = {r["person_id"]: r["time_to_event"] for r in final.collect()}
    assert got == {1: 14, 2: 30}  # outcome at day 14; censored at window end

    meds = to_meds_format(final)
    assert {"subject_id", "prediction_time", "boolean_value"} <= set(meds.columns)
    mrow = {r["subject_id"]: r["boolean_value"] for r in meds.collect()}
    assert mrow == {1: True, 2: False}


def test_label_cohort_distributed_member_ids_match(spark):
    """The default two-pass ranker assigns the SAME ids as the reference's
    global dense_rank (global_window_member_ids=True) — incl. null visit ids."""
    import datetime

    target = spark.createDataFrame(
        [
            (1, datetime.datetime(2020, 1, 1), 10),
            (1, datetime.datetime(2020, 2, 1), None),
            (2, datetime.datetime(2020, 1, 15), 20),
        ],
        "person_id: long, index_date: timestamp, visit_occurrence_id: int",
    )
    outcome = spark.createDataFrame(
        [(1, datetime.datetime(2020, 1, 10))],
        "person_id: long, index_date: timestamp",
    )
    observation_period = spark.createDataFrame(
        [(1, datetime.date(2015, 1, 1), datetime.date(2021, 12, 31)),
         (2, datetime.date(2015, 1, 1), datetime.date(2021, 12, 31))],
        "person_id: long, observation_period_start_date: date, "
        "observation_period_end_date: date",
    )
    kwargs = dict(prediction_start_days=0, prediction_window=30)
    ref = label_cohort(
        target, outcome, observation_period, global_window_member_ids=True, **kwargs
    )
    dist = label_cohort(target, outcome, observation_period, **kwargs)
    key = lambda r: (r["person_id"], r["index_date"], r["visit_occurrence_id"])
    ref_ids = {key(r): r["cohort_member_id"] for r in ref.collect()}
    dist_ids = {key(r): r["cohort_member_id"] for r in dist.collect()}
    assert ref_ids == dist_ids and len(ref_ids) == 3
