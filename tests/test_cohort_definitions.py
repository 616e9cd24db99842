from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from cehrbert_data_spark.omop.cohort import build_base_cohort, create_cohort, label_cohort
from cehrbert_data_spark.omop.cohort_definitions import (
    first_diagnosis_cohort,
    hospitalization_outcome,
    hospitalization_target,
    last_visit_discharged_home,
    mortality_cohort,
)
from cehrbert_data_spark.omop.vocab import get_descendant_concepts


def _d(y, m, d):
    return datetime.date(y, m, d)


def _dt(y, m, d):
    return datetime.datetime(y, m, d)


def _tables(spark):
    person = spark.createDataFrame(
        [(1, datetime.datetime(1960, 1, 1), 1960, 8507, 8527),
         (2, datetime.datetime(1970, 1, 1), 1970, 8532, 8516)],
        "person_id: long, birth_datetime: timestamp, year_of_birth: int, "
        "gender_concept_id: int, race_concept_id: int",
    )
    visit = spark.createDataFrame(
        [
            (10, 1, 9202, _d(2020, 1, 1), _dt(2020, 1, 1), _d(2020, 1, 1), _dt(2020, 1, 1), 8536),
            (11, 1, 9201, _d(2020, 3, 1), _dt(2020, 3, 1), _d(2020, 3, 5), _dt(2020, 3, 5), 0),
            (20, 2, 9202, _d(2020, 2, 1), _dt(2020, 2, 1), _d(2020, 2, 1), _dt(2020, 2, 1), 8536),
        ],
        "visit_occurrence_id: long, person_id: long, visit_concept_id: int, "
        "visit_start_date: date, visit_start_datetime: timestamp, "
        "visit_end_date: date, visit_end_datetime: timestamp, "
        "discharged_to_concept_id: int",
    )
    condition = spark.createDataFrame(
        [
            (100, 1, 201820, _d(2020, 1, 1), _dt(2020, 1, 1), 10),
            (101, 1, 201820, _d(2020, 3, 1), _dt(2020, 3, 1), 11),
            (102, 2, 999, _d(2020, 2, 1), _dt(2020, 2, 1), 20),
        ],
        "condition_occurrence_id: long, person_id: long, condition_concept_id: int, "
        "condition_start_date: date, condition_start_datetime: timestamp, "
        "visit_occurrence_id: long",
    )
    death = spark.createDataFrame([(1, _d(2020, 6, 1))], "person_id: long, death_date: date")
    observation = spark.createDataFrame(
        [(2, 4119499, _dt(2020, 1, 1))],
        "person_id: long, observation_concept_id: int, observation_datetime: timestamp",
    )
    observation_period = spark.createDataFrame(
        [(1, _d(2015, 1, 1), _d(2021, 12, 31)), (2, _d(2015, 1, 1), _d(2021, 12, 31))],
        "person_id: long, observation_period_start_date: date, "
        "observation_period_end_date: date",
    )
    concept_ancestor = spark.createDataFrame(
        [(201820, 201820), (201820, 201826)],
        "ancestor_concept_id: int, descendant_concept_id: int",
    )
    concept = spark.createDataFrame(
        [(201820, "t2dm"), (201826, "t2dm sub"), (999, "other")],
        "concept_id: int, concept_name: string",
    )
    return {
        "person": person, "visit_occurrence": visit, "condition_occurrence": condition,
        "death": death, "observation": observation, "observation_period": observation_period,
        "concept_ancestor": concept_ancestor, "concept": concept,
    }


def test_mortality_cohort(spark):
    tables = _tables(spark)
    cohort = create_cohort(spark, mortality_cohort(), tables)
    rows = cohort.collect()
    # person 1 dies after their last visit; person 2 has no death record.
    assert [(r["person_id"], r["index_date"]) for r in rows] == [(1, _d(2020, 6, 1))]


def test_first_diagnosis_cohort_with_ancestor(spark):
    tables = _tables(spark)
    builder = first_diagnosis_cohort("t2dm", [201820])

    def ancestor_fn(spec):
        return get_descendant_concepts(
            tables["concept"], tables["concept_ancestor"], spec.ancestor_concept_ids
        )

    cohort = create_cohort(spark, builder, tables, ancestor_table_fn=ancestor_fn)
    rows = cohort.collect()
    # earliest qualifying condition for person 1 only (person 2's concept 999
    # is not a descendant of the seed)
    assert [(r["person_id"], r["visit_occurrence_id"]) for r in rows] == [(1, 10)]


def test_hospitalization_target_and_outcome(spark):
    tables = _tables(spark)
    outcome = create_cohort(spark, hospitalization_outcome(), tables)
    assert [r["visit_occurrence_id"] for r in outcome.collect()] == [11]

    target = create_cohort(
        spark, hospitalization_target(total_window=90, date_lower_bound="2019-01-01"), tables
    )
    rows = target.collect()
    # person 1 has 2 visits within 90 days of the first -> qualifies
    assert [r["person_id"] for r in rows] == [1]
    labeled = label_cohort(
        target, outcome, tables["observation_period"],
        prediction_start_days=0, prediction_window=30,
    )
    assert [r["label"] for r in labeled.collect()] == [0]  # admission precedes index


def test_last_visit_discharged_home(spark):
    tables = _tables(spark)
    # Reference semantics (cohorts/last_visit_discharged_home.py): inpatient
    # stays only, discharged home, ending on or before the earliest death.
    visit = spark.createDataFrame(
        [
            # p1: outpatient home discharge — ineligible despite being last
            (10, 1, 9202, _d(2020, 4, 1), _dt(2020, 4, 1), _d(2020, 4, 1), _dt(2020, 4, 1), 8536),
            # p1: inpatient home discharge before death -> the keeper
            (11, 1, 9201, _d(2020, 3, 1), _dt(2020, 3, 1), _d(2020, 3, 5), _dt(2020, 3, 5), 8536),
            # p1: later inpatient home discharge AFTER death (2020-06-01) -> excluded
            (12, 1, 9201, _d(2020, 6, 20), _dt(2020, 6, 20), _d(2020, 6, 25), _dt(2020, 6, 25), 8536),
            # p2: ER-inpatient home discharge, no death row -> the keeper
            (21, 2, 262, _d(2020, 2, 1), _dt(2020, 2, 1), _d(2020, 2, 10), _dt(2020, 2, 10), 8536),
            # p2: inpatient but discharged elsewhere
            (22, 2, 9201, _d(2020, 5, 1), _dt(2020, 5, 1), _d(2020, 5, 3), _dt(2020, 5, 3), 0),
        ],
        "visit_occurrence_id: long, person_id: long, visit_concept_id: int, "
        "visit_start_date: date, visit_start_datetime: timestamp, "
        "visit_end_date: date, visit_end_datetime: timestamp, "
        "discharged_to_concept_id: int",
    )
    cohort = create_cohort(
        spark, last_visit_discharged_home(), {**tables, "visit_occurrence": visit}
    )
    got = {
        r["person_id"]: (r["visit_occurrence_id"], r["index_date"])
        for r in cohort.collect()
    }
    assert got == {1: (11, _dt(2020, 3, 5)), 2: (21, _dt(2020, 2, 10))}
