"""End-to-end smoke for the generate_prediction_cohort app (reference test
model: run main() on a tiny OMOP folder, assert shape + labels)."""

from __future__ import annotations

import datetime

import pytest

from cehrbert_data_spark.apps import generate_prediction_cohort


def _d(y, m, d):
    return datetime.date(y, m, d)


def _dt(y, m, d, h=0):
    return datetime.datetime(y, m, d, h)


@pytest.fixture(scope="module")
def omop_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("omop_pred")
    person = spark.createDataFrame(
        [(i, datetime.datetime(1960, 1, 1), 1960, 8507, 8527) for i in (1, 2)],
        "person_id: long, birth_datetime: timestamp, year_of_birth: int, "
        "gender_concept_id: int, race_concept_id: int",
    )
    # person 1: two inpatient stays 16 days apart (readmission positive);
    # person 2: one stay only (negative)
    visit = spark.createDataFrame(
        [
            (10, 1, 9201, _d(2020, 7, 1), _dt(2020, 7, 1), _d(2020, 7, 4), _dt(2020, 7, 4), 8536),
            (11, 1, 9201, _d(2020, 7, 20), _dt(2020, 7, 20), _d(2020, 7, 25), _dt(2020, 7, 25), 8536),
            (20, 2, 9201, _d(2020, 8, 1), _dt(2020, 8, 1), _d(2020, 8, 5), _dt(2020, 8, 5), 8536),
        ],
        "visit_occurrence_id: long, person_id: long, visit_concept_id: int, "
        "visit_start_date: date, visit_start_datetime: timestamp, "
        "visit_end_date: date, visit_end_datetime: timestamp, "
        "discharged_to_concept_id: int",
    )
    condition = spark.createDataFrame(
        [
            (100, 1, 44054006, _d(2020, 7, 1), _dt(2020, 7, 1), 10),
            (101, 2, 44054006, _d(2020, 8, 1), _dt(2020, 8, 1), 20),
        ],
        "condition_occurrence_id: long, person_id: long, condition_concept_id: int, "
        "condition_start_date: date, condition_start_datetime: timestamp, "
        "visit_occurrence_id: long",
    )
    observation_period = spark.createDataFrame(
        [(1, _d(2015, 1, 1), _d(2021, 12, 31)), (2, _d(2015, 1, 1), _d(2021, 12, 31))],
        "person_id: long, observation_period_start_date: date, "
        "observation_period_end_date: date",
    )
    person.write.parquet(str(root / "person"))
    visit.write.parquet(str(root / "visit_occurrence"))
    condition.write.parquet(str(root / "condition_occurrence"))
    observation_period.write.parquet(str(root / "observation_period"))
    return str(root)


@pytest.mark.slow
def test_readmission_end_to_end(spark, omop_dir, tmp_path):
    out = generate_prediction_cohort.main(
        input_folder=omop_dir,
        output_folder=str(tmp_path / "out"),
        cohort_name="readmission",
        ehr_table_list=["condition_occurrence"],
        observation_window=360,
        prediction_window=30,
        spark=spark,
    )
    result = spark.read.parquet(out)
    labels = {(r["person_id"], r["index_date"]): r["label"] for r in result.collect()}
    # person 1's first stay (discharged 7-04) is readmitted 7-20 → positive;
    # their second stay and person 2's only stay see no further admission
    assert labels[(1, _dt(2020, 7, 4))] == 1
    assert labels[(1, _dt(2020, 7, 25))] == 0
    assert labels[(2, _dt(2020, 8, 5))] == 0
    assert "concept_ids" in result.columns  # ATT sequence features attached


def test_unknown_cohort_name_raises(spark, omop_dir, tmp_path):
    with pytest.raises(ValueError, match="unknown cohort"):
        generate_prediction_cohort.main(
            input_folder=omop_dir,
            output_folder=str(tmp_path / "x"),
            cohort_name="nope",
            spark=spark,
        )
