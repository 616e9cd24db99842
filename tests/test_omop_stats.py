from __future__ import annotations

from pyspark.sql import functions as F

from cehrbert_data_spark.omop.stats import (
    lab_prevalence,
    measurement_unit_stats,
    qualified_concept_list,
    sample_omop_tables,
)


def test_lab_prevalence(spark):
    measurement = spark.createDataFrame(
        [(1, 10, 5.0, None), (1, 10, None, 99), (2, 10, 7.0, None), (1, 0, 1.0, None)],
        "person_id: int, measurement_concept_id: int, value_as_number: double, "
        "value_as_concept_id: int",
    )
    concept = spark.createDataFrame([(10, "lab A")], "concept_id: int, concept_name: string")
    r = lab_prevalence(measurement, concept).collect()
    assert len(r) == 1
    row = r[0]
    assert row["freq"] == 3 and row["person_count"] == 2
    assert abs(row["numeric_percentage"] - 2 / 3) < 1e-9
    assert abs(row["categorical_percentage"] - 1 / 3) < 1e-9


def test_measurement_unit_stats_winsorizes(spark):
    rows = [(1, 10, 20, float(v), 1) for v in range(1, 101)]
    rows.append((1, 10, 20, 1e9, 1))  # outlier beyond the 99th percentile
    measurement = spark.createDataFrame(
        rows,
        "person_id: int, measurement_concept_id: int, unit_concept_id: int, "
        "value_as_number: double, visit_occurrence_id: int",
    )
    required = spark.createDataFrame(
        [(10, True)], "measurement_concept_id: int, is_numeric: boolean"
    )
    r = measurement_unit_stats(measurement, required).collect()[0]
    assert r["measurement_freq"] <= 101
    assert r["value_mean"] < 1000  # outlier clipped


def test_qualified_concept_list(spark):
    events = spark.createDataFrame(
        [("c1", 1), ("c1", 2), ("c2", 1)], "standard_concept_id: string, person_id: int"
    )
    out = qualified_concept_list(events, min_patient_count=2).collect()
    assert [(r["standard_concept_id"], r["freq"]) for r in out] == [("c1", 2)]


def test_sample_omop_tables(spark):
    person = spark.createDataFrame([(i,) for i in range(100)], "person_id: int")
    visits = spark.createDataFrame(
        [(i, i % 100) for i in range(500)], "visit_occurrence_id: int, person_id: int"
    )
    concept = spark.createDataFrame([(1, "x")], "concept_id: int, concept_name: string")
    out = sample_omop_tables(
        {"person": person, "visit_occurrence": visits, "concept": concept},
        person_sample_fraction=0.2,
    )
    sampled_persons = {r["person_id"] for r in out["person"].collect()}
    assert 0 < len(sampled_persons) < 100
    visit_persons = {r["person_id"] for r in out["visit_occurrence"].collect()}
    assert visit_persons <= sampled_persons
    assert out["concept"].count() == 1  # person-less tables untouched
