"""Semantics tests for the full cohort library (reference parity:
cohorts/*.py + prediction_cohorts/*.py)."""

from __future__ import annotations

import datetime

import pytest

from cehrbert_data_spark.omop.cohort import create_cohort, label_cohort
from cehrbert_data_spark.omop.cohort_library import (
    PREDICTION_COHORTS,
    atrial_fibrillation,
    cabg,
    copd_hospitalization,
    coronary_artery_disease,
    covid,
    covid_inpatient,
    heart_failure,
    hf_hospitalization,
    hospitalization_mortality_outcome,
    hospitalization_mortality_target,
    inpatient_admission,
    type_two_diabetes,
    ventilation,
)
from cehrbert_data_spark.omop.vocab import get_descendant_concepts


def _d(y, m, d):
    return datetime.date(y, m, d)


def _dt(y, m, d, h=0):
    return datetime.datetime(y, m, d, h)


DETECTED_CONCEPT = 45884084
ALL_CONCEPTS = [
    313217, 443454, 317576, 4296227, 43528001, 201820, 1503297, 316139,
    4307029, 255573, 723475, 37311061, 4186999, DETECTED_CONCEPT, 999,
]


@pytest.fixture(scope="module")
def tables(spark):
    person = spark.createDataFrame(
        [(i, datetime.datetime(1960, 1, 1), 1960, 8507, 8527) for i in range(1, 10)],
        "person_id: long, birth_datetime: timestamp, year_of_birth: int, "
        "gender_concept_id: int, race_concept_id: int",
    )
    # (id, person, concept, start_date, start_dt, end_date, end_dt, discharge)
    visit = spark.createDataFrame(
        [
            (10, 1, 9202, _d(2020, 1, 1), _dt(2020, 1, 1, 8), _d(2020, 1, 1), _dt(2020, 1, 1, 9), 8536),
            (11, 1, 9201, _d(2020, 3, 1), _dt(2020, 3, 1), _d(2020, 3, 5), _dt(2020, 3, 5), 8536),
            (20, 2, 9202, _d(2020, 2, 1), _dt(2020, 2, 1), _d(2020, 2, 1), _dt(2020, 2, 1), 8536),
            (30, 3, 9202, _d(2020, 4, 1), _dt(2020, 4, 1), _d(2020, 4, 1), _dt(2020, 4, 1), 8536),
            (31, 3, 9201, _d(2020, 4, 15), _dt(2020, 4, 15), _d(2020, 4, 20), _dt(2020, 4, 20), 8536),
            (40, 4, 9202, _d(2020, 5, 1), _dt(2020, 5, 1), _d(2020, 5, 1), _dt(2020, 5, 1), 8536),
            (50, 5, 9202, _d(2020, 5, 2), _dt(2020, 5, 2), _d(2020, 5, 2), _dt(2020, 5, 2), 8536),
            (60, 6, 9201, _d(2020, 6, 1), _dt(2020, 6, 1), _d(2020, 6, 10), _dt(2020, 6, 10), 8536),
            (70, 7, 9201, _d(2020, 7, 1), _dt(2020, 7, 1), _d(2020, 7, 4), _dt(2020, 7, 4), 8536),
            (71, 7, 9201, _d(2020, 7, 20), _dt(2020, 7, 20), _d(2020, 7, 25), _dt(2020, 7, 25), 8536),
            (80, 8, 9201, _d(2020, 8, 1), _dt(2020, 8, 1), _d(2020, 8, 5), _dt(2020, 8, 5), 4216643),
            (90, 9, 9201, _d(2020, 9, 1), _dt(2020, 9, 1), _d(2020, 9, 3), _dt(2020, 9, 3), 8536),
        ],
        "visit_occurrence_id: long, person_id: long, visit_concept_id: int, "
        "visit_start_date: date, visit_start_datetime: timestamp, "
        "visit_end_date: date, visit_end_datetime: timestamp, "
        "discharged_to_concept_id: int",
    )
    condition = spark.createDataFrame(
        [
            # afib for person 1, recorded the evening before the visit starts
            (100, 1, 313217, _d(2019, 12, 31), _dt(2019, 12, 31, 23), 10),
            (101, 1, 443454, _d(2020, 3, 1), _dt(2020, 3, 1), 11),   # stroke
            (102, 2, 317576, _d(2020, 2, 1), _dt(2020, 2, 1), 20),   # CAD (excluded)
            (103, 3, 317576, _d(2020, 4, 1), _dt(2020, 4, 1), 30),   # CAD (kept)
            (104, 4, 201820, _d(2020, 5, 1), _dt(2020, 5, 1), 40),   # t2dm + drug
            (105, 5, 201820, _d(2020, 5, 2), _dt(2020, 5, 2), 50),   # t2dm no drug
            (106, 6, 37311061, _d(2020, 6, 1), _dt(2020, 6, 1), 60),  # covid dx
            (107, 7, 316139, _d(2020, 7, 2), _dt(2020, 7, 2), 70),   # heart failure
            (108, 9, 255573, _d(2020, 9, 1), _dt(2020, 9, 1), 90),   # copd
        ],
        "condition_occurrence_id: long, person_id: long, condition_concept_id: int, "
        "condition_start_date: date, condition_start_datetime: timestamp, "
        "visit_occurrence_id: long",
    )
    procedure = spark.createDataFrame(
        [
            (200, 2, 4296227, _d(2019, 1, 1), _dt(2019, 1, 1), None),  # prior stent
            (201, 3, 43528001, _d(2020, 4, 15), _dt(2020, 4, 15), 31),  # CABG
        ],
        "procedure_occurrence_id: long, person_id: long, procedure_concept_id: int, "
        "procedure_date: date, procedure_datetime: timestamp, visit_occurrence_id: long",
    )
    drug = spark.createDataFrame(
        [(300, 4, 1503297, _d(2020, 5, 1), 40)],
        "drug_exposure_id: long, person_id: long, drug_concept_id: int, "
        "drug_exposure_start_date: date, visit_occurrence_id: long",
    )
    measurement = spark.createDataFrame(
        [
            (400, 6, 723475, _dt(2020, 6, 1), DETECTED_CONCEPT, "Detected", 60),
            (401, 7, 4307029, _dt(2020, 7, 2), 0, "600", 70),  # BNP > 500
        ],
        "measurement_id: long, person_id: long, measurement_concept_id: int, "
        "measurement_datetime: timestamp, value_as_concept_id: int, "
        "value_source_value: string, visit_occurrence_id: long",
    )
    observation = spark.createDataFrame(
        [],
        "observation_id: long, person_id: long, observation_concept_id: int, "
        "observation_date: date, observation_datetime: timestamp",
    )
    death = spark.createDataFrame([(8, _d(2020, 8, 5))], "person_id: long, death_date: date")
    observation_period = spark.createDataFrame(
        [(i, _d(2015, 1, 1), _d(2021, 12, 31)) for i in range(1, 10)],
        "person_id: long, observation_period_start_date: date, "
        "observation_period_end_date: date",
    )
    concept = spark.createDataFrame(
        [(c, f"concept {c}", "Clinical Finding") for c in ALL_CONCEPTS if c != DETECTED_CONCEPT]
        + [(DETECTED_CONCEPT, "Detected", "Answer")],
        "concept_id: int, concept_name: string, concept_class_id: string",
    )
    concept_ancestor = spark.createDataFrame(
        [(c, c) for c in ALL_CONCEPTS],
        "ancestor_concept_id: int, descendant_concept_id: int",
    )
    concept_relationship = spark.createDataFrame(
        [], "concept_id_1: int, concept_id_2: int, relationship_id: string"
    )
    vent = spark.createDataFrame(
        [(6, _dt(2020, 6, 2))], "person_id: long, earliest_placement_instant: timestamp"
    )
    return {
        "person": person, "visit_occurrence": visit, "condition_occurrence": condition,
        "procedure_occurrence": procedure, "drug_exposure": drug,
        "measurement": measurement, "observation": observation, "death": death,
        "observation_period": observation_period, "concept": concept,
        "concept_ancestor": concept_ancestor, "concept_relationship": concept_relationship,
        "vent": vent,
    }


@pytest.fixture(scope="module")
def ancestor_fn(tables):
    def fn(spec):
        if not spec.is_standard:
            # iterative 'Subsumes' ancestry (reference build_ancestry_table_for
            # shape) — the diuretics seed has no Subsumes edges here, so empty
            from cehrbert_data_spark.omop.vocab import build_ancestry_table

            return build_ancestry_table(
                tables["concept_relationship"], spec.ancestor_concept_ids
            )
        return get_descendant_concepts(
            tables["concept"], tables["concept_ancestor"], spec.ancestor_concept_ids
        )
    return fn


def test_atrial_fibrillation_index_convention(spark, tables, ancestor_fn):
    cohort = create_cohort(spark, atrial_fibrillation(), tables, ancestor_fn)
    rows = cohort.collect()
    # dx recorded <1 day before the visit start → index at visit day 23:59
    assert [(r["person_id"], r["index_date"]) for r in rows] == [
        (1, datetime.datetime(2020, 1, 1, 23, 59))
    ]


def test_cad_prior_procedure_exclusion(spark, tables, ancestor_fn):
    cohort = create_cohort(spark, coronary_artery_disease(), tables, ancestor_fn)
    # person 2 had a 2019 stent → excluded; person 3 kept
    assert [r["person_id"] for r in cohort.collect()] == [3]


def test_cabg_cohort(spark, tables, ancestor_fn):
    cohort = create_cohort(spark, cabg(), tables, ancestor_fn)
    assert [(r["person_id"], r["visit_occurrence_id"]) for r in cohort.collect()] == [(3, 31)]


def test_t2dm_requires_drug(spark, tables, ancestor_fn):
    cohort = create_cohort(spark, type_two_diabetes(), tables, ancestor_fn)
    # person 5 has the dx but no anti-diabetic exposure
    assert [r["person_id"] for r in cohort.collect()] == [4]


def test_covid_and_inpatient_variants(spark, tables, ancestor_fn):
    base = create_cohort(spark, covid(), tables, ancestor_fn)
    rows = base.collect()
    assert [(r["person_id"], r["index_date"]) for r in rows] == [(6, _d(2020, 6, 2))]

    inp = create_cohort(spark, covid_inpatient(), tables, ancestor_fn)
    assert [r["visit_occurrence_id"] for r in inp.collect()] == [60]


def test_heart_failure_inclusion(spark, tables, ancestor_fn):
    cohort = create_cohort(spark, heart_failure(), tables, ancestor_fn)
    # person 7: first visit 2020-07-01 <= first dx 2020-07-02, BNP 600 > 500
    assert [(r["person_id"], r["visit_occurrence_id"]) for r in cohort.collect()] == [(7, 70)]


def test_hf_and_copd_hospitalization_targets(spark, tables, ancestor_fn):
    hf = create_cohort(spark, hf_hospitalization(), tables, ancestor_fn)
    assert [(r["person_id"], r["index_date"]) for r in hf.collect()] == [
        (7, _dt(2020, 7, 4))
    ]
    copd = create_cohort(spark, copd_hospitalization(), tables, ancestor_fn)
    assert [r["visit_occurrence_id"] for r in copd.collect()] == [90]


def test_readmission_pair_labels(spark, tables, ancestor_fn):
    first = create_cohort(
        spark, inpatient_admission("first_hospitalization", index_at="end"), tables
    )
    second = create_cohort(
        spark, inpatient_admission("second_hospitalization", index_at="start"), tables
    )
    labeled = label_cohort(
        first, second, tables["observation_period"],
        prediction_start_days=0, prediction_window=30,
    )
    by_person = {
        (r["person_id"], r["index_date"]): r["label"] for r in labeled.collect()
    }
    # person 7 discharged 7-04 is readmitted 7-20 (within 30d) → positive
    assert by_person[(7, _dt(2020, 7, 4))] == 1
    # person 8's only stay has no later admission → negative
    assert by_person[(8, _dt(2020, 8, 5))] == 0


def test_hospitalization_mortality_pair(spark, tables, ancestor_fn):
    target = create_cohort(spark, hospitalization_mortality_target(), tables)
    rows = {r["person_id"]: r for r in target.collect()}
    # >48h stays only; person 8 expired in hospital
    assert rows[8]["expired"] == 1 and rows[7]["expired"] == 0
    outcome = create_cohort(
        spark, hospitalization_mortality_outcome(),
        {"hospitalization_mortality_target": target},
    )
    assert [r["person_id"] for r in outcome.collect()] == [8]


def test_ventilation_cohort(spark, tables):
    cohort = create_cohort(spark, ventilation(), tables)
    assert [(r["person_id"], r["index_date"]) for r in cohort.collect()] == [
        (6, _dt(2020, 6, 2))
    ]


def test_prediction_registry_builds(spark, tables, ancestor_fn):
    """Every registered prediction pair instantiates and its target builds."""
    assert len(PREDICTION_COHORTS) == 12
    for name, (target_fn, outcome_fn) in PREDICTION_COHORTS.items():
        target_builder = target_fn()
        outcome_builder = outcome_fn()
        assert target_builder.cohort_name and outcome_builder.cohort_name


def test_reference_cohort_sql_runs_verbatim(spark, tables, ancestor_fn):
    """global_temp compat: a cohort template shipped by the reference (which
    addresses every view as ``global_temp.x``, cohorts/heart_failure.py:117-146)
    executes UNMODIFIED because register_cohort_view registers views in both
    catalogs. The template is read from the reference at test time (never
    copied into the repo)."""
    import ast
    import os

    import pytest as _pytest

    ref_path = "/root/reference/src/cehrbert_data/cohorts/heart_failure.py"
    if not os.path.exists(ref_path):
        _pytest.skip("reference checkout not available")
    with open(ref_path) as fh:
        tree = ast.parse(fh.read())
    template = next(
        node.value.value
        for node in ast.walk(tree)
        if isinstance(node, ast.Assign)
        and any(
            isinstance(t, ast.Name) and t.id == "HEART_FAILURE_ENTRY_COHORT"
            for t in node.targets
        )
    )
    assert "global_temp." in template  # it really is the global-catalog form

    from cehrbert_data_spark.omop.cohort import register_cohort_view
    from cehrbert_data_spark.omop.vocab import get_descendant_concepts

    register_cohort_view(tables["visit_occurrence"], "visit_occurrence")
    register_cohort_view(tables["condition_occurrence"], "condition_occurrence")
    register_cohort_view(
        get_descendant_concepts(
            tables["concept"], tables["concept_ancestor"], [316139]
        ),
        "hf_concept",
    )
    rows = spark.sql(template.format(hf_concept="hf_concept")).collect()
    # person 7: earliest visit 2020-07-01 <= earliest HF dx → enters the cohort
    assert [(r["person_id"], r["visit_occurrence_id"]) for r in rows] == [(7, 70)]
