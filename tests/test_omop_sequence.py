"""End-to-end OMOP sequence assembly on hand-computed fixtures.

Covers: cast-on-read normalization, D1 canonical extraction, the clinical/
ATT/death/demographic decorators, and the collect-sort-explode packing —
token-by-token against manually derived expected sequences (the reference's
semantics: inter-visit cehr_bert ATT, inpatient mix 'i-' tokens, discharge
tokens, artificial death visits, demographic prompt).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.omop.events import extract_events_by_domain, with_age
from cehrbert_data_spark.omop.sequence import (
    OUTPUT_COLUMNS,
    create_sequence_data_with_att,
)
from cehrbert_data_spark.sources.readers import normalize_domain_table


@pytest.fixture(scope="module")
def fixtures(spark):
    # All-string physical schemas, exercising cast-on-read (FIXTURES.md).
    person = normalize_domain_table(
        spark.createDataFrame(
            [
                ("1", "1980-01-01 00:00:00", "1980", "8507", "8527"),
                ("2", "1990-06-15 00:00:00", "1990", "8532", "0"),
            ],
            "person_id: string, birth_datetime: string, year_of_birth: string, "
            "gender_concept_id: string, race_concept_id: string",
        )
    )
    visit_occurrence = normalize_domain_table(
        spark.createDataFrame(
            [
                # person 1: two outpatient visits, 31 days end-to-start gap
                ("101", "1", "9202", "2020-01-01", "2020-01-01 09:00:00",
                 "2020-01-01", "2020-01-01 10:00:00", "0"),
                ("102", "1", "9202", "2020-02-01", "2020-02-01 09:00:00",
                 "2020-02-01", "2020-02-01 10:00:00", "0"),
                # person 2: one inpatient visit spanning 3 days
                ("201", "2", "9201", "2020-03-01", "2020-03-01 08:00:00",
                 "2020-03-03", "2020-03-03 12:00:00", "0"),
            ],
            "visit_occurrence_id: string, person_id: string, visit_concept_id: string, "
            "visit_start_date: string, visit_start_datetime: string, "
            "visit_end_date: string, visit_end_datetime: string, "
            "discharge_to_concept_id: string",
        )
    )
    condition_occurrence = normalize_domain_table(
        spark.createDataFrame(
            [
                ("1001", "1", "C1", "2020-01-01", "2020-01-01 09:30:00", "101"),
                ("1002", "1", "C2", "2020-02-01", "2020-02-01 09:30:00", "102"),
                ("1003", "2", "C3", "2020-03-01", "2020-03-01 10:00:00", "201"),
                ("1004", "2", "C4", "2020-03-02", "2020-03-02 11:00:00", "201"),
            ],
            "condition_occurrence_id: string, person_id: string, "
            "condition_concept_id: string, condition_start_date: string, "
            "condition_start_datetime: string, visit_occurrence_id: string",
        )
    )
    death = spark.createDataFrame([("2", "2020-03-10")], "person_id: string, death_date: string") \
        .withColumn("death_date", F.col("death_date").cast("date"))
    return person, visit_occurrence, condition_occurrence, death


def _sequence_input(person, visit_occurrence, condition_occurrence):
    """Mimic generate_training_data's enrichment: canonical events + age at
    visit start + visit_concept_id + cohort_member_id = person_id."""
    events = extract_events_by_domain(condition_occurrence)
    visit_person = visit_occurrence.join(
        person.select("person_id", "birth_datetime"), "person_id"
    ).withColumn(
        "age",
        F.ceil(F.months_between(F.col("visit_start_date"), F.col("birth_datetime")) / F.lit(12)),
    ).drop("birth_datetime")
    enriched = events.join(
        visit_person.select("visit_occurrence_id", "visit_concept_id", "age"),
        "visit_occurrence_id",
    ).withColumn("cohort_member_id", F.col("person_id"))
    return enriched, visit_person


def test_sequence_tokens(spark, fixtures):
    person, visit_occurrence, condition_occurrence, death = fixtures
    events, visit_person = _sequence_input(person, visit_occurrence, condition_occurrence)
    seqs = create_sequence_data_with_att(
        events, visit_person, att_type="cehr_bert", inpatient_att_type="mix", death=death
    )
    assert seqs.columns == OUTPUT_COLUMNS
    rows = {r["person_id"]: r for r in seqs.collect()}

    # person 1: [VS] C1 [VE]  M1(31d gap)  [VS] C2 [VE]
    assert rows["1"]["concept_ids"] == ["[VS]", "C1", "[VE]", "M1", "[VS]", "C2", "[VE]"]
    assert rows["1"]["num_of_visits"] == 2
    assert rows["1"]["visit_segments"] == [2, 2, 2, 1, 1, 1, 1]

    # person 2: inpatient [VS] C3 i-D1 C4 i-D1 Discharge/0 [VE] — the second
    # i-D1 precedes the discharge event because the reference computes span
    # ATT over the union that already includes discharge rows
    # (artificial_time_token_decorator.py:290-333) — then the artificial
    # death visit W1(7d) [VS] [DEATH] [VE].
    assert rows["2"]["concept_ids"] == [
        "[VS]", "C3", "i-D1", "C4", "i-D1", "Discharge/0", "[VE]",
        "W1", "[VS]", "[DEATH]", "[VE]",
    ]
    assert rows["2"]["num_of_concepts"] == 11


def test_sequence_ages_and_orders(spark, fixtures):
    person, visit_occurrence, condition_occurrence, death = fixtures
    events, visit_person = _sequence_input(person, visit_occurrence, condition_occurrence)
    seqs = create_sequence_data_with_att(
        events, visit_person, att_type="cehr_bert", inpatient_att_type="mix", death=None
    )
    r1 = {r["person_id"]: r for r in seqs.collect()}["1"]
    assert r1["orders"] == list(range(1, 8))
    # age at 2020-01-01 for a 1980-01-01 birth = 40
    assert r1["ages"][1] == 40


def test_demographic_prompt(spark, fixtures):
    person, visit_occurrence, condition_occurrence, death = fixtures
    events, visit_person = _sequence_input(person, visit_occurrence, condition_occurrence)
    seqs = create_sequence_data_with_att(
        events,
        visit_person,
        att_type="cehr_bert",
        inpatient_att_type="mix",
        patient_demographic=person,
        exclude_demographic=False,
    )
    r1 = {r["person_id"]: r for r in seqs.collect()}["1"]
    # year:2020, age:40, gender, race lead the sequence in that order.
    assert r1["concept_ids"][:4] == ["year:2020", "age:40", "8507", "8527"]
    r2 = {r["person_id"]: r for r in seqs.collect()}["2"]
    # race_concept_id 0 -> Race/0 unknown token.
    assert r2["concept_ids"][:4] == ["year:2020", "age:30", "8532", "Race/0"]


def test_visit_type_tokens(spark, fixtures):
    person, visit_occurrence, condition_occurrence, death = fixtures
    events, visit_person = _sequence_input(person, visit_occurrence, condition_occurrence)
    seqs = create_sequence_data_with_att(
        events, visit_person, att_type="cehr_bert", inpatient_att_type="mix",
        include_visit_type=True,
    )
    r1 = {r["person_id"]: r for r in seqs.collect()}["1"]
    # visit type token (priority -1) slots between [VS] (-2) and the events.
    assert r1["concept_ids"][:3] == ["[VS]", "9202", "C1"]
