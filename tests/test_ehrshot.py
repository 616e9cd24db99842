"""EHRSHOT→OMOP conversion: the reference's own unit-test contract
(visit counts per patient, artificial ids > max real id, priority dedup,
person pivot, code mapping, value typing)."""

from __future__ import annotations

import pytest

import datetime

from pyspark.sql import functions as F

from cehrbert_data_spark.omop.ehrshot import (
    convert_code_to_omop_concept,
    create_omop_person,
    disconnect_visit_id,
    drop_duplicate_visits,
    extract_value,
    generate_visit_id,
    promote_inferred_inpatient,
)


def _ts(m, d, h=0):
    return datetime.datetime(2020, m, d, h)


def _concept(spark):
    return spark.createDataFrame(
        [
            (1, "Gender", "Gender", "F", "female"),
            (2, "Race", "Race", "White", "white"),
            (3, "Unit", "UCUM", "mg", "milligram"),
            (4, "Meas Value", "LOINC", "POS", "Positive"),
            (5, "Condition", "SNOMED", "1234", "some condition"),
        ],
        "concept_id: int, domain_id: string, vocabulary_id: string, "
        "concept_code: string, concept_name: string",
    )


def _stream(spark, rows):
    return spark.createDataFrame(
        rows,
        "_c0: string, patient_id: int, start: timestamp, end: timestamp, "
        "code: string, value: string, unit: string, visit_id: string, "
        "omop_table: string",
    )


def test_code_mapping_and_value_typing(spark):
    concept = _concept(spark)
    data = _stream(
        spark,
        [
            (None, 1, _ts(1, 1), None, "SNOMED/1234", "5.5", "mg", None, "measurement"),
            (None, 1, _ts(1, 1), None, "SNOMED/1234", "Positive", None, None, "measurement"),
            (None, 1, _ts(1, 1), None, "SNOMED/9999", None, None, None, "measurement"),
        ],
    )
    mapped = convert_code_to_omop_concept(data, concept, "code")
    got = {r["value"]: r["concept_id"] for r in mapped.collect()}
    assert got["5.5"] == 5 and got[None] == 0  # unmapped code -> 0

    typed = extract_value(data, concept)
    rows = {r["value_source_value"]: r for r in typed.collect()}
    assert rows["5.5"]["value_as_number"] == 5.5
    assert rows["5.5"]["unit_concept_id"] == 3
    assert rows["Positive"]["value_as_concept_id"] == 4
    assert rows[None]["value_as_number"] is None


def test_create_omop_person(spark):
    concept = _concept(spark)
    data = _stream(
        spark,
        [
            (None, 7, _ts(1, 1), None, "SNOMED/3950001", None, None, None, "person"),
            (None, 7, _ts(1, 1), None, "Gender/F", None, None, None, "person"),
            (None, 7, _ts(1, 1), None, "Race/White", None, None, None, "person"),
        ],
    )
    person = create_omop_person(data, concept).collect()
    assert len(person) == 1
    p = person[0]
    assert p["person_id"] == 7 and p["year_of_birth"] == 2020
    assert p["gender_concept_id"] == 1 and p["race_concept_id"] == 2
    assert p["ethnicity_concept_id"] is None  # no ethnicity row


def test_drop_duplicate_visits_priority(spark):
    data = _stream(
        spark,
        [
            (None, 1, _ts(1, 1), _ts(1, 2), "Visit/OP", None, None, "10", "visit_occurrence"),
            (None, 1, _ts(1, 1), _ts(1, 2), "Visit/IP", None, None, "10", "visit_occurrence"),
            (None, 1, _ts(1, 3), None, "Visit/ER", None, None, "11", "visit_occurrence"),
        ],
    )
    out = drop_duplicate_visits(data).collect()
    by_visit = {r["visit_id"]: r["code"] for r in out}
    assert by_visit == {"10": "Visit/IP", "11": "Visit/ER"}


def test_generate_visit_id_invariants(spark):
    data = _stream(
        spark,
        [
            # real inpatient visit 100 spanning Jan 1-3
            (None, 1, _ts(1, 1), _ts(1, 3), "Visit/IP", None, None, "100", "visit_occurrence"),
            # event inside the stay -> linked to 100
            (None, 1, _ts(1, 2), None, "SNOMED/1234", None, None, None, "condition_occurrence"),
            # event with no covering visit -> artificial id
            (None, 1, _ts(6, 1), None, "SNOMED/1234", None, None, None, "condition_occurrence"),
            # second patient, orphan on the same date -> its own artificial id
            (None, 2, _ts(6, 1), None, "SNOMED/1234", None, None, None, "condition_occurrence"),
            # person row: birth precedes every visit span -> stays unlinked
            # (the reference links ANY record inside a span, person included;
            # only artificial-id minting excludes person rows)
            (None, 1, datetime.datetime(1990, 1, 1), None, "Gender/F", None, None, None, "person"),
        ],
    )
    out = generate_visit_id(data)
    rows = out.collect()
    non_person = [r for r in rows if r["omop_table"] == "condition_occurrence"]
    assert all(r["visit_id"] is not None for r in non_person)

    linked = [r for r in non_person if r["start"] == _ts(1, 2)]
    assert [r["visit_id"] for r in linked] == ["100"]

    artificial = [r for r in non_person if r["start"] == _ts(6, 1)]
    ids = {r["patient_id"]: int(r["visit_id"]) for r in artificial}
    assert all(v > 100 for v in ids.values())          # above max real id
    assert ids[1] != ids[2]                            # one id per patient

    new_visit_rows = [
        r for r in rows
        if r["omop_table"] == "visit_occurrence" and r["visit_id"] != "100"
    ]
    assert len(new_visit_rows) == 2                    # artificial visits appended

    person_rows = [r for r in rows if r["omop_table"] == "person"]
    assert person_rows and all(r["visit_id"] is None for r in person_rows)


def test_disconnect_visit_id_splits_leaky_visit(spark):
    """Reference contract (ehrshot_to_omop.py:593-741): a visit whose
    event-inferred span leaks >24 h outside its range is split into 24 h-gap
    sessions with fresh ids above the max; untouched rows keep their id and
    get original_visit_id = visit_id."""
    data = _stream(
        spark,
        [
            # visit 100: Jan 1 10:00-12:00, but one lab lands in March
            (None, 1, _ts(1, 1, 10), _ts(1, 1, 12), "Visit/OP", None, None, "100", "visit_occurrence"),
            (None, 1, _ts(1, 1, 11), None, "SNOMED/1234", None, None, "100", "condition_occurrence"),
            (None, 1, _ts(3, 5, 9), None, "LOINC/999", "5.5", "mg", "100", "measurement"),
            # visit 50: events inside range -> untouched
            (None, 2, _ts(2, 1, 8), _ts(2, 1, 18), "Visit/OP", None, None, "50", "visit_occurrence"),
            (None, 2, _ts(2, 1, 9), None, "SNOMED/1234", None, None, "50", "condition_occurrence"),
        ],
    )
    rows = disconnect_visit_id(data).collect()

    fixed_visits = [
        r for r in rows
        if r["omop_table"] == "visit_occurrence" and r["original_visit_id"] == "100"
    ]
    assert len(fixed_visits) == 2                       # two 24h-gap sessions
    assert all(int(r["visit_id"]) > 100 for r in fixed_visits)
    assert {r["code"] for r in fixed_visits} == {"Visit/OP"}
    # each session visit spans exactly its event starts
    spans = {r["visit_id"]: (r["start"], r["end"]) for r in fixed_visits}

    jan_event = next(r for r in rows if r["start"] == _ts(1, 1, 11))
    mar_event = next(r for r in rows if r["start"] == _ts(3, 5, 9))
    assert jan_event["visit_id"] != mar_event["visit_id"]
    assert jan_event["original_visit_id"] == mar_event["original_visit_id"] == "100"
    assert spans[jan_event["visit_id"]] == (_ts(1, 1, 11), _ts(1, 1, 11))
    assert spans[mar_event["visit_id"]] == (_ts(3, 5, 9), _ts(3, 5, 9))
    # no row still points at the dissolved visit id
    assert not [r for r in rows if r["visit_id"] == "100"]

    untouched = [r for r in rows if r["original_visit_id"] == "50"]
    assert len(untouched) == 2
    assert all(r["visit_id"] == "50" for r in untouched)


def test_disconnect_demotes_short_inpatient_sessions(spark):
    """An inpatient visit split into sub-24 h sessions demotes each session
    to Visit/OP (reference: ehrshot_to_omop.py:694-703)."""
    data = _stream(
        spark,
        [
            (None, 1, _ts(1, 10), _ts(1, 11), "Visit/IP", None, None, "200", "visit_occurrence"),
            (None, 1, _ts(1, 10, 9), None, "SNOMED/1234", None, None, "200", "condition_occurrence"),
            (None, 1, _ts(4, 20, 9), None, "SNOMED/1234", None, None, "200", "measurement"),
        ],
    )
    rows = disconnect_visit_id(data).collect()
    new_visits = [r for r in rows if r["omop_table"] == "visit_occurrence"]
    assert len(new_visits) == 2
    assert {r["code"] for r in new_visits} == {"Visit/OP"}


def test_promote_inferred_inpatient(spark):
    """Outpatient visits whose clinical events span >24 h become inferred
    inpatient visits with the event-span start/end (reference:
    ehrshot_to_omop.py:818-858); domain rows and true inpatient visits are
    untouched."""
    data = _stream(
        spark,
        [
            # outpatient visit with a 2-day clinical span -> promoted
            (None, 1, _ts(1, 1, 9), _ts(1, 1, 17), "Visit/OP", None, None, "10", "visit_occurrence"),
            (None, 1, _ts(1, 1, 9, ), None, "SNOMED/1234", None, None, "10", "condition_occurrence"),
            (None, 1, _ts(1, 3, 10), None, "SNOMED/1234", None, None, "10", "measurement"),
            # outpatient visit with a same-day span -> untouched
            (None, 2, _ts(2, 1, 8), _ts(2, 1, 18), "Visit/OP", None, None, "20", "visit_occurrence"),
            (None, 2, _ts(2, 1, 9), None, "SNOMED/1234", None, None, "20", "condition_occurrence"),
            # true inpatient visit -> never rewritten
            (None, 3, _ts(3, 1, 8), _ts(3, 4, 18), "Visit/IP", None, None, "30", "visit_occurrence"),
            (None, 3, _ts(3, 1, 9), None, "SNOMED/1234", None, None, "30", "condition_occurrence"),
        ],
    )
    rows = promote_inferred_inpatient(data).collect()
    visits = {r["visit_id"]: r for r in rows if r["omop_table"] == "visit_occurrence"}
    assert visits["10"]["code"] == "Visit/IP"
    assert visits["10"]["start"] == _ts(1, 1, 9) and visits["10"]["end"] == _ts(1, 3, 10)
    assert visits["20"]["code"] == "Visit/OP" and visits["20"]["end"] == _ts(2, 1, 18)
    assert visits["30"]["code"] == "Visit/IP" and visits["30"]["start"] == _ts(3, 1, 8)
    # domain rows keep their own timestamps
    domain = [r for r in rows if r["omop_table"] != "visit_occurrence"]
    assert all(r["code"].startswith(("SNOMED", "LOINC")) for r in domain)
    assert len(rows) == 7


@pytest.mark.slow
def test_ehrshot_to_omop_app_end_to_end(spark, tmp_path):
    """Full CSV → OMOP folder conversion through the CLI app."""
    import csv as _csv
    import os

    from cehrbert_data_spark.apps import ehrshot_to_omop as app

    rows = [
        # person events for patient 1
        ("0", 1, "1980-01-02 00:00:00", "", "SNOMED/3950001", "", "", "", "person"),
        ("1", 1, "1980-01-02 00:00:00", "", "Gender/F", "", "", "", "person"),
        ("2", 1, "1980-01-02 00:00:00", "", "Race/White", "", "", "", "person"),
        # one real inpatient visit with a condition inside it
        ("3", 1, "2020-03-01 08:00:00", "2020-03-03 08:00:00", "Visit/IP", "", "", "77", "visit_occurrence"),
        ("4", 1, "2020-03-01 10:00:00", "", "SNOMED/1234", "", "", "", "condition_occurrence"),
        # an orphan measurement far from the visit -> artificial visit id
        ("5", 1, "2020-06-01 09:00:00", "", "LOINC/999", "5.5", "mg", "", "measurement"),
    ]
    csv_path = str(tmp_path / "events.csv")
    with open(csv_path, "w", newline="") as fh:
        w = _csv.writer(fh)
        w.writerow(["_c0", "patient_id", "start", "end", "code", "value", "unit", "visit_id", "omop_table"])
        w.writerows(rows)

    vocab_dir = tmp_path / "vocab"
    concept = _concept(spark).unionByName(
        spark.createDataFrame(
            [(9201, "Visit", "Visit", "IP", "Inpatient"), (7, "Measurement", "LOINC", "999", "some lab")],
            "concept_id: int, domain_id: string, vocabulary_id: string, "
            "concept_code: string, concept_name: string",
        )
    )
    concept.write.parquet(str(vocab_dir / "concept"))

    out = str(tmp_path / "omop")
    written = app.main(csv_path, str(vocab_dir), out, spark=spark)
    assert {"person", "visit_occurrence", "condition_occurrence", "measurement", "concept"} <= set(written)

    person = spark.read.parquet(os.path.join(out, "person"))
    p = person.collect()[0]
    assert p["person_id"] == 1 and p["year_of_birth"] == 1980
    assert p["gender_concept_id"] == 1 and p["race_concept_id"] == 2

    visits = spark.read.parquet(os.path.join(out, "visit_occurrence"))
    vrows = visits.collect()
    # the real visit plus one artificial visit for the orphan measurement
    real = [r for r in vrows if r["visit_occurrence_id"] == 77]
    assert len(real) == 1 and real[0]["discharged_to_concept_id"] == 0
    assert any(r["visit_occurrence_id"] > 77 for r in vrows)

    cond = spark.read.parquet(os.path.join(out, "condition_occurrence"))
    c = cond.collect()[0]
    assert c["condition_concept_id"] == 5 and c["visit_occurrence_id"] == 77
    assert c["condition_occurrence_id"] == 1

    meas = spark.read.parquet(os.path.join(out, "measurement"))
    m = meas.collect()[0]
    assert m["value_as_number"] == 5.5 and m["visit_occurrence_id"] > 77
