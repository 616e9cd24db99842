"""Deterministic synthetic EHRSHOT export + vocabulary for golden parity.

The reference ships no EHRSHOT sample, so this module fabricates one —
four patients, ~40 rows — shaped to hit every load-bearing branch of the
converter (tools/ehrshot_to_omop.py):

- person pivot: birth (SNOMED/3950001) + Gender/Race/Ethnicity codes;
- real visits with ids (OP, IP, ERIP) and events inside them;
- an event with NO visit id -> the visit-minting path (generate_visit_id);
- an event tied to a visit but dated past day_cutoff outside its range ->
  the disconnect path mints a separate visit for it;
- an OP visit whose events span > 24 h -> promoted to an inferred
  inpatient visit (code rewritten to Visit/IP, span from the events);
- duplicate visit_occurrence rows for one visit id -> drop_duplicate_visits;
- measurements with a numeric value + UCUM unit and a categorical value
  matched by concept NAME (domain 'Meas Value');
- an unmappable code (concept_id falls back to 0).

``build_ehrshot_input(out_dir)`` writes ``ehrshot.csv`` plus a vocabulary
folder (concept / concept_relationship / concept_ancestor parquet) and
returns their paths. Everything is literal — no RNG, no wall clock.
"""

from __future__ import annotations

import os

import duckdb

#: (concept_id, domain_id, vocabulary_id, concept_class_id, concept_code,
#:  concept_name)
CONCEPTS = (
    (8507, "Gender", "Gender", "Gender", "M", "MALE"),
    (8532, "Gender", "Gender", "Gender", "F", "FEMALE"),
    (8527, "Race", "Race", "Race", "White", "White"),
    (8516, "Race", "Race", "Race", "Black", "Black or African American"),
    (38003563, "Ethnicity", "Ethnicity", "Ethnicity", "Hispanic", "Hispanic"),
    (38003564, "Ethnicity", "Ethnicity", "Ethnicity", "Not Hispanic", "Not Hispanic"),
    (9201, "Visit", "Visit", "Visit", "IP", "Inpatient Visit"),
    (9202, "Visit", "Visit", "Visit", "OP", "Outpatient Visit"),
    (262, "Visit", "Visit", "Visit", "ERIP", "Emergency Room and Inpatient Visit"),
    (101, "Condition", "SNOMED", "Clinical Finding", "C1", "Fixture condition one"),
    (102, "Condition", "SNOMED", "Clinical Finding", "C2", "Fixture condition two"),
    (103, "Condition", "SNOMED", "Clinical Finding", "C3", "Fixture condition three"),
    (201, "Drug", "RxNorm", "Clinical Drug", "D1", "Fixture drug one"),
    (202, "Drug", "RxNorm", "Clinical Drug", "D2", "Fixture drug two"),
    (301, "Measurement", "LOINC", "Lab Test", "L1", "Fixture lab one"),
    (302, "Measurement", "LOINC", "Lab Test", "L2", "Fixture lab two"),
    (401, "Unit", "UCUM", "Unit", "mg", "milligram"),
    (501, "Meas Value", "LOINC", "Answer", "POS", "Positive"),
)

#: (patient_id, start, end, code, value, unit, visit_id, omop_table)
EVENTS = (
    # --- patient 1: F/White/Not Hispanic, born 1980-01-05 ---
    (1, "1980-01-05 00:00:00", "", "SNOMED/3950001", "", "", "", "person"),
    (1, "1980-01-05 00:00:00", "", "Gender/F", "", "", "", "person"),
    (1, "1980-01-05 00:00:00", "", "Race/White", "", "", "", "person"),
    (1, "1980-01-05 00:00:00", "", "Ethnicity/Not Hispanic", "", "", "", "person"),
    # OP visit 1001 with an in-window condition + drug
    (1, "2019-03-01 09:00:00", "2019-03-01 10:00:00", "Visit/OP", "", "", "1001", "visit_occurrence"),
    (1, "2019-03-01 09:15:00", "", "SNOMED/C1", "", "", "1001", "condition_occurrence"),
    (1, "2019-03-01 09:30:00", "2019-03-08 09:30:00", "RxNorm/D1", "", "", "1001", "drug_exposure"),
    # ... and a condition dated 4 days past the visit end -> disconnected
    (1, "2019-03-05 14:00:00", "", "SNOMED/C3", "", "", "1001", "condition_occurrence"),
    # IP visit 1002 with labs: numeric + categorical-by-name + unmappable code
    (1, "2019-06-10 08:00:00", "2019-06-14 12:00:00", "Visit/IP", "", "", "1002", "visit_occurrence"),
    (1, "2019-06-11 07:30:00", "", "SNOMED/C2", "", "", "1002", "condition_occurrence"),
    (1, "2019-06-11 08:00:00", "", "LOINC/L1", "7.5", "mg", "1002", "measurement"),
    (1, "2019-06-12 08:00:00", "", "LOINC/L2", "Positive", "", "1002", "measurement"),
    (1, "2019-06-12 09:00:00", "", "LOINC/UNKNOWN", "1.25", "mg", "1002", "measurement"),
    # orphan condition with NO visit id -> a visit is minted around it
    (1, "2019-09-02 11:00:00", "", "SNOMED/C1", "", "", "", "condition_occurrence"),
    # --- patient 2: M/Black/Hispanic, born 1975-07-20 ---
    (2, "1975-07-20 00:00:00", "", "SNOMED/3950001", "", "", "", "person"),
    (2, "1975-07-20 00:00:00", "", "Gender/M", "", "", "", "person"),
    (2, "1975-07-20 00:00:00", "", "Race/Black", "", "", "", "person"),
    (2, "1975-07-20 00:00:00", "", "Ethnicity/Hispanic", "", "", "", "person"),
    # OP visit 2001 whose events span 30.5 h -> inferred inpatient
    (2, "2020-01-10 08:00:00", "2020-01-10 09:00:00", "Visit/OP", "", "", "2001", "visit_occurrence"),
    (2, "2020-01-10 09:00:00", "", "LOINC/L1", "3.25", "mg", "2001", "measurement"),
    (2, "2020-01-11 15:30:00", "", "SNOMED/C2", "", "", "2001", "condition_occurrence"),
    # plain OP visit 2002
    (2, "2020-02-20 10:00:00", "2020-02-20 11:00:00", "Visit/OP", "", "", "2002", "visit_occurrence"),
    (2, "2020-02-20 10:15:00", "2020-02-27 10:15:00", "RxNorm/D2", "", "", "2002", "drug_exposure"),
    # --- patient 3: F/White/Not Hispanic, born 1990-11-30 ---
    (3, "1990-11-30 00:00:00", "", "SNOMED/3950001", "", "", "", "person"),
    (3, "1990-11-30 00:00:00", "", "Gender/F", "", "", "", "person"),
    (3, "1990-11-30 00:00:00", "", "Race/White", "", "", "", "person"),
    (3, "1990-11-30 00:00:00", "", "Ethnicity/Not Hispanic", "", "", "", "person"),
    # duplicate visit rows for visit 3001: the ERIP row outranks the OP row
    # (drop_duplicate_visits keeps priority-1 codes; equal-priority ties are
    # order-nondeterministic in the reference, so the fixture discriminates
    # by priority, not by tie order)
    (3, "2020-04-05 22:00:00", "2020-04-06 06:00:00", "Visit/ERIP", "", "", "3001", "visit_occurrence"),
    (3, "2020-04-05 22:00:00", "2020-04-06 08:00:00", "Visit/OP", "", "", "3001", "visit_occurrence"),
    (3, "2020-04-05 23:00:00", "", "SNOMED/C3", "", "", "3001", "condition_occurrence"),
    # --- patient 4: demographics only ---
    (4, "1965-02-14 00:00:00", "", "SNOMED/3950001", "", "", "", "person"),
    (4, "1965-02-14 00:00:00", "", "Gender/M", "", "", "", "person"),
    (4, "1965-02-14 00:00:00", "", "Race/White", "", "", "", "person"),
    (4, "1965-02-14 00:00:00", "", "Ethnicity/Not Hispanic", "", "", "", "person"),
)


def volume_events(n_patients: int = 120) -> tuple:
    """Deterministic ~10-rows-per-patient export for the AT-VOLUME golden.

    The 4-patient sample can't stress the scale-sensitive reference
    behaviors: minted artificial visit ids are dense_rank over
    (patient_id, start date) ABOVE the max real id
    (reference tools/ehrshot_to_omop.py:523-527, 668-671), so id
    assignment only discriminates when many patients mint interleaved
    visits — and patient_id ORDER (string vs int: "100" < "2") only
    diverges once ids pass one digit. Every branch is driven by modular
    arithmetic on the patient number, no RNG:

    - every patient: demographics + 1-3 real visits (OP/IP/ERIP mix) with
      in-window conditions/drugs/measurements;
    - p % 3 == 0: an orphan event with NO visit id (minted visit);
    - p % 5 == 0: an event tied to visit 1 but 10 days past its end
      (the disconnect/re-segmentation path);
    - p % 7 == 0: duplicate visit rows for visit 1 — ERIP vs OP, distinct
      priorities only (equal-priority dedup is order-nondeterministic in
      the reference, so a fixture must never tie);
    - p % 11 == 0: an extra OP visit whose events span ~30 h (the
      inferred-inpatient promotion path).
    """
    import datetime

    events = []
    genders, races = ("M", "F"), ("White", "Black")
    eths = ("Not Hispanic", "Hispanic")
    conditions, drugs = ("C1", "C2", "C3"), ("D1", "D2")
    vcodes = ("OP", "IP", "ERIP")
    fmt = "%Y-%m-%d %H:%M:%S"
    for p in range(1, n_patients + 1):
        birth = datetime.datetime(1950 + p % 50, (p % 12) + 1, (p % 28) + 1)
        for code in (
            "SNOMED/3950001",
            f"Gender/{genders[p % 2]}",
            f"Race/{races[(p // 2) % 2]}",
            f"Ethnicity/{eths[(p // 4) % 2]}",
        ):
            events.append((p, birth.strftime(fmt), "", code, "", "", "", "person"))

        base = datetime.datetime(2018 + p % 3, (p % 12) + 1, (p * 3) % 28 + 1, 8)
        n_vis = 1 + p % 3
        for k in range(1, n_vis + 1):
            vid = p * 1000 + k
            t0 = base + datetime.timedelta(days=30 * k)
            code = vcodes[(p + k) % 3]
            if k == 1 and p % 7 == 0:
                code = "OP"  # the duplicate row below must outrank, not tie
            dur = datetime.timedelta(hours=1) if code == "OP" else datetime.timedelta(days=3)
            events.append(
                (p, t0.strftime(fmt), (t0 + dur).strftime(fmt), f"Visit/{code}", "", "", str(vid), "visit_occurrence")
            )
            events.append(
                (p, (t0 + datetime.timedelta(minutes=15)).strftime(fmt), "",
                 f"SNOMED/{conditions[(p + k) % 3]}", "", "", str(vid), "condition_occurrence")
            )
            if (p + k) % 2 == 0:
                ds = t0 + datetime.timedelta(minutes=30)
                events.append(
                    (p, ds.strftime(fmt), (ds + datetime.timedelta(days=7)).strftime(fmt),
                     f"RxNorm/{drugs[p % 2]}", "", "", str(vid), "drug_exposure")
                )
            if (p + k) % 4 == 0:
                events.append(
                    (p, (t0 + datetime.timedelta(minutes=20)).strftime(fmt), "",
                     "LOINC/L1", str(1.5 + (p % 10) * 0.25), "mg", str(vid), "measurement")
                )
        if p % 7 == 0:
            t0 = base + datetime.timedelta(days=30)
            events.append(
                (p, t0.strftime(fmt), (t0 + datetime.timedelta(hours=8)).strftime(fmt),
                 "Visit/ERIP", "", "", str(p * 1000 + 1), "visit_occurrence")
            )
        if p % 5 == 0:
            late = base + datetime.timedelta(days=40)
            events.append(
                (p, late.strftime(fmt), "", "SNOMED/C3", "", "", str(p * 1000 + 1), "condition_occurrence")
            )
        if p % 3 == 0:
            orphan = base + datetime.timedelta(days=200, hours=3)
            events.append(
                (p, orphan.strftime(fmt), "", f"SNOMED/{conditions[p % 3]}", "", "", "", "condition_occurrence")
            )
        if p % 11 == 0:
            vid = p * 1000 + 9
            t0 = base + datetime.timedelta(days=90)
            events.append(
                (p, t0.strftime(fmt), (t0 + datetime.timedelta(hours=1)).strftime(fmt),
                 "Visit/OP", "", "", str(vid), "visit_occurrence")
            )
            events.append(
                (p, (t0 + datetime.timedelta(minutes=10)).strftime(fmt), "",
                 "LOINC/L2", "Positive", "", str(vid), "measurement")
            )
            events.append(
                (p, (t0 + datetime.timedelta(hours=30)).strftime(fmt), "",
                 "SNOMED/C2", "", "", str(vid), "condition_occurrence")
            )
    return tuple(events)


def build_ehrshot_input(out_dir: str, events=EVENTS) -> tuple[str, str]:
    """Write ehrshot.csv + vocabulary/ under out_dir; return their paths."""
    os.makedirs(out_dir, exist_ok=True)
    csv_path = os.path.join(out_dir, "ehrshot.csv")
    with open(csv_path, "w") as fh:
        fh.write("_c0,patient_id,start,end,code,value,unit,visit_id,omop_table\n")
        for i, (pid, start, end, code, value, unit, vid, table) in enumerate(events):
            fh.write(f"{i},{pid},{start},{end},{code},{value},{unit},{vid},{table}\n")

    vocab_dir = os.path.join(out_dir, "vocabulary")
    con = duckdb.connect()
    concept_rows = ", ".join(
        f"({cid}, '{name}', '{dom}', '{vocab}', '{cls}', 'S', '{code}', "
        f"DATE '1970-01-01', DATE '2099-12-31', CAST(NULL AS VARCHAR))"
        for cid, dom, vocab, cls, code, name in CONCEPTS
    )
    tables = {
        "concept": f"""
            SELECT * FROM (VALUES {concept_rows})
            t(concept_id, concept_name, domain_id, vocabulary_id,
              concept_class_id, standard_concept, concept_code,
              valid_start_date, valid_end_date, invalid_reason)
        """,
        "concept_relationship": """
            SELECT CAST(NULL AS BIGINT) AS concept_id_1,
                   CAST(NULL AS BIGINT) AS concept_id_2,
                   CAST(NULL AS VARCHAR) AS relationship_id
            WHERE FALSE
        """,
        "concept_ancestor": """
            SELECT CAST(NULL AS BIGINT) AS ancestor_concept_id,
                   CAST(NULL AS BIGINT) AS descendant_concept_id,
                   CAST(NULL AS BIGINT) AS min_levels_of_separation,
                   CAST(NULL AS BIGINT) AS max_levels_of_separation
            WHERE FALSE
        """,
    }
    for name, sql in tables.items():
        d = os.path.join(vocab_dir, name)
        os.makedirs(d, exist_ok=True)
        con.sql(f"COPY ({sql}) TO '{os.path.join(d, 'part-0.parquet')}' (FORMAT PARQUET)")
    con.close()
    return csv_path, vocab_dir
