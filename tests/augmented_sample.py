"""Deterministic augmentation of the reference's 22-person OMOP sample.

The raw sample (/root/reference/sample_data/omop_sample) only supports two
non-empty prediction cohorts (readmission, hospitalization): every inpatient
stay is under 48 hours, there is no ``death`` table, and the bundled
``concept_ancestor`` slice carries none of the ancestor concepts the
diagnosis-driven cohorts seed from. This module derives an AUGMENTED copy —
same 22 persons, same physical string-typed schemas — that makes three more
reference cohort apps produce non-empty, discriminating output:

- ``hospitalization_mortality`` (prediction_cohorts/hospitalization_mortality.py):
  the eleven ``9201`` stays are extended to 96 h (> the query's 48 h floor) and
  two of them (visits 628 and 1732 — each its person's chronologically last
  inpatient stay) are discharged to 4216643 (expired), so the expired flag
  splits the cohort.
- ``discharge_home_death`` (cohorts/last_visit_discharged_home.py +
  cohorts/death.py): a ``death`` table with five deaths, each probing a
  different branch of the label engine. The reference's outcome builder
  requires the death to fall inside the person's observation period AND on
  or after their last visit start, so qualifying deaths must land in the
  narrow [last_visit_start, observation_period_end] window:
  - person 13 dies 11 days after their last home-discharged inpatient stay
    -> the cohort's only label-1 row;
  - person 10 dies > prediction_window after theirs -> member, label 0
    (outcome exists but outside the window);
  - person 3 would be a second label-1 but carries a DNR ``observation``
    row (concept 4119499) predating the death -> the NOT EXISTS exclusion
    removes their outcome and, lacking follow-up, drops them from the
    cohort entirely (an engine that ignores DNR resurrects them — caught);
  - person 15's death predates their last visit -> excluded by the
    last-visit <= death-date join (member, label 0);
  - person 21 dies at their observation end, decades after their only
    inpatient stay -> member, label 0.
- ``t2dm_hf`` (prediction_cohorts/t2dm_hf_cohort.py): a ``measurement``
  table (BNP / NT-proBNP rows) plus t2dm condition/drug and HF drug
  ancestry make the richest reference pair non-degenerate: drug-inclusion
  drops t2dm-dx persons without the seeded drug, an observation row
  excludes person 8, person 19's BNP 800 includes them in the HF outcome
  via the lab branch alone, person 13's sub-threshold NT-proBNP lands them
  in the NEGATIVE heart-failure cohort (removed from the target as a
  questionable outcome), and person 16 falls to the prior-observation rule.
- ``hf_readmission`` / ``copd_readmission`` (prediction_cohorts/): every ER
  visit (9203) that carries a same-day-or-later condition row is upgraded to
  ER-inpatient (262, 72 h, discharged home), and ``concept_ancestor`` gains
  heart-failure (316139) and COPD (255573, 258780) descendant rows over
  disjoint condition-concept sets (plus matching ``concept`` rows) so each
  cohort's concept-set join selects a different subset of those stays.

Everything is derived with fixed rules from the sample itself — no RNG, no
wall-clock — so the reference pipeline and this repo's engine can both be run
against a bit-identical input, and the committed goldens under
``tests/fixtures/golden/`` are reproducible from scratch via
``tools/make_golden.py``.
"""

from __future__ import annotations

import os

import duckdb

SAMPLE = "/root/reference/sample_data/omop_sample"

#: the sample's eleven inpatient (9201) stays, extended to 96 h
INPATIENT_EXTEND_HOURS = 96
#: upgraded ER stays (9203 -> 262) get 72 h
ER_EXTEND_HOURS = 72
#: visit_occurrence_ids discharged to 4216643 (expired); each is its person's
#: chronologically last inpatient stay so it stays rank-1 in the mortality query
EXPIRED_VISITS = ("628", "1732")
#: ancestor -> descendant concepts seeded into concept_ancestor (+ concept
#: rows); every descendant appears as condition_concept_id on upgraded
#: ER-inpatient stays. 316139 drives hf_readmission; 255573/258780 drive
#: copd_readmission (disjoint descendant sets so the cohorts differ).
SEEDED_ANCESTRY = {
    316139: {
        81151: "Heart failure golden fixture concept A",
        4218389: "Heart failure golden fixture concept B",
        4134304: "Heart failure golden fixture concept C",
        78272: "Heart failure golden fixture concept D",
    },
    255573: {
        4109685: "COPD golden fixture concept A",
        4278672: "COPD golden fixture concept B",
        4296204: "COPD golden fixture concept C",
        4001336: "COPD golden fixture concept D",
    },
    258780: {
        4237458: "COPD golden fixture concept E",
    },
    # afib_ischemic_stroke: widely-occurring conditions whose first-occurrence
    # timing splits labels (several persons stroke within 2y of first afib)
    313217: {
        260139: "Atrial fibrillation golden fixture concept A",
        28060: "Atrial fibrillation golden fixture concept B",
    },
    443454: {
        372328: "Ischemic stroke golden fixture concept A",
        4112343: "Ischemic stroke golden fixture concept B",
    },
    # cad_cabg: CAD conditions; 4186930 as a prior graft/stent procedure
    # (person 12's 2012 graft predates their 2014 CAD diagnosis, so the
    # NOT EXISTS exclusion removes a would-be label-1 member); 4060626 as
    # the CABG outcome procedure (98/714-day gaps split labels at pw=720)
    317576: {
        4217975: "CAD golden fixture concept A",
        439777: "CAD golden fixture concept B",
    },
    4296227: {
        4186930: "Graft-stent golden fixture procedure",
    },
    4305852: {
        4060626: "CABG golden fixture procedure",
    },
    # t2dm_hf: t2dm inclusion dx (19 persons), t2dm inclusion drug (11
    # persons — t2dm-dx persons without it drop), HF drug whose exposures sit
    # ON HF-dx visits (the drug-at-dx-visit inclusion branch); the BNP /
    # NT-proBNP / observation-exclusion ancestors resolve to themselves
    # (self-rows) and are exercised through MEASUREMENTS / T2DM_EXCLUSION_OBS
    443238: {
        40481087: "T2DM inclusion golden fixture concept",
    },
    1503297: {
        19133873: "T2DM drug golden fixture concept",
    },
    956874: {
        19078461: "HF drug golden fixture concept",
    },
    4307029: {},
    3029187: {},
    40769338: {},
}

#: (measurement_id, person_id, concept_id, datetime, value_source_value,
#:  value_as_concept_id, visit_occurrence_id):
#: person 19 -> BNP 800 (> 500: HF inclusion via lab alone); person 13 ->
#: NT-proBNP 1500 (<= 2000: NOT included -> lands in the negative HF cohort
#: and is removed from the t2dm target as a questionable outcome); the two
#: covid PCR rows drive covid_death/covid_ventilation — person 13's is
#: attached to their 2020 ER-inpatient stay, person 8's has NO visit and
#: must be re-linked to their ER visit starting 3 days later (the test
#: DATETIME stays the index; only the visit id/type are adopted)
MEASUREMENTS = (
    # lab rows ride real visits (dated at the visit) so the TRAINING
    # pipeline's measurement domain emits them as sequence tokens with
    # numeric values; person 8's visitless covid PCR stays detached
    ("900101", "19", "4307029", "2010-02-01 00:00:00", "800", "0", "1589"),
    ("900102", "13", "3029187", "2009-04-20 00:00:00", "1500", "0", "1081"),
    ("900103", "1", "0", "2012-05-12 00:00:00", "7.2", "0", "37"),
    ("900104", "2", "0", "2011-03-06 00:00:00", "not-a-number", "0", "113"),
    ("900105", "13", "723475", "2020-01-13 08:00:00", "Detected", "45884084", "1105"),
    ("900106", "8", "706178", "2020-05-28 10:30:00", "Detected", "45884084", "0"),
)

#: concept rows appended verbatim (value_as_concept_id -> 'Detected' for the
#: covid.py variant's concept-name join; note the reference also accepts the
#: misspelled 'Positve')
EXTRA_CONCEPTS = ((45884084, "Detected"),)

#: covid U07.1 diagnosis on person 21's 2020 ER visit (1945) — the condition
#: route into both covid cohorts. Appended AFTER the ER-upgrade rule is
#: computed from the raw sample, so visit 1945 stays 9203 (ER) and no other
#: fixture's membership shifts.
COVID_CONDITION = ("900201", "21", "37311061", "2020-02-15", "1945")

#: external ventilation table (cohorts/ventilation.py reads global_temp.vent):
#: person 13 ventilated 7 days after their covid index -> covid_ventilation's
#: label-1 row; person 2's 2015 placement predates any covid signal
VENT_ROWS = (
    ("13", "2020-01-20 10:00:00.000000"),
    ("2", "2015-02-01 09:00:00.000000"),
)

#: person 8 carries a 40769338 observation predating their first t2dm
#: diagnosis (1998-04-15) -> excluded from the t2dm target
T2DM_EXCLUSION_OBS = ("8", "40769338", "1997-01-01")

#: (person_id, death_date) — see module docstring for why each was chosen;
#: every qualifying death sits in [last_visit_start, observation_period_end]
DEATHS = (
    ("13", "2020-01-27"),
    ("10", "2019-09-02"),
    ("3", "2020-05-27"),
    ("15", "2020-02-01"),
    ("21", "2020-05-21"),
)
#: person 3 is DNR'd before their death -> excluded from the death cohort
DNR_OBSERVATION = ("3", "4119499", "2020-01-01")

TABLES = (
    "person", "visit_occurrence", "condition_occurrence", "drug_exposure",
    "procedure_occurrence", "observation_period", "concept",
    "concept_ancestor", "concept_relationship",
)


def build_augmented_sample(out_dir: str, sample_dir: str = SAMPLE) -> str:
    """Materialize the augmented sample under ``out_dir`` (one parquet file
    per table directory, mirroring the sample's layout). Idempotent."""
    con = duckdb.connect()

    def src(table: str) -> str:
        return f"read_parquet('{sample_dir}/{table}/*.parquet')"

    def write(table: str, sql: str) -> None:
        d = os.path.join(out_dir, table)
        os.makedirs(d, exist_ok=True)
        con.sql(
            f"COPY ({sql}) TO '{os.path.join(d, 'part-0.parquet')}' (FORMAT PARQUET)"
        )

    # ER-inpatient upgrades: 9203 visits carrying a condition row dated at or
    # after the visit start (the hf/copd target-join predicate).
    con.sql(f"""
        CREATE TEMP VIEW er_upgrades AS
        SELECT DISTINCT v.visit_occurrence_id
        FROM {src('visit_occurrence')} v
        JOIN {src('condition_occurrence')} co
          ON v.visit_occurrence_id = co.visit_occurrence_id
        WHERE v.visit_concept_id = '9203'
          AND v.visit_start_date <= co.condition_start_date
    """)

    expired = ", ".join(f"'{v}'" for v in EXPIRED_VISITS)
    write("visit_occurrence", f"""
        WITH base AS (
            SELECT v.*, (u.visit_occurrence_id IS NOT NULL) AS upgrade
            FROM {src('visit_occurrence')} v
            LEFT JOIN er_upgrades u USING (visit_occurrence_id)
        )
        SELECT
            visit_occurrence_id, person_id,
            CASE WHEN upgrade THEN '262' ELSE visit_concept_id END AS visit_concept_id,
            visit_start_date, visit_start_datetime,
            CASE
                WHEN visit_concept_id = '9201' THEN strftime(
                    CAST(visit_start_datetime AS TIMESTAMP)
                        + INTERVAL {INPATIENT_EXTEND_HOURS} HOURS, '%Y-%m-%d')
                WHEN upgrade THEN strftime(
                    CAST(visit_start_datetime AS TIMESTAMP)
                        + INTERVAL {ER_EXTEND_HOURS} HOURS, '%Y-%m-%d')
                ELSE visit_end_date
            END AS visit_end_date,
            CASE
                WHEN visit_concept_id = '9201' THEN strftime(
                    CAST(visit_start_datetime AS TIMESTAMP)
                        + INTERVAL {INPATIENT_EXTEND_HOURS} HOURS, '%Y-%m-%d %H:%M:%S.%f')
                WHEN upgrade THEN strftime(
                    CAST(visit_start_datetime AS TIMESTAMP)
                        + INTERVAL {ER_EXTEND_HOURS} HOURS, '%Y-%m-%d %H:%M:%S.%f')
                ELSE visit_end_datetime
            END AS visit_end_datetime,
            visit_type_concept_id, provider_id, care_site_id,
            visit_source_value, visit_source_concept_id,
            admitting_source_concept_id, admitting_source_value,
            discharge_to_source_value,
            CASE
                WHEN visit_occurrence_id IN ({expired}) THEN '4216643'
                WHEN visit_concept_id = '9201' OR upgrade THEN '8536'
                ELSE discharge_to_concept_id
            END AS discharge_to_concept_id,
            preceding_visit_occurrence_id
        FROM base
    """)

    ancestry_rows = ", ".join(
        [f"({a}, {a}, 0, 0)" for a in sorted(SEEDED_ANCESTRY)]
        + [
            f"({a}, {d}, 1, 1)"
            for a, descs in sorted(SEEDED_ANCESTRY.items())
            for d in sorted(descs)
        ]
    )
    write("concept_ancestor", f"""
        SELECT * FROM {src('concept_ancestor')}
        UNION ALL
        SELECT * FROM (VALUES {ancestry_rows})
            t(ancestor_concept_id, descendant_concept_id,
              min_levels_of_separation, max_levels_of_separation)
    """)

    concept_rows = ", ".join(
        [
            f"({cid}, '{name}')"
            for descs in SEEDED_ANCESTRY.values()
            for cid, name in sorted(descs.items())
        ]
        + [
            f"({a}, 'Golden fixture ancestor {a}')"
            for a in sorted(SEEDED_ANCESTRY)
        ]
        + [f"({cid}, '{name}')" for cid, name in EXTRA_CONCEPTS]
    )
    write("concept", f"""
        SELECT * FROM {src('concept')}
        UNION ALL
        SELECT concept_id, concept_name, 'Condition' AS domain_id,
               'SNOMED' AS vocabulary_id, 'Clinical Finding' AS concept_class_id,
               'S' AS standard_concept, CAST(concept_id AS VARCHAR) AS concept_code,
               DATE '1970-01-01' AS valid_start_date,
               DATE '2099-12-31' AS valid_end_date,
               CAST(NULL AS VARCHAR) AS invalid_reason
        FROM (VALUES {concept_rows}) t(concept_id, concept_name)
    """)

    death_rows = ", ".join(f"('{p}', '{d}')" for p, d in DEATHS)
    write("death", f"""
        SELECT person_id, death_date,
               death_date || ' 00:00:00.000000' AS death_datetime,
               '38003565' AS death_type_concept_id,
               '0' AS cause_concept_id,
               CAST(NULL AS VARCHAR) AS cause_source_value,
               '0' AS cause_source_concept_id
        FROM (VALUES {death_rows}) t(person_id, death_date)
    """)

    dnr_person, dnr_concept, dnr_date = DNR_OBSERVATION
    t2dm_person, t2dm_concept, t2dm_date = T2DM_EXCLUSION_OBS
    write("observation", f"""
        SELECT * FROM (VALUES
            ('900001', '{dnr_person}', '{dnr_concept}', '{dnr_date}',
             '{dnr_date} 00:00:00.000000', '38000280', CAST(NULL AS VARCHAR), '0'),
            ('900002', '1', '0', '2010-01-01',
             '2010-01-01 00:00:00.000000', '38000280', CAST(NULL AS VARCHAR), '0'),
            ('900003', '2', '0', '2011-06-01',
             '2011-06-01 00:00:00.000000', '38000280', CAST(NULL AS VARCHAR), '0'),
            ('900004', '{t2dm_person}', '{t2dm_concept}', '{t2dm_date}',
             '{t2dm_date} 00:00:00.000000', '38000280', CAST(NULL AS VARCHAR), '0')
        ) t(observation_id, person_id, observation_concept_id, observation_date,
            observation_datetime, observation_type_concept_id,
            value_as_string, observation_source_concept_id)
    """)

    def _numeric_or_null(v):
        try:
            float(v)
            return f"'{v}'"
        except ValueError:
            return "CAST(NULL AS VARCHAR)"

    measurement_rows = ", ".join(
        f"('{mid}', '{p}', '{cid}', '{dt[:10]}', '{dt}.000000', "
        f"'44818702', '{v}', {_numeric_or_null(v)}, '{vac}', '0', "
        f"CAST(NULL AS VARCHAR), '{vid}')"
        for mid, p, cid, dt, v, vac, vid in MEASUREMENTS
    )
    write("measurement", f"""
        SELECT * FROM (VALUES {measurement_rows})
        t(measurement_id, person_id, measurement_concept_id, measurement_date,
          measurement_datetime, measurement_type_concept_id, value_source_value,
          value_as_number, value_as_concept_id, unit_concept_id,
          unit_source_value, visit_occurrence_id)
    """)

    cid_, cp, cc, cd, cv = COVID_CONDITION
    write("condition_occurrence", f"""
        SELECT * FROM {src('condition_occurrence')}
        UNION ALL
        SELECT '{cid_}' AS condition_occurrence_id, '{cp}' AS person_id,
               '{cc}' AS condition_concept_id,
               '{cd}' AS condition_start_date,
               '{cd} 00:00:00.000000' AS condition_start_datetime,
               '{cd}' AS condition_end_date,
               '{cd} 00:00:00.000000' AS condition_end_datetime,
               '32020' AS condition_type_concept_id,
               CAST(NULL AS VARCHAR) AS condition_status_concept_id,
               CAST(NULL AS VARCHAR) AS stop_reason,
               CAST(NULL AS VARCHAR) AS provider_id,
               '{cv}' AS visit_occurrence_id,
               CAST(NULL AS VARCHAR) AS condition_source_value,
               '0' AS condition_source_concept_id,
               CAST(NULL AS VARCHAR) AS condition_status_source_value
    """)

    vent_rows = ", ".join(f"('{p}', '{ts}')" for p, ts in VENT_ROWS)
    write("vent", f"""
        SELECT * FROM (VALUES {vent_rows})
        t(person_id, earliest_placement_instant)
    """)

    for table in TABLES:
        if table not in (
            "visit_occurrence", "concept", "concept_ancestor",
            "condition_occurrence",
        ):
            write(table, f"SELECT * FROM {src(table)}")
    con.close()
    return out_dir
