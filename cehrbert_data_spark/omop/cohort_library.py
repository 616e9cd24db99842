"""The complete cohort-definition library: every cohort the reference ships,
re-expressed as QueryBuilder configs over this engine's session-view SQL.

Reference inventory (cohorts/*.py + prediction_cohorts/*.py):
atrial_fibrillation, ischemic_stroke, coronary_artery_disease, cabg,
type_two_diabetes, covid, covid_inpatient, death, heart_failure, ventilation,
last_visit_discharged_home, plus the SQL-defined prediction targets
(hf_hospitalization, copd_hospitalization, hospitalization target/outcome,
first/second hospitalization, hospitalization-mortality). The 12 prediction
apps are thin (target, outcome) pairs — see :data:`PREDICTION_COHORTS`.

Concept-id lists are OMOP standard-vocabulary ids taken verbatim from the
reference (they are the clinical contract); the SQL is this engine's own,
running against session temp views (not global_temp) so parallel builds don't
collide.
"""

from __future__ import annotations

from cehrbert_data_spark.omop.cohort import (
    ENTRY_COHORT,
    NEGATIVE_COHORT,
    AncestorTableSpec,
    QueryBuilder,
    QuerySpec,
)
from cehrbert_data_spark.omop.cohort_definitions import (
    hospitalization_outcome,
    hospitalization_target,
    last_visit_discharged_home,
    mortality_cohort,
)

# --- concept sets (reference: cohorts/*.py constants) ------------------------
ATRIAL_FIBRILLATION_CONCEPTS = [313217]
ISCHEMIC_STROKE_CONCEPTS = [443454]
CAD_CONCEPTS = [317576]
CAD_PRIOR_PROCEDURES = [4296227, 42537730, 762043, 44782770, 42537729]
CABG_CONCEPTS = [
    43528001, 43528003, 43528004, 43528002, 4305852, 4168831, 2107250,
    2107216, 2107222, 2107231, 4336464, 4231998, 4284104, 2100873,
]
T2DM_INCLUSION = [443238, 201820, 442793, 4016045]
T2DM_EXCLUSION = [
    40484648, 201254, 435216, 4058243, 30968, 438476, 195771, 193323,
    4019513, 40484649,
]
T2DM_DRUG_INCLUSION = [
    1503297, 1594973, 1597756, 1559684, 1560171, 1502855, 1502809, 1525215,
    1547504, 1580747, 40166035, 43013884, 40239216, 1516766, 1502826,
    1510202, 1529331, 35605670, 35602717, 1516976, 1502905, 46221581,
    1550023, 35198096, 42899447, 1544838, 1567198, 35884381, 1531601,
    1588986, 1513876, 19013951, 1590165, 1596977, 1586346, 19090204,
    1513843, 1513849, 1562586, 19090226, 19090221, 1586369, 19090244,
    19090229, 19090247, 19090249, 19090180, 19013926, 19091621, 19090187,
]
T2DM_OBSERVATION_EXCLUSION = [40769338, 43021173, 42539022, 46270562]
COVID_MEASUREMENT_CONCEPTS = [
    723475, 723479, 706178, 723473, 723474, 586515, 706177, 706163, 706180, 706181,
]
COVID_CONDITION_CONCEPT = 37311061
HEART_FAILURE_CONCEPTS = [316139]
HF_BNP_CONCEPTS = [4307029, 3031569, 3011960, 3052295]
HF_NT_PRO_BNP_CONCEPTS = [3029187, 42529224, 3029435, 42529225]
HF_DRUG_CONCEPTS = [
    956874, 942350, 987406, 932745, 1309799, 970250, 992590, 907013, 1942960,
]
HF_MECHANICAL_SUPPORT_CONCEPTS = [
    45888564, 4052536, 4337306, 2107514, 45889695, 2107500, 45887675,
    43527920, 2107501, 45890116, 40756954, 4338594, 43527923, 40757060,
    2100812,
]
HF_DIALYSIS_CONCEPTS = [4032243, 45889365]
HF_ARTIFICIAL_HEART_CONCEPTS = [
    4144390, 4150347, 4281764, 725038, 725037, 2100816, 2100822, 725039,
    2100828, 4337306, 4140024, 4146121, 4060257, 4309033, 4222272, 4243758,
    4241906, 4080968, 4224193, 4052537, 4050864,
]
HF_DIURETIC_CONCEPTS = [4186999]
COPD_CONCEPTS = [255573, 258780]
INPATIENT_VISITS = [9201, 262]
EXTENDED_INPATIENT_VISITS = [9201, 262, 8971, 8920]
HOME_DISCHARGE = 8536
EXPIRED_DISCHARGE = 4216643

# Index-date convention for "first diagnosis/procedure" cohorts: 23:59 of the
# visit start date when the event was recorded up to a day before the visit,
# else 23:59 of the event date (reference: cohorts/atrial_fibrillation.py CASE).
_INDEX_AT_2359 = """
    CASE WHEN e.{event_datetime} < vo.visit_start_datetime
              AND DATEDIFF(vo.visit_start_datetime, e.{event_datetime}) <= 1
         THEN TO_TIMESTAMP(CONCAT(DATE_FORMAT(vo.visit_start_date, 'yyyy-MM-dd'), ' 23:59:00'))
         ELSE TO_TIMESTAMP(CONCAT(DATE_FORMAT(e.{event_date}, 'yyyy-MM-dd'), ' 23:59:00'))
    END
"""


def _first_event_template(
    event_table: str,
    concept_col: str,
    event_date: str,
    event_datetime: str,
    concepts_view: str,
    extra_where: str = "",
) -> str:
    """Earliest qualifying event per person with the 23:59 index convention —
    the shape shared by the afib / stroke / CAD / t2dm / cabg definitions."""
    index_expr = _INDEX_AT_2359.format(
        event_datetime=event_datetime, event_date=event_date
    )
    return f"""
        SELECT person_id, index_date, visit_occurrence_id
        FROM (
            SELECT e.person_id,
                   vo.visit_occurrence_id,
                   {index_expr} AS index_date,
                   ROW_NUMBER() OVER (
                       PARTITION BY e.person_id
                       ORDER BY e.{event_datetime}, e.{event_date}, e.visit_occurrence_id
                   ) AS rn
            FROM {event_table} e
            JOIN visit_occurrence vo
              ON e.visit_occurrence_id = vo.visit_occurrence_id
            JOIN {concepts_view} c
              ON e.{concept_col} = c.concept_id
        ) t
        WHERE rn = 1 {extra_where}
    """


def _first_diagnosis_builder(
    name: str, concepts: list[int], extra_where: str = "",
    extra_specs: list[AncestorTableSpec] | None = None,
    extra_deps: list[str] | None = None,
    dependency_queries: list[QuerySpec] | None = None,
) -> QueryBuilder:
    concepts_view = f"{name}_concepts"
    query = QuerySpec(
        table_name=name,
        query_template=_first_event_template(
            "condition_occurrence", "condition_concept_id",
            "condition_start_date", "condition_start_datetime",
            concepts_view, extra_where,
        ),
        parameters={},
    )
    return QueryBuilder(
        cohort_name=name,
        dependency_list=["person", "visit_occurrence", "condition_occurrence"]
        + (extra_deps or []),
        query=query,
        dependency_queries=dependency_queries,
        ancestor_table_specs=[
            AncestorTableSpec(concepts_view, concepts, is_standard=True)
        ] + (extra_specs or []),
    )


def atrial_fibrillation() -> QueryBuilder:
    """First atrial-fibrillation diagnosis (cohorts/atrial_fibrillation.py)."""
    return _first_diagnosis_builder("atrial_fibrillation", ATRIAL_FIBRILLATION_CONCEPTS)


def ischemic_stroke() -> QueryBuilder:
    """First ischemic-stroke diagnosis (cohorts/ischemic_stroke.py)."""
    return _first_diagnosis_builder("ischemic_stroke", ISCHEMIC_STROKE_CONCEPTS)


def coronary_artery_disease(date_lower_bound: str = "1985-01-01") -> QueryBuilder:
    """First CAD diagnosis with no prior graft/stent procedure
    (cohorts/coronary_artery_disease.py)."""
    name = "coronary_artery_disease"
    concepts_view = f"{name}_concepts"
    core = _first_event_template(
        "condition_occurrence", "condition_concept_id",
        "condition_start_date", "condition_start_datetime", concepts_view,
    )
    query = QuerySpec(
        table_name=name,
        query_template=f"""
            SELECT c.person_id, c.index_date, c.visit_occurrence_id
            FROM ({core}) c
            WHERE NOT EXISTS (
                SELECT 1 FROM procedure_occurrence po
                JOIN cad_prior_procedure_concepts gs
                  ON po.procedure_concept_id = gs.concept_id
                WHERE po.person_id = c.person_id
                  AND c.index_date > po.procedure_date
            )
              AND c.index_date >= '{{date_lower_bound}}'
        """,
        parameters={"date_lower_bound": date_lower_bound},
    )
    return QueryBuilder(
        cohort_name=name,
        dependency_list=[
            "person", "visit_occurrence", "condition_occurrence", "procedure_occurrence",
        ],
        query=query,
        ancestor_table_specs=[
            AncestorTableSpec(concepts_view, CAD_CONCEPTS, is_standard=True),
            AncestorTableSpec("cad_prior_procedure_concepts", CAD_PRIOR_PROCEDURES, is_standard=True),
        ],
    )


def cabg(date_lower_bound: str = "1985-01-01") -> QueryBuilder:
    """First coronary-artery-bypass-graft procedure (cohorts/cabg.py)."""
    name = "cabg"
    concepts_view = f"{name}_concepts"
    query = QuerySpec(
        table_name=name,
        query_template=_first_event_template(
            "procedure_occurrence", "procedure_concept_id",
            "procedure_date", "procedure_datetime", concepts_view,
            extra_where=f"AND index_date >= '{date_lower_bound}'",
        ),
        parameters={},
    )
    return QueryBuilder(
        cohort_name=name,
        dependency_list=["person", "visit_occurrence", "procedure_occurrence"],
        query=query,
        ancestor_table_specs=[
            AncestorTableSpec(concepts_view, CABG_CONCEPTS, is_standard=True)
        ],
    )


def type_two_diabetes(date_lower_bound: str = "1985-01-01") -> QueryBuilder:
    """First T2DM diagnosis, requiring an anti-diabetic drug exposure and no
    prior exclusion observation (cohorts/type_two_diabietes.py)."""
    name = "type_two_diabetes"
    concepts_view = f"{name}_concepts"
    core = _first_event_template(
        "condition_occurrence", "condition_concept_id",
        "condition_start_date", "condition_start_datetime", concepts_view,
    )
    query = QuerySpec(
        table_name=name,
        query_template=f"""
            SELECT DISTINCT c.person_id, c.index_date, c.visit_occurrence_id
            FROM ({core}) c
            JOIN (
                SELECT DISTINCT d.person_id
                FROM drug_exposure d
                JOIN t2dm_drug_concepts e ON d.drug_concept_id = e.concept_id
            ) drugs ON c.person_id = drugs.person_id
            LEFT JOIN (
                SELECT DISTINCT o.person_id, o.observation_date
                FROM observation o
                JOIN t2dm_observation_exclusion_concepts x
                  ON o.observation_concept_id = x.concept_id
            ) excl
              ON c.person_id = excl.person_id AND c.index_date > excl.observation_date
            WHERE excl.person_id IS NULL
              AND c.index_date >= '{{date_lower_bound}}'
        """,
        parameters={"date_lower_bound": date_lower_bound},
    )
    return QueryBuilder(
        cohort_name=name,
        dependency_list=[
            "person", "visit_occurrence", "condition_occurrence",
            "drug_exposure", "observation",
        ],
        query=query,
        ancestor_table_specs=[
            AncestorTableSpec(concepts_view, T2DM_INCLUSION, is_standard=True),
            AncestorTableSpec("t2dm_exclusion_concepts", T2DM_EXCLUSION, is_standard=True),
            AncestorTableSpec("t2dm_drug_concepts", T2DM_DRUG_INCLUSION, is_standard=True),
            AncestorTableSpec(
                "t2dm_observation_exclusion_concepts",
                T2DM_OBSERVATION_EXCLUSION,
                is_standard=True,
            ),
        ],
    )


def covid() -> QueryBuilder:
    """First COVID-positive signal (positive PCR measurement or U07.1
    diagnosis), indexed the day after the first qualifying visit
    (cohorts/covid.py)."""
    measurement_ids = ",".join(map(str, COVID_MEASUREMENT_CONCEPTS))
    query = QuerySpec(
        table_name="covid19",
        query_template=f"""
            WITH positives AS (
                SELECT m.person_id, v.visit_start_date, v.visit_occurrence_id
                FROM measurement m
                JOIN visit_occurrence v ON m.visit_occurrence_id = v.visit_occurrence_id
                JOIN concept c ON m.value_as_concept_id = c.concept_id
                WHERE m.measurement_concept_id IN ({measurement_ids})
                  AND c.concept_name IN ('Detected', 'Positve')
                UNION
                SELECT co.person_id, v.visit_start_date, v.visit_occurrence_id
                FROM condition_occurrence co
                JOIN visit_occurrence v ON co.visit_occurrence_id = v.visit_occurrence_id
                WHERE co.condition_concept_id = {COVID_CONDITION_CONCEPT}
            )
            SELECT person_id,
                   DATE_ADD(MIN(visit_start_date), 1) AS index_date,
                   MIN_BY(visit_occurrence_id, STRUCT(visit_start_date, visit_occurrence_id))
                       AS visit_occurrence_id
            FROM positives
            GROUP BY person_id
        """,
        parameters={},
    )
    return QueryBuilder(
        cohort_name="covid19",
        dependency_list=[
            "person", "visit_occurrence", "measurement", "condition_occurrence", "concept",
        ],
        query=query,
    )


def covid_inpatient() -> QueryBuilder:
    """First COVID-positive event attached to an inpatient/ER visit; tests
    recorded without a visit are re-linked to a visit starting within the
    following 7 days (cohorts/covid_inpatient.py)."""
    measurement_ids = ",".join(map(str, COVID_MEASUREMENT_CONCEPTS))
    inpatient_ids = ",".join(map(str, [262, 9203, 9201]))
    query = QuerySpec(
        table_name="covid19_inpatient",
        query_template=f"""
            WITH positives AS (
                SELECT m.person_id,
                       COALESCE(vo.visit_start_datetime, m.measurement_datetime) AS index_date,
                       vo.visit_occurrence_id, vo.visit_concept_id
                FROM measurement m
                LEFT JOIN visit_occurrence vo
                  ON m.visit_occurrence_id = vo.visit_occurrence_id
                WHERE m.measurement_concept_id IN ({measurement_ids})
                  AND m.value_source_value = 'Detected'
                UNION
                SELECT co.person_id,
                       COALESCE(vo.visit_start_datetime, co.condition_start_datetime) AS index_date,
                       vo.visit_occurrence_id, vo.visit_concept_id
                FROM condition_occurrence co
                LEFT JOIN visit_occurrence vo
                  ON co.visit_occurrence_id = vo.visit_occurrence_id
                WHERE co.condition_concept_id = {COVID_CONDITION_CONCEPT}
            ),
            relinked AS (
                SELECT p.person_id,
                       COALESCE(p.index_date, v.visit_start_datetime) AS index_date,
                       COALESCE(p.visit_occurrence_id, v.visit_occurrence_id) AS visit_occurrence_id,
                       COALESCE(p.visit_concept_id, v.visit_concept_id) AS visit_concept_id
                FROM positives p
                LEFT JOIN visit_occurrence v
                  ON p.visit_occurrence_id IS NULL
                 AND p.person_id = v.person_id
                 AND p.index_date BETWEEN DATE_ADD(v.visit_start_date, -7)
                                      AND v.visit_start_date
            )
            SELECT person_id,
                   MIN(index_date) AS index_date,
                   MIN_BY(visit_occurrence_id, index_date) AS visit_occurrence_id
            FROM relinked
            WHERE visit_concept_id IN ({inpatient_ids})
            GROUP BY person_id
        """,
        parameters={},
    )
    return QueryBuilder(
        cohort_name="covid19_inpatient",
        dependency_list=[
            "person", "visit_occurrence", "measurement", "condition_occurrence",
        ],
        query=query,
    )


def death() -> QueryBuilder:
    """Death cohort with DNR exclusion (cohorts/death.py) — the engine's
    mortality definition."""
    return mortality_cohort()


def ventilation() -> QueryBuilder:
    """Mechanical-ventilation placements from an externally supplied ``vent``
    table (cohorts/ventilation.py)."""
    query = QuerySpec(
        table_name="ventilation",
        query_template="""
            SELECT DISTINCT person_id,
                   earliest_placement_instant AS index_date,
                   CAST(NULL AS INT) AS visit_occurrence_id
            FROM vent
        """,
        parameters={},
    )
    return QueryBuilder(
        cohort_name="ventilation", dependency_list=["vent"], query=query
    )


def heart_failure() -> QueryBuilder:
    """Heart-failure phenotype (cohorts/heart_failure.py): earliest HF
    diagnosis visit (requiring the first visit at/before the first diagnosis)
    with an inclusion flag for elevated BNP/NT-proBNP, an HF-specific
    treatment procedure, or an HF drug at a diagnosis visit. Mirrors the
    reference's builder structure (heart_failure.py:316-425): an
    ``intermediate_heart_failure`` dependency view carrying the inclusion
    flag, a main query keeping inclusion=1, a NEGATIVE query (inclusion=0 —
    the 'questionable outcome' persons removed from any target this cohort
    labels), an entry-cohort query, and a diuretics ancestry built by the
    iterative 'Subsumes' BFS (is_standard=False) whose descendants map to
    ingredients through 'Maps to' + concept_ancestor. Golden-pinned via
    t2dm_hf in tests/test_golden_cohort.py."""
    diuretics_rollup = QuerySpec(
        table_name="hf_diuretic_ingredient_concepts",
        query_template="""
            SELECT DISTINCT c.concept_id
            FROM hf_diuretics_ancestry a
            JOIN concept_relationship cr
              ON a.descendant_concept_id = cr.concept_id_1
             AND cr.relationship_id = 'Maps to'
            JOIN concept_ancestor ca
              ON cr.concept_id_2 = ca.descendant_concept_id
            JOIN concept c
              ON ca.ancestor_concept_id = c.concept_id
            WHERE c.concept_class_id = 'Ingredient'
        """,
        parameters={},
    )
    intermediate = QuerySpec(
        table_name="intermediate_heart_failure",
        query_template="""
            WITH hf_events AS (
                SELECT co.person_id, co.visit_occurrence_id, co.condition_start_date
                FROM condition_occurrence co
                JOIN heart_failure_concepts hf
                  ON co.condition_concept_id = hf.concept_id
            ),
            entry AS (
                SELECT person_id, index_date, visit_occurrence_id
                FROM (
                    SELECT e.person_id,
                           MIN(v.visit_start_date) OVER (PARTITION BY e.person_id) AS index_date,
                           MIN_BY(v.visit_occurrence_id, STRUCT(v.visit_start_date, v.visit_occurrence_id))
                               OVER (PARTITION BY e.person_id) AS visit_occurrence_id,
                           MIN(e.condition_start_date) OVER (PARTITION BY e.person_id)
                               AS first_dx_date
                    FROM hf_events e
                    JOIN visit_occurrence v
                      ON e.visit_occurrence_id = v.visit_occurrence_id
                ) t
                WHERE index_date <= first_dx_date
                GROUP BY person_id, index_date, visit_occurrence_id
            ),
            bnp AS (
                SELECT DISTINCT m.person_id
                FROM measurement m
                JOIN hf_bnp_concepts b ON m.measurement_concept_id = b.concept_id
                WHERE TRY_CAST(m.value_source_value AS DOUBLE) > 500
                UNION
                SELECT DISTINCT m.person_id
                FROM measurement m
                JOIN hf_nt_pro_bnp_concepts nb ON m.measurement_concept_id = nb.concept_id
                WHERE TRY_CAST(m.value_source_value AS DOUBLE) > 2000
            ),
            treatment AS (
                SELECT DISTINCT p.person_id
                FROM procedure_occurrence p
                JOIN (
                    SELECT concept_id FROM hf_mechanical_support_concepts
                    UNION ALL SELECT concept_id FROM hf_dialysis_concepts
                    UNION ALL SELECT concept_id FROM hf_artificial_heart_concepts
                ) tc ON p.procedure_concept_id = tc.concept_id
            ),
            drug_at_dx_visit AS (
                SELECT DISTINCT e.person_id
                FROM hf_events e
                JOIN drug_exposure d ON e.visit_occurrence_id = d.visit_occurrence_id
                JOIN (
                    SELECT concept_id FROM hf_drug_concepts
                    UNION SELECT concept_id FROM hf_diuretic_ingredient_concepts
                ) dc ON d.drug_concept_id = dc.concept_id
            )
            SELECT e.person_id, e.index_date, e.visit_occurrence_id,
                   CAST(COALESCE(b.person_id, t.person_id, d.person_id)
                        IS NOT NULL AS INT) AS inclusion
            FROM entry e
            LEFT JOIN (SELECT DISTINCT person_id FROM bnp) b
              ON e.person_id = b.person_id
            LEFT JOIN (SELECT DISTINCT person_id FROM treatment) t
              ON e.person_id = t.person_id
            LEFT JOIN (SELECT DISTINCT person_id FROM drug_at_dx_visit) d
              ON e.person_id = d.person_id
        """,
        parameters={},
    )
    select_inclusion = (
        "SELECT person_id, index_date, visit_occurrence_id "
        "FROM intermediate_heart_failure WHERE inclusion = {inclusion}"
    )
    return QueryBuilder(
        cohort_name="heart_failure",
        dependency_list=[
            "person", "visit_occurrence", "condition_occurrence", "drug_exposure",
            "procedure_occurrence", "measurement", "concept",
            "concept_relationship", "concept_ancestor",
        ],
        query=QuerySpec("heart_failure", select_inclusion, {"inclusion": 1}),
        negative_query=QuerySpec(NEGATIVE_COHORT, select_inclusion, {"inclusion": 0}),
        entry_cohort_query=QuerySpec(
            ENTRY_COHORT,
            "SELECT person_id, index_date, visit_occurrence_id "
            "FROM intermediate_heart_failure",
            {},
        ),
        dependency_queries=[diuretics_rollup, intermediate],
        ancestor_table_specs=[
            AncestorTableSpec("heart_failure_concepts", HEART_FAILURE_CONCEPTS, is_standard=True),
            AncestorTableSpec("hf_bnp_concepts", HF_BNP_CONCEPTS, is_standard=True),
            AncestorTableSpec("hf_nt_pro_bnp_concepts", HF_NT_PRO_BNP_CONCEPTS, is_standard=True),
            AncestorTableSpec("hf_drug_concepts", HF_DRUG_CONCEPTS, is_standard=True),
            AncestorTableSpec(
                "hf_mechanical_support_concepts", HF_MECHANICAL_SUPPORT_CONCEPTS, is_standard=True
            ),
            AncestorTableSpec("hf_dialysis_concepts", HF_DIALYSIS_CONCEPTS, is_standard=True),
            AncestorTableSpec(
                "hf_artificial_heart_concepts", HF_ARTIFICIAL_HEART_CONCEPTS, is_standard=True
            ),
            AncestorTableSpec("hf_diuretics_ancestry", HF_DIURETIC_CONCEPTS, is_standard=False),
        ],
    )


# --- SQL-defined prediction targets (prediction_cohorts/*.py) ----------------

def _discharged_inpatient_dx_target(
    name: str,
    ancestor_concept_ids: list[int],
    visit_concept_ids: list[int],
    discharge_filter: str,
    date_lower_bound: str | None = None,
) -> QueryBuilder:
    """Inpatient visits carrying a qualifying diagnosis, indexed at discharge
    (the hf_readmission / copd_readmission target shape)."""
    concepts_view = f"{name}_dx_concepts"
    visit_ids = ",".join(map(str, visit_concept_ids))
    date_filter = (
        f"AND v.visit_end_date >= '{date_lower_bound}'" if date_lower_bound else ""
    )
    query = QuerySpec(
        table_name=name,
        query_template=f"""
            SELECT DISTINCT v.person_id, v.visit_occurrence_id,
                   COALESCE(v.visit_end_datetime, CAST(v.visit_end_date AS TIMESTAMP)) AS index_date
            FROM visit_occurrence v
            JOIN condition_occurrence co
              ON v.visit_occurrence_id = co.visit_occurrence_id
            JOIN {concepts_view} dx
              ON co.condition_concept_id = dx.concept_id
            WHERE v.visit_concept_id IN ({visit_ids})
              AND {discharge_filter}
              AND v.visit_start_date <= co.condition_start_date
              {date_filter}
        """,
        parameters={},
    )
    return QueryBuilder(
        cohort_name=name,
        dependency_list=["person", "condition_occurrence", "visit_occurrence"],
        query=query,
        ancestor_table_specs=[
            AncestorTableSpec(concepts_view, ancestor_concept_ids, is_standard=True)
        ],
    )


def hf_hospitalization(date_lower_bound: str = "1985-01-01") -> QueryBuilder:
    """HF inpatient discharge, excluding expired/hospice-like discharges
    (prediction_cohorts/hf_readmission.py)."""
    excluded = ",".join(map(str, [4216643, 44814650, 8717, 8970, 8971]))
    return _discharged_inpatient_dx_target(
        "hf_hospitalization",
        HEART_FAILURE_CONCEPTS,
        EXTENDED_INPATIENT_VISITS,
        f"v.discharged_to_concept_id NOT IN ({excluded})",
        date_lower_bound,
    )


def copd_hospitalization() -> QueryBuilder:
    """COPD inpatient stay discharged home (prediction_cohorts/copd_readmission.py)."""
    return _discharged_inpatient_dx_target(
        "copd_hospitalization",
        COPD_CONCEPTS,
        INPATIENT_VISITS,
        f"v.discharged_to_concept_id = {HOME_DISCHARGE}",
    )


def inpatient_admission(
    name: str = "hospitalization",
    visit_concept_ids: list[int] | None = None,
    index_at: str = "start",
) -> QueryBuilder:
    """Any inpatient/ER admission, indexed at visit start or end
    (the shared outcome of the readmission-style apps)."""
    visit_ids = ",".join(map(str, visit_concept_ids or EXTENDED_INPATIENT_VISITS))
    index_expr = (
        "COALESCE(v.visit_start_datetime, CAST(v.visit_start_date AS TIMESTAMP))"
        if index_at == "start"
        else "COALESCE(v.visit_end_datetime, CAST(v.visit_end_date AS TIMESTAMP))"
    )
    query = QuerySpec(
        table_name=name,
        query_template=f"""
            SELECT DISTINCT v.person_id, v.visit_occurrence_id,
                   {index_expr} AS index_date
            FROM visit_occurrence v
            WHERE v.visit_concept_id IN ({visit_ids})
        """,
        parameters={},
    )
    return QueryBuilder(
        cohort_name=name,
        dependency_list=["person", "visit_occurrence"],
        query=query,
    )


def hospitalization_mortality_target(date_lower_bound: str = "1985-01-01") -> QueryBuilder:
    """Last inpatient stay over 48h, indexed 24h after admission, carrying the
    in-hospital death flag (prediction_cohorts/hospitalization_mortality.py)."""
    visit_ids = ",".join(map(str, INPATIENT_VISITS))
    query = QuerySpec(
        table_name="hospitalization_mortality_target",
        query_template=f"""
            SELECT person_id, visit_occurrence_id, index_date, expired
            FROM (
                SELECT v.person_id, v.visit_occurrence_id,
                       v.visit_start_datetime + INTERVAL 24 HOURS AS index_date,
                       CAST(v.discharged_to_concept_id = {EXPIRED_DISCHARGE} AS INT) AS expired,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.person_id
                           ORDER BY COALESCE(v.visit_end_datetime, v.visit_end_date) DESC
                       ) AS rn
                FROM visit_occurrence v
                WHERE v.visit_concept_id IN ({visit_ids})
                  AND v.visit_end_datetime IS NOT NULL
                  AND (UNIX_TIMESTAMP(v.visit_end_datetime)
                       - UNIX_TIMESTAMP(v.visit_start_datetime)) / 3600 > 48
            ) t
            WHERE rn = 1 AND index_date >= '{{date_lower_bound}}'
        """,
        parameters={"date_lower_bound": date_lower_bound},
    )
    return QueryBuilder(
        cohort_name="hospitalization_mortality_target",
        dependency_list=["person", "visit_occurrence"],
        query=query,
    )


def hospitalization_mortality_outcome() -> QueryBuilder:
    """The expired subset of the mortality target (same source view)."""
    query = QuerySpec(
        table_name="hospitalization_mortality",
        query_template="""
            SELECT DISTINCT person_id, visit_occurrence_id, index_date
            FROM hospitalization_mortality_target
            WHERE expired = 1
        """,
        parameters={},
    )
    return QueryBuilder(
        cohort_name="hospitalization_mortality",
        dependency_list=["hospitalization_mortality_target"],
        query=query,
    )


#: The reference's 12 prediction apps as (target, outcome) builder factories
#: (prediction_cohorts/*.py). Run each pair through
#: ``omop.cohort.build_base_cohort`` + ``label_cohort``.
PREDICTION_COHORTS: dict[str, tuple] = {
    "afib_ischemic_stroke": (atrial_fibrillation, ischemic_stroke),
    "cad_cabg": (coronary_artery_disease, cabg),
    "cad_hf": (coronary_artery_disease, heart_failure),
    "copd_readmission": (
        copd_hospitalization,
        lambda: inpatient_admission("hospitalization", INPATIENT_VISITS),
    ),
    "covid_death": (covid_inpatient, death),
    "covid_ventilation": (covid, ventilation),
    "discharge_home_death": (last_visit_discharged_home, death),
    "hf_readmission": (hf_hospitalization, lambda: inpatient_admission("hospitalization")),
    "hospitalization": (hospitalization_target, hospitalization_outcome),
    "hospitalization_mortality": (
        hospitalization_mortality_target,
        hospitalization_mortality_outcome,
    ),
    "readmission": (
        lambda: inpatient_admission("first_hospitalization", index_at="end"),
        lambda: inpatient_admission("second_hospitalization", index_at="start"),
    ),
    "t2dm_hf": (type_two_diabetes, heart_failure),
}
