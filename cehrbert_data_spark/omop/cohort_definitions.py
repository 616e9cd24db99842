"""Representative cohort definitions on the D8 framework.

The reference ships 14 cohort modules + 13 prediction apps, all thin
QueryBuilder configs (reference: cohorts/*.py, prediction_cohorts/*.py).
These definitions reproduce the load-bearing patterns in this engine's own
SQL (session views, not global_temp):

  * ``mortality``            — death date qualified by a last-visit bound and
                               a NOT EXISTS DNR exclusion
                               (pattern of cohorts/death.py)
  * ``first_diagnosis``      — generic earliest-occurrence-of-descendant-
                               concepts cohort: the shape shared by the
                               t2dm / atrial-fibrillation / CAD / stroke
                               definitions (cohorts/type_two_diabietes.py etc.)
  * ``hospitalization_*``    — inpatient-admission target/outcome pair
                               (prediction_cohorts/hospitalization.py)
  * ``last_visit_discharged_home`` — most recent home-discharged visit
                               (cohorts/last_visit_discharged_home.py)

Each returns a :class:`QueryBuilder`; run through
``omop.cohort.build_base_cohort`` / ``label_cohort``.
"""

from __future__ import annotations

from cehrbert_data_spark.omop.cohort import AncestorTableSpec, QueryBuilder, QuerySpec

DNR_CONCEPT_IDS = [36712886, 4119499, 4275347]
HOME_DISCHARGE_CONCEPT_ID = 8536
INPATIENT_CONCEPT_IDS = [9201, 262]


def mortality_cohort() -> QueryBuilder:
    """Death date as index, requiring a visit before death and no DNR order
    on record (semantics of cohorts/death.py)."""
    query = QuerySpec(
        table_name="mortality",
        query_template="""
            WITH last_death AS (
                SELECT person_id, MAX(death_date) AS death_date
                FROM death GROUP BY person_id
            ),
            last_visit AS (
                SELECT person_id, MAX(visit_start_date) AS last_visit_start_date
                FROM visit_occurrence GROUP BY person_id
            )
            SELECT d.person_id,
                   d.death_date AS index_date,
                   CAST(NULL AS INT) AS visit_occurrence_id
            FROM last_death d
            JOIN last_visit v
              ON d.person_id = v.person_id
             AND v.last_visit_start_date <= d.death_date
            WHERE NOT EXISTS (
                SELECT 1 FROM observation o
                WHERE o.person_id = d.person_id
                  AND o.observation_concept_id IN ({dnr_concepts})
                  AND o.observation_datetime <= d.death_date
            )
        """,
        parameters={"dnr_concepts": ",".join(map(str, DNR_CONCEPT_IDS))},
    )
    return QueryBuilder(
        cohort_name="mortality",
        dependency_list=["person", "visit_occurrence", "death", "observation"],
        query=query,
    )


def first_diagnosis_cohort(
    cohort_name: str,
    inclusion_concept_ids: list[int],
    use_ancestor_closure: bool = True,
) -> QueryBuilder:
    """Earliest condition occurrence among the seed concepts (or their
    descendants) per person — the common shape of the diagnosis-based cohort
    definitions (e.g. cohorts/type_two_diabietes.py's r_number = 1 core)."""
    concepts_table = f"{cohort_name}_concepts"
    query = QuerySpec(
        table_name=cohort_name,
        query_template="""
            SELECT person_id, index_date, visit_occurrence_id
            FROM (
                SELECT co.person_id,
                       co.condition_start_datetime AS index_date,
                       co.visit_occurrence_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY co.person_id
                           ORDER BY co.condition_start_datetime,
                                    co.condition_start_date,
                                    co.visit_occurrence_id
                       ) AS rn
                FROM condition_occurrence co
                JOIN {concepts_table} ic
                  ON co.condition_concept_id = ic.concept_id
            )
            WHERE rn = 1
        """,
        parameters={"concepts_table": concepts_table},
    )
    specs = [
        AncestorTableSpec(
            table_name=concepts_table,
            ancestor_concept_ids=inclusion_concept_ids,
            is_standard=use_ancestor_closure,
        )
    ]
    return QueryBuilder(
        cohort_name=cohort_name,
        dependency_list=["person", "visit_occurrence", "condition_occurrence"],
        query=query,
        ancestor_table_specs=specs,
    )


def hospitalization_outcome() -> QueryBuilder:
    """Any inpatient admission (prediction_cohorts/hospitalization.py)."""
    query = QuerySpec(
        table_name="hospitalization_outcome",
        query_template="""
            SELECT DISTINCT person_id,
                   visit_start_date AS index_date,
                   visit_occurrence_id
            FROM visit_occurrence
            WHERE visit_concept_id IN ({inpatient_concepts})
        """,
        parameters={"inpatient_concepts": ",".join(map(str, INPATIENT_CONCEPT_IDS))},
    )
    return QueryBuilder(
        cohort_name="hospitalization_outcome",
        dependency_list=["person", "visit_occurrence"],
        query=query,
    )


def hospitalization_target(total_window: int = 540, date_lower_bound: str = "1985-01-01") -> QueryBuilder:
    """Patients with 2-30 visits in the ``total_window`` days after their
    first visit, indexed at window end (prediction_cohorts/hospitalization.py)."""
    query = QuerySpec(
        table_name="hospitalization_target",
        query_template="""
            WITH index_visit AS (
                SELECT person_id, index_date, visit_occurrence_id
                FROM (
                    SELECT person_id,
                           visit_start_datetime AS index_date,
                           visit_occurrence_id,
                           ROW_NUMBER() OVER (
                               PARTITION BY person_id
                               ORDER BY visit_start_datetime, visit_occurrence_id
                           ) AS rn
                    FROM visit_occurrence
                    WHERE visit_end_date >= visit_start_date
                )
                WHERE rn = 1
            ),
            windowed AS (
                SELECT iv.person_id,
                       iv.index_date + INTERVAL {total_window} DAYS AS index_date,
                       COUNT(DISTINCT v.visit_occurrence_id) AS num_of_visits
                FROM index_visit iv
                JOIN visit_occurrence v
                  ON v.person_id = iv.person_id
                 AND DATEDIFF(v.visit_start_date, iv.index_date) <= {total_window}
                JOIN observation_period op
                  ON iv.person_id = op.person_id
                 AND DATEDIFF(op.observation_period_end_date,
                              op.observation_period_start_date) >= {total_window}
                GROUP BY iv.person_id, iv.index_date
            )
            SELECT person_id, index_date, CAST(NULL AS INT) AS visit_occurrence_id
            FROM windowed
            WHERE num_of_visits BETWEEN 2 AND 30
              AND index_date >= '{date_lower_bound}'
        """,
        parameters={"total_window": total_window, "date_lower_bound": date_lower_bound},
    )
    return QueryBuilder(
        cohort_name="hospitalization_target",
        dependency_list=["person", "visit_occurrence", "observation_period"],
        query=query,
    )


def last_visit_discharged_home() -> QueryBuilder:
    """Most recent inpatient stay discharged to home, not outlived by the
    person's death record (cohorts/last_visit_discharged_home.py:4-33):
    inpatient/ER-inpatient visits only, completed (visit_end_date present),
    discharged to 8536, ending on or before the earliest recorded death;
    ranked per person by visit END date descending, indexed at the discharge
    timestamp. Golden-pinned against the reference's own output in
    tests/test_golden_cohort.py (home_death_aug_pw360)."""
    query = QuerySpec(
        table_name="last_visit_discharged_home",
        query_template="""
            WITH first_death AS (
                SELECT person_id, MIN(death_date) AS death_date
                FROM death GROUP BY person_id
            )
            SELECT DISTINCT person_id, visit_occurrence_id, index_date
            FROM (
                SELECT v.person_id, v.visit_occurrence_id,
                       COALESCE(v.visit_end_datetime,
                                CAST(v.visit_end_date AS TIMESTAMP)) AS index_date,
                       ROW_NUMBER() OVER (
                           PARTITION BY v.person_id
                           ORDER BY DATE(v.visit_end_date) DESC,
                                    v.visit_occurrence_id DESC
                       ) AS rn
                FROM visit_occurrence v
                LEFT JOIN first_death d ON v.person_id = d.person_id
                WHERE v.visit_concept_id IN ({inpatient_concepts})
                  AND v.visit_end_date IS NOT NULL
                  AND v.discharged_to_concept_id = {home_concept}
                  AND (d.death_date IS NULL OR v.visit_end_date <= d.death_date)
            )
            WHERE rn = 1
        """,
        parameters={
            "home_concept": HOME_DISCHARGE_CONCEPT_ID,
            "inpatient_concepts": ",".join(map(str, INPATIENT_CONCEPT_IDS)),
        },
    )
    return QueryBuilder(
        cohort_name="last_visit_discharged_home",
        dependency_list=["person", "visit_occurrence", "death"],
        query=query,
    )
