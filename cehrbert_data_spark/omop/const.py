"""Constants: artificial tokens, token priorities, domain registries.

Token values and priority ordering reproduce the reference exactly
(reference: const/common.py, const/artificial_tokens.py,
decorators/token_priority.py:4-32) — sequence order is semantics, so these
numbers ARE the contract.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- artificial tokens (reference: const/artificial_tokens.py) ---------------
VS_TOKEN = "[VS]"
VE_TOKEN = "[VE]"
DEATH_TOKEN = "[DEATH]"
END_TOKEN = "[END]"
UNKNOWN_CONCEPT = "[UNKNOWN]"
VISIT_UNKNOWN_TOKEN = "Visit/0"
DISCHARGE_UNKNOWN_TOKEN = "Discharge/0"
GENDER_UNKNOWN_TOKEN = "Gender/0"
RACE_UNKNOWN_TOKEN = "Race/0"
NA = "N/A"

# --- token priorities (reference: decorators/token_priority.py:4-32) ---------
YEAR_TOKEN_PRIORITY = -10
AGE_TOKEN_PRIORITY = -9
GENDER_TOKEN_PRIORITY = -8
RACE_TOKEN_PRIORITY = -7
ATT_TOKEN_PRIORITY = -3
VS_TOKEN_PRIORITY = -2
VISIT_TYPE_TOKEN_PRIORITY = -1
FIRST_VISIT_HOUR_TOKEN_PRIORITY = -0.5
DEFAULT_PRIORITY = 0
DISCHARGE_TOKEN_PRIORITY = 100
DEATH_TOKEN_PRIORITY = 199
VE_TOKEN_PRIORITY = 200
PREDICTION_TOKEN_PRIORITY = 1000


def inpatient_token_priority() -> Column:
    """priority + concept_order * 0.1 (token_priority.py:19-20)."""
    return F.col("priority") + F.col("concept_order") * 0.1


def inpatient_att_token_priority() -> Column:
    """priority - 0.01 (token_priority.py:23-24)."""
    return F.col("priority") - 0.01


def inpatient_hour_token_priority() -> Column:
    """Just below (larger than) the inpatient ATT token (token_priority.py:27-32)."""
    return inpatient_att_token_priority() + 0.001


# --- OMOP domain registry ----------------------------------------------------
#: Inpatient visit concept ids (reference: decorators/clinical_event_decorator.py:66).
INPATIENT_VISIT_CONCEPT_IDS = [9201, 262, 8971, 8920]
#: Discharged-to "patient died" concept (clinical_event_decorator.py:67).
DISCHARGE_EXPIRED_CONCEPT_ID = 4216643

#: Identifying column → (concept_id, date, datetime, domain_table) tuples
#: (reference: utils/spark_utils.py:41-95). A table is recognized by which of
#: these key columns it has; visit_occurrence contributes two event families.
DOMAIN_KEY_FIELDS: dict[str, list[tuple[str, str, str, str]]] = {
    "condition_occurrence_id": [
        ("condition_concept_id", "condition_start_date", "condition_start_datetime",
         "condition_occurrence")
    ],
    "procedure_occurrence_id": [
        ("procedure_concept_id", "procedure_date", "procedure_datetime",
         "procedure_occurrence")
    ],
    "drug_exposure_id": [
        ("drug_concept_id", "drug_exposure_start_date", "drug_exposure_start_datetime",
         "drug_exposure")
    ],
    "measurement_id": [
        ("measurement_concept_id", "measurement_date", "measurement_datetime", "measurement")
    ],
    "observation_id": [
        ("observation_concept_id", "observation_date", "observation_datetime", "observation")
    ],
    "device_exposure_id": [
        ("device_concept_id", "device_exposure_start_date", "device_exposure_start_datetime",
         "device_exposure")
    ],
    "death_date": [("cause_concept_id", "death_date", "death_datetime", "death")],
}

MEASUREMENT = "measurement"
OBSERVATION = "observation"
DEVICE_EXPOSURE = "device_exposure"
CATEGORICAL_MEASUREMENT = "categorical_measurement"
NUMERIC_DOMAIN_TABLES = [MEASUREMENT, OBSERVATION, DEVICE_EXPOSURE]

#: The decorated-event column contract every decorator must preserve
#: (reference: decorators/patient_event_decorator_base.py:52-78).
DECORATED_EVENT_COLUMNS = {
    "cohort_member_id",
    "person_id",
    "standard_concept_id",
    "unit",
    "date",
    "datetime",
    "visit_occurrence_id",
    "domain",
    "concept_as_value",
    "is_numeric_type",
    "number_as_value",
    "visit_rank_order",
    "visit_segment",
    "priority",
    "date_in_week",
    "concept_value_mask",
    "mlm_skip_value",
    "age",
    "visit_concept_id",
    "visit_start_date",
    "visit_start_datetime",
    "visit_concept_order",
    "concept_order",
    "event_group_id",
}
