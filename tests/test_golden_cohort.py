"""Golden-label parity for the PREDICTION-COHORT engine vs the reference.

The committed fixture is the reference's own `prediction_cohorts/readmission`
output (cohorts/spark_app_base.py `create_prediction_cohort`) on its
22-person sample, run under this env's Spark with ansi=false /
failAmbiguousSelfJoin=false, with prediction_window=1000 so the labels are
MIXED (6×0, 1×1 — the sample's shortest inpatient re-admission gap is 777
days, so the integration-test default of 30 days yields all-zero labels and
a vacuous golden).

Only the COHORT/LABEL columns are compared — target selection, outcome
attribution, prediction windows, observation filtering, demographics:
(person_id, cohort_member_id, index_date, label, outcome_date,
time_to_event, study_end_date, age, gender/race). The reference's
ATT-feature path for cohorts cannot execute under Spark 4 (it trips a
MISSING_ATTRIBUTES resolution error in its own dataframe surgery), so
feature-token parity is pinned by the training-pipeline goldens
(test_golden_parity.py) instead; the label engine is the part only this
fixture covers.
"""

from __future__ import annotations

import glob
import math
import os

import pytest

SAMPLE = "/root/reference/sample_data/omop_sample"
FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden", "readmission_pw1000"
)

LABEL_COLUMNS = [
    "cohort_member_id", "index_date", "label", "outcome_date",
    "time_to_event", "study_end_date", "age", "gender_concept_id",
    "race_concept_id",
]


def _norm(v):
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # integral floats (pandas nullable-int promotion) compare as ints
        return str(int(v)) if v.is_integer() else f"{v:.6f}"
    return str(v) if v is not None else None


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="reference sample data not present")
def test_golden_readmission_labels(spark, tmp_path):
    from cehrbert_data_spark.apps.generate_prediction_cohort import main

    out = main(
        input_folder=SAMPLE,
        output_folder=str(tmp_path),
        cohort_name="readmission",
        date_lower_bound="1985-01-01",
        date_upper_bound="2023-12-31",
        age_lower_bound=0,
        age_upper_bound=100,
        observation_window=360,
        prediction_start_days=0,
        prediction_window=1000,
        spark=spark,
    )

    golden_path = glob.glob(os.path.join(FIXTURE, "*.parquet"))
    assert golden_path, "missing committed readmission cohort fixture"
    golden = spark.read.parquet(*golden_path).toPandas()
    mine = spark.read.parquet(out).toPandas()

    def by_person(df):
        return {
            str(r["person_id"]): {c: _norm(r[c]) for c in LABEL_COLUMNS}
            for _, r in df.iterrows()
        }

    g, m = by_person(golden), by_person(mine)
    assert sorted(m) == sorted(g), (
        f"cohort membership drifted: only-golden={sorted(set(g) - set(m))} "
        f"only-ours={sorted(set(m) - set(g))}"
    )
    # mixed labels or the fixture is vacuous
    assert {v["label"] for v in g.values()} == {"0", "1"}
    for pid in sorted(g):
        for col in LABEL_COLUMNS:
            assert m[pid][col] == g[pid][col], (
                f"pid={pid} col={col}: {m[pid][col]!r} != golden {g[pid][col]!r}"
            )
