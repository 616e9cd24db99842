"""Golden parity for external-cohort ATT feature extraction.

``tests/fixtures/golden/extract_features_ext/task_labels.parquet`` is the
reference's own ``tools/extract_features.py -ip`` output for the 5-member
external cohort of ``tests/feature_cohort.py`` over the 22-person sample
(day/day ATT, 730-day observation window, visit types + inpatient hour
tokens on). This is the one reference path that drives
create_sequence_data_with_att against a USER-SUPPLIED cohort — so it pins
the cohort-index clamp (sequences truncate at each member's index date),
member-id assignment over renamed columns, and the demographics/label
re-attachment, token by token.
"""

from __future__ import annotations

import glob
import math
import os

import pytest

GOLDEN = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden", "extract_features_ext"
)

SEQUENCE_COLUMNS = [
    "concept_ids", "visit_segments", "orders", "dates", "ages",
    "visit_concept_orders", "num_of_visits", "num_of_concepts",
    "concept_value_masks", "number_as_values", "concept_as_values",
    "is_numeric_types", "mlm_skip_values", "priorities", "visit_concept_ids",
    "visit_rank_orders", "concept_orders", "record_ranks", "units",
    "epoch_times", "age", "race_concept_id", "gender_concept_id",
    "index_date", "label",
]


def _cell(v):
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return [_cell(x) for x in v]
    if hasattr(v, "item"):
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return None
        v = int(v) if v.is_integer() else round(v, 6)
    return str(v) if v is not None else None


def _by_member(df):
    pdf = df.toPandas()
    return {
        (int(r["person_id"]), int(r["cohort_member_id"])): {
            c: _cell(r[c]) for c in SEQUENCE_COLUMNS if c in pdf.columns
        }
        for _, r in pdf.iterrows()
    }


@pytest.mark.slow
def test_golden_external_cohort_features(spark, tmp_path):
    from feature_cohort import write_cohort_csv
    from cehrbert_data_spark.apps.extract_features import main

    csv_path = write_cohort_csv(str(tmp_path))
    out = main(
        cohort_path=csv_path,
        input_folder="/root/reference/sample_data/omop_sample",
        output_folder=str(tmp_path / "out"),
        person_id_column="subject_id",
        index_date_column="prediction_time",
        label_column="outcome",
        observation_window=730,
        att_type="day",
        inpatient_att_type="day",
        include_visit_type=True,
        include_inpatient_hour_token=True,
        spark=spark,
    )

    golden_path = glob.glob(os.path.join(GOLDEN, "*.parquet"))
    assert golden_path, "missing committed extract_features fixture"
    golden = _by_member(spark.read.parquet(*golden_path))
    mine = _by_member(spark.read.parquet(out))

    assert sorted(mine) == sorted(golden), (
        f"member drift: only-golden={sorted(set(golden) - set(mine))} "
        f"only-ours={sorted(set(mine) - set(golden))}"
    )
    for key in sorted(golden):
        for col in golden[key]:
            g, o = golden[key][col], mine[key][col]
            if isinstance(g, list):
                assert len(o) == len(g), (
                    f"member={key} col={col}: length {len(o)} != golden {len(g)}"
                )
                for i, (gv, ov) in enumerate(zip(g, o)):
                    assert ov == gv, (
                        f"member={key} col={col} token[{i}]: {ov!r} != golden {gv!r}"
                    )
            else:
                assert o == g, f"member={key} col={col}: {o!r} != golden {g!r}"
