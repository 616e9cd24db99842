"""Golden-output parity with the REFERENCE pipeline's own output.

The committed fixtures under ``tests/fixtures/golden/`` are the
``patient_sequence`` tables produced by RUNNING the reference's
``apps/generate_training_data.main`` (reference:
apps/generate_training_data.py, tests/integration_tests/
test_generate_training_data.py:12-31) on its 22-person
``sample_data/omop_sample`` under this environment's Spark (ANSI off to
match Spark 3.1 cast semantics). Two decorator configurations are pinned:

- ``day_day``:       att_type=day,       inpatient_att_type=day
- ``cehrbert_mix``:  att_type=cehr_bert, inpatient_att_type=mix
- ``cehrbert_mix_artificial``: cehr_bert/mix + construct_artificial_visits
  (the orphan-relink + artificial-visit minting path; this config's first
  diff caught a real type-coercion bug and a nondeterministic id-minting
  order in construct_artificial_visits)

Round 9 adds VOLUME parity: the day_day / cehrbert_mix /
cehrbert_mix_artificial configs replayed on the 110-person volume sample
(tests/volume_sample.py), pinning member ordering and ATT insertion at a
scale where string-vs-numeric person ordering and cross-person leakage
actually bite.

All verified cell-identical (22 persons x 21 columns, token-by-token;
volume configs 110 persons) against this repo's output when the fixtures
were generated — see ROUND_NOTES.md rounds 5 and 9. This test re-runs OUR pipeline on the same input
and asserts every column of every person still matches, so ANY drift in
the decorator chain (visit_end minus-1-minute, inpatient date clamp,
span/hour ATT tokens, demographic prompt, ordering, segments, ages...)
fails loudly with the first differing token.
"""

from __future__ import annotations

import glob
import math
import os

import pytest

SAMPLE = "/root/reference/sample_data/omop_sample"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")

#: config name -> (fixture dir, main() overrides). day_day_rollup replays
#: the day/day config with the drug-ingredient rollup ON: the reference ran
#: with rollup on by default (its main defaults with_drug_rollup=True), so
#: the SAME fixture is the correct target — the sample's drug concepts are
#: already ingredient-level, and any rollup bug that maps them elsewhere
#: diverges from it.
CONFIGS = {
    "day_day": ("day_day", dict(att_type="day", inpatient_att_type="day")),
    "day_day_rollup": (
        "day_day",
        dict(att_type="day", inpatient_att_type="day", with_drug_rollup=True),
    ),
    "cehrbert_mix": (
        "cehrbert_mix",
        dict(att_type="cehr_bert", inpatient_att_type="mix"),
    ),
    "cehrbert_mix_artificial": (
        "cehrbert_mix_artificial",
        dict(
            att_type="cehr_bert",
            inpatient_att_type="mix",
            should_construct_artificial_visits=True,
        ),
    ),
    # week/month bucket tokens (W1/W4/M3/LT edges) — the two ATT vocabularies
    # not exercised by the day/cehr_bert configs above
    "week_month": (
        "week_month",
        dict(att_type="week", inpatient_att_type="month"),
    ),
    # age-group buckets instead of exact ages + VS/VE tokens dropped
    "cehrbert_mix_agegroup_novs": (
        "cehrbert_mix_agegroup_novs",
        dict(
            att_type="cehr_bert", inpatient_att_type="mix",
            use_age_group=True, exclude_visit_tokens=True,
        ),
    ),
    # measurement domain on the augmented sample (which has a measurement
    # table): numeric lab values -> concept_value_masks/number_as_values,
    # 'Detected' -> concept_as_values; visitless labs dropped
    "day_day_measurement": (
        "day_day_measurement",
        dict(
            att_type="day", inpatient_att_type="day",
            domain_table_list=[
                "condition_occurrence", "drug_exposure",
                "procedure_occurrence", "measurement",
            ],
            input_kind="augmented",
        ),
    ),
    # VOLUME parity (round-9, VERDICT r8 ask 4): the same decorator configs
    # on the 110-person volume sample (tests/volume_sample.py) — pins
    # token-by-token sequence assembly where only volume breaks it:
    # member-id assignment order over many string-sorted persons, ATT
    # insertion across replicas, artificial-visit id minting at volume
    "day_day_volume": (
        "day_day_volume",
        dict(att_type="day", inpatient_att_type="day", input_kind="volume"),
    ),
    "cehrbert_mix_volume": (
        "cehrbert_mix_volume",
        dict(att_type="cehr_bert", inpatient_att_type="mix", input_kind="volume"),
    ),
    "cehrbert_mix_artificial_volume": (
        "cehrbert_mix_artificial_volume",
        dict(
            att_type="cehr_bert", inpatient_att_type="mix",
            should_construct_artificial_visits=True, input_kind="volume",
        ),
    ),
}

# Every column of the reference's new-patient-representation output.
ALL_COLUMNS = [
    "cohort_member_id", "concept_ids", "visit_segments", "orders", "dates",
    "ages", "visit_concept_orders", "num_of_visits", "num_of_concepts",
    "concept_value_masks", "number_as_values", "concept_as_values",
    "is_numeric_types", "mlm_skip_values", "priorities", "visit_concept_ids",
    "visit_rank_orders", "concept_orders", "record_ranks", "units",
    "epoch_times",
]



pytestmark = pytest.mark.slow  # golden pipelines: full-suite lane only (r12 driver-budget split)

def _cell(v):
    if hasattr(v, "__len__") and not isinstance(v, (str, bytes)):
        return [_cell(x) for x in v]
    if hasattr(v, "item"):  # numpy scalar -> python scalar
        v = v.item()
    if isinstance(v, float):
        return None if math.isnan(v) else round(v, 6)
    if isinstance(v, str):
        # the reference's string-typed source tables leak into its arrays
        # (e.g. number_as_values becomes VARCHAR[] when the measurement
        # domain joins the union); compare numeric strings numerically so
        # properly-typed output matches the same VALUES
        try:
            return round(float(v), 6)
        except ValueError:
            return v
    return v


def _by_person(df):
    rows = df.toPandas() if hasattr(df, "toPandas") else df
    return {
        int(r["person_id"]): {c: _cell(r[c]) for c in ALL_COLUMNS if c in rows.columns}
        for _, r in rows.iterrows()
    }


@pytest.fixture(scope="session")
def augmented_training_dir(tmp_path_factory):
    from augmented_sample import build_augmented_sample

    return build_augmented_sample(
        str(tmp_path_factory.mktemp("augmented_training") / "omop")
    )


@pytest.fixture(scope="session")
def volume_training_dir(tmp_path_factory):
    from volume_sample import build_volume_sample

    return build_volume_sample(
        str(tmp_path_factory.mktemp("volume_training") / "omop")
    )


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="reference sample data not present")
@pytest.mark.parametrize("config_name", sorted(CONFIGS))
def test_golden_parity(spark, tmp_path, config_name, request):
    from cehrbert_data_spark.apps.generate_training_data import main

    fixture_dir, overrides = CONFIGS[config_name]
    overrides = dict(overrides)  # pops below must not mutate the shared config
    input_kind = overrides.pop("input_kind", "sample")
    input_folder = {
        "augmented": lambda: request.getfixturevalue("augmented_training_dir"),
        "volume": lambda: request.getfixturevalue("volume_training_dir"),
        "sample": lambda: SAMPLE,
    }[input_kind]()
    out = main(
        input_folder=input_folder,
        output_folder=str(tmp_path / config_name),
        domain_table_list=overrides.pop(
            "domain_table_list",
            ["condition_occurrence", "drug_exposure", "procedure_occurrence"],
        ),
        date_filter="1985-01-01",
        include_visit_type=True,
        exclude_visit_tokens=overrides.pop("exclude_visit_tokens", False),
        include_inpatient_hour_token=True,
        include_death=False,
        exclude_demographic=False,
        apply_age_filter=True,
        # Budget gate rides along with parity: every golden config's
        # composed plan must stay inside the app's exchange ceiling with no
        # global window / Python row eval (plans.budget; analysis-only).
        plan_check=True,
        spark=spark,
        **overrides,
    )

    golden_path = glob.glob(os.path.join(GOLDEN_DIR, fixture_dir, "*.parquet"))
    assert golden_path, f"missing committed golden fixture {fixture_dir} for {config_name}"
    golden = _by_person(spark.read.parquet(*golden_path).toPandas())
    mine = _by_person(spark.read.parquet(out).toPandas())

    assert sorted(mine) == sorted(golden), (
        f"person set drifted: only-golden={sorted(set(golden) - set(mine))} "
        f"only-ours={sorted(set(mine) - set(golden))}"
    )
    for pid in sorted(golden):
        for col in golden[pid]:
            g, o = golden[pid][col], mine[pid][col]
            if isinstance(g, list):
                assert len(o) == len(g), (
                    f"pid={pid} col={col}: length {len(o)} != golden {len(g)}"
                )
                for i, (gv, ov) in enumerate(zip(g, o)):
                    assert ov == gv, (
                        f"pid={pid} col={col} token[{i}]: {ov!r} != golden {gv!r}"
                    )
            else:
                assert o == g, f"pid={pid} col={col}: {o!r} != golden {g!r}"
