"""Golden parity for the EHRSHOT->OMOP converter (D10).

``tests/fixtures/golden/ehrshot_small/`` is the reference's own
``tools/ehrshot_to_omop.py`` output on the synthetic 4-patient export
built by ``tests/ehrshot_sample.py`` (regenerable via
``tools/make_golden.py ehrshot``). Pins the whole visit-reconstruction
chain — re-segmentation of outpatient visits around their events, orphan
visit minting (ids above the real max, code '0', span = event starts),
past-cutoff event disconnection, duplicate-visit priority dedup — plus the
person pivot and code->concept mapping. The reference's measurement branch
dies on Spark 4's MISSING_ATTRIBUTES resolution bug before writing, so
measurement/extract_value parity stays unit-pinned
(tests/test_ehrshot.py); the four tables here are written before that
point and are compared value-for-value.

Minted domain _id columns (condition_occurrence_id, drug_exposure_id) are
row_number over monotonically_increasing_id in the reference —
layout-dependent — and are excluded from comparison.
"""

from __future__ import annotations

import glob
import os

import pytest

GOLDEN_ROOT = os.path.join(os.path.dirname(__file__), "fixtures", "golden")

#: ehrshot_small = the 4-patient branch-coverage export;
#: ehrshot_volume = the 120-patient export stressing minted-id assignment
#: at volume (string-vs-int patient ordering, interleaved minting across
#: patients, duplicate-dedup and disconnect paths at scale) — the
#: reference behavior most sensitive to data size.
FIXTURES = ("ehrshot_small", "ehrshot_volume")

#: table -> (row key columns, compared columns)
CONTRACTS = {
    "person": (
        ["person_id"],
        ["birth_datetime", "year_of_birth", "month_of_birth", "day_of_birth",
         "gender_concept_id", "gender_source_value", "race_concept_id",
         "race_source_value", "ethnicity_concept_id", "ethnicity_source_value"],
    ),
    "visit_occurrence": (
        ["visit_occurrence_id"],
        ["person_id", "visit_concept_id", "visit_source_value",
         "visit_start_date", "visit_start_datetime", "visit_end_date",
         "visit_end_datetime", "discharged_to_concept_id"],
    ),
    "condition_occurrence": (
        ["person_id", "condition_source_value", "condition_start_datetime"],
        ["visit_occurrence_id", "condition_concept_id", "condition_start_date"],
    ),
    "drug_exposure": (
        ["person_id", "drug_source_value", "drug_exposure_start_datetime"],
        ["visit_occurrence_id", "drug_concept_id", "drug_exposure_end_datetime"],
    ),
}



pytestmark = pytest.mark.slow  # golden pipelines: full-suite lane only (r12 driver-budget split)

def _norm(v):
    return None if v is None else str(v)


@pytest.fixture(scope="module", params=FIXTURES)
def converted(spark, tmp_path_factory, request):
    from ehrshot_sample import EVENTS, build_ehrshot_input, volume_events
    from cehrbert_data_spark.apps.ehrshot_to_omop import main

    fixture = request.param
    events = volume_events() if fixture == "ehrshot_volume" else EVENTS
    base = tmp_path_factory.mktemp(fixture)
    csv_path, vocab_dir = build_ehrshot_input(str(base / "input"), events=events)
    out = str(base / "out")
    main(
        ehr_shot_file=csv_path,
        vocabulary_folder=vocab_dir,
        output_folder=out,
        spark=spark,
    )
    return fixture, out


@pytest.mark.parametrize("table", sorted(CONTRACTS))
def test_golden_ehrshot_table(spark, converted, table):
    fixture, out_dir = converted
    key_cols, value_cols = CONTRACTS[table]
    golden_path = glob.glob(os.path.join(GOLDEN_ROOT, fixture, f"{table}.parquet"))
    assert golden_path, f"missing committed ehrshot fixture {fixture}/{table}"

    def rows(df):
        cols = key_cols + value_cols
        return {
            tuple(_norm(r[c]) for c in key_cols): {c: _norm(r[c]) for c in value_cols}
            for r in df.select(cols).collect()
        }

    golden = rows(spark.read.parquet(*golden_path))
    mine = rows(spark.read.parquet(os.path.join(out_dir, table)))
    assert sorted(mine) == sorted(golden), (
        f"{table} row-set drift: only-golden={sorted(set(golden) - set(mine))} "
        f"only-ours={sorted(set(mine) - set(golden))}"
    )
    for key in sorted(golden):
        assert mine[key] == golden[key], (
            f"{table} {key}: {mine[key]!r} != golden {golden[key]!r}"
        )
