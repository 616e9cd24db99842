"""Golden parity for the qualified-concept-list app.

``tests/fixtures/golden/concept_list_min2/`` is the reference's own
``generate_included_concept_list`` output on the 22-person sample with
``min_num_of_patients=2`` (tools/make_golden.py) — 119 concepts with their
distinct-patient frequencies. Pins event extraction across the three event
domains, the NULL-visit exclusion, and the distinct-patient frequency
filter end-to-end.
"""

from __future__ import annotations

import glob
import os

import pytest

SAMPLE = "/root/reference/sample_data/omop_sample"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="reference sample data not present")
def test_golden_concept_list(spark, tmp_path):
    from cehrbert_data_spark.apps.generate_included_concept_list import main

    out = main(
        input_folder=SAMPLE,
        output_folder=str(tmp_path),
        min_num_of_patients=2,
        spark=spark,
    )
    golden_path = glob.glob(os.path.join(GOLDEN_DIR, "concept_list_min2", "*.parquet"))
    assert golden_path, "missing committed concept-list fixture"

    def freqs(df):
        return {
            str(r["standard_concept_id"]): int(r["freq"]) for r in df.collect()
        }

    golden = freqs(spark.read.parquet(*golden_path))
    mine = freqs(spark.read.parquet(out))
    assert mine == golden, (
        f"only-golden={sorted(set(golden) - set(mine))} "
        f"only-ours={sorted(set(mine) - set(golden))} "
        f"freq-diff={[k for k in set(mine) & set(golden) if mine[k] != golden[k]][:10]}"
    )
