"""Golden parity for the visit-consolidation tool (D6).

``tests/fixtures/golden/connect_visit_default/`` is the reference's own
``tools/connect_omop_visit.py`` output on the 22-person sample at default
thresholds (inpatient 24 h, outpatient 1 h): the consolidated
``visit_occurrence`` (1890 of 1909 visits survive) and the 19-row
``visit_mapping`` of absorbed -> master visit ids. Pins all three
consolidation steps — inpatient session merge, outpatient-inside-inpatient
absorption, and same-day outpatient merge — including which visit becomes
the master and the min/max span arithmetic.
"""

from __future__ import annotations

import glob
import os

import pandas as pd
import pytest

SAMPLE = "/root/reference/sample_data/omop_sample"
GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
FIXTURE = os.path.join(GOLDEN_DIR, "connect_visit_default")

SPAN_COLUMNS = [
    "person_id", "visit_concept_id", "visit_start_date", "visit_end_date",
    "visit_start_datetime", "visit_end_datetime",
]


def _norm(v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return None
    ts = pd.to_datetime(str(v), errors="coerce")
    if ts is not pd.NaT and not isinstance(v, (int,)):
        return str(ts)
    return str(v)


@pytest.mark.skipif(not os.path.isdir(SAMPLE), reason="reference sample data not present")
def test_golden_visit_consolidation(spark, tmp_path):
    from cehrbert_data_spark.apps.connect_omop_visit import main

    visit_out, mapping_out = main(
        input_folder=SAMPLE, output_folder=str(tmp_path), spark=spark
    )

    g_map = {
        str(r["visit_occurrence_id"]): str(r["master_visit_occurrence_id"])
        for r in spark.read.parquet(
            *glob.glob(os.path.join(FIXTURE, "visit_mapping.parquet"))
        ).collect()
    }
    m_map = {
        str(r["visit_occurrence_id"]): str(r["master_visit_occurrence_id"])
        for r in spark.read.parquet(mapping_out).collect()
    }
    assert m_map == g_map, (
        f"mapping drift: only-golden={sorted(set(g_map.items()) - set(m_map.items()))} "
        f"only-ours={sorted(set(m_map.items()) - set(g_map.items()))}"
    )

    def spans(df):
        return {
            str(r["visit_occurrence_id"]): {c: _norm(r[c]) for c in SPAN_COLUMNS}
            for r in df.select("visit_occurrence_id", *SPAN_COLUMNS).collect()
        }

    golden = spans(
        spark.read.parquet(
            *glob.glob(os.path.join(FIXTURE, "visit_occurrence.parquet"))
        )
    )
    mine = spans(spark.read.parquet(visit_out))
    assert sorted(mine) == sorted(golden), (
        f"surviving-visit drift: only-golden={sorted(set(golden) - set(mine))} "
        f"only-ours={sorted(set(mine) - set(golden))}"
    )
    for vid in golden:
        assert mine[vid] == golden[vid], (
            f"visit {vid}: {mine[vid]!r} != golden {golden[vid]!r}"
        )
