"""Visit-consolidation app: OMOP folder → fixed visit_occurrence + visit_mapping.

Three-step D6 consolidation (reference: tools/connect_omop_visit.py:228-253):
inpatient sessions merge at a 24h gap, outpatient visits that start inside an
inpatient stay are absorbed into it, then outpatient sessions merge at a 1h
gap. Outputs ``visit_occurrence/`` (surviving visits with widened spans) and
``visit_mapping/`` (absorbed visit_occurrence_id → master_visit_occurrence_id),
which update_omop_visit applies to the event tables.

Run: ``python -m cehrbert_data_spark.apps.connect_omop_visit
--input_folder <omop_dir> --output_folder <out_dir>``
"""

from __future__ import annotations

import argparse
import os

from cehrbert_data_spark.omop.visits import consolidate_visits
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import normalize_domain_table, read_parquet
from cehrbert_data_spark.sources.writers import write_parquet


def main(
    input_folder: str,
    output_folder: str,
    inpatient_hour_diff_threshold: int = 24,
    outpatient_hour_diff_threshold: int = 1,
    spark=None,
) -> tuple[str, str]:
    spark = spark or build_session("connect_omop_visit")
    visit_occurrence = normalize_domain_table(
        read_parquet(spark, os.path.join(input_folder, "visit_occurrence"))
    )
    fixed, mapping = consolidate_visits(
        visit_occurrence,
        inpatient_hour_threshold=inpatient_hour_diff_threshold,
        outpatient_hour_threshold=outpatient_hour_diff_threshold,
    )
    visit_out = os.path.join(output_folder, "visit_occurrence")
    mapping_out = os.path.join(output_folder, "visit_mapping")
    write_parquet(fixed, visit_out)
    write_parquet(mapping, mapping_out)
    return visit_out, mapping_out


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Connect OMOP visits in chronological order"
    )
    parser.add_argument("--input_folder", required=True)
    parser.add_argument("--output_folder", required=True)
    parser.add_argument("--inpatient_hour_diff_threshold", type=int, default=24)
    parser.add_argument("--outpatient_hour_diff_threshold", type=int, default=1)
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        input_folder=args.input_folder,
        output_folder=args.output_folder,
        inpatient_hour_diff_threshold=args.inpatient_hour_diff_threshold,
        outpatient_hour_diff_threshold=args.outpatient_hour_diff_threshold,
    )
