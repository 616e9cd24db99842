"""Qualified-concept-list app: OMOP folder → qualified_concept_list parquet.

Concepts observed in ≥ N distinct patients across the event domains
(reference: apps/generate_included_concept_list.py:33-111). The output is
the allow-list that generate_training_data / extract_features semi-join
against.

Run: ``python -m cehrbert_data_spark.apps.generate_included_concept_list
-i <omop_dir> -o <out_dir> [--min_num_of_patients N]``
"""

from __future__ import annotations

import argparse
import os

from cehrbert_data_spark.omop.events import extract_events_by_domain
from cehrbert_data_spark.omop.stats import qualified_concept_list
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import normalize_domain_table, read_parquet
from cehrbert_data_spark.sources.writers import write_parquet

DEFAULT_DOMAINS = ["condition_occurrence", "procedure_occurrence", "drug_exposure"]


def main(
    input_folder: str,
    output_folder: str,
    domain_table_list: list[str] | None = None,
    min_num_of_patients: int = 0,
    spark=None,
) -> str:
    spark = spark or build_session("generate_included_concept_list")
    domains = domain_table_list or DEFAULT_DOMAINS

    events = None
    for name in domains:
        path = os.path.join(input_folder, name)
        if not os.path.exists(path):
            continue
        table = normalize_domain_table(read_parquet(spark, path))
        extracted = extract_events_by_domain(table)
        events = extracted if events is None else events.unionByName(extracted)
    if events is None:
        raise FileNotFoundError(f"no domain tables found under {input_folder}")

    qualified = qualified_concept_list(events, min_num_of_patients)
    out = os.path.join(output_folder, "qualified_concept_list")
    write_parquet(qualified, out)
    return out


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Generate the qualified concept list")
    parser.add_argument("-i", "--input_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("-tc", "--domain_table_list", nargs="+", default=None)
    parser.add_argument("--min_num_of_patients", type=int, default=0)
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        input_folder=args.input_folder,
        output_folder=args.output_folder,
        domain_table_list=args.domain_table_list,
        min_num_of_patients=args.min_num_of_patients,
    )
