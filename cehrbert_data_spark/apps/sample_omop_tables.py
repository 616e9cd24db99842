"""Patient-level OMOP subsetting (D12): keep every table's rows for a person
sample.

Semi-join each domain table against the sample's person_ids
(reference: tools/sample_omop_tables.py:19-34 — which uses an inner join on
the id column; a left-semi join has identical semantics without duplicating
rows if the sample has repeats, and never widens the schema).

Run: ``python -m cehrbert_data_spark.apps.sample_omop_tables
--person_sample <parquet> --omop_folder <omop_dir> --output_folder <out_dir>``
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import read_parquet
from cehrbert_data_spark.sources.writers import write_parquet

OMOP_TABLES = [
    "person",
    "visit_occurrence",
    "condition_occurrence",
    "procedure_occurrence",
    "drug_exposure",
    "measurement",
    "observation",
    "observation_period",
]


def main(
    person_sample: str,
    omop_folder: str,
    output_folder: str,
    omop_tables: list[str] | None = None,
    spark=None,
) -> list[str]:
    spark = spark or build_session("sample_omop_tables")
    sample_ids = F.broadcast(
        read_parquet(spark, person_sample).select("person_id").distinct()
    )
    written = []
    for name in omop_tables or OMOP_TABLES:
        path = os.path.join(omop_folder, name)
        if not os.path.exists(path):
            continue
        table = read_parquet(spark, path)
        subset = table.join(sample_ids, "person_id", "left_semi")
        write_parquet(subset, os.path.join(output_folder, name))
        written.append(name)
    return written


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Subset OMOP tables by a person sample")
    parser.add_argument("--person_sample", required=True)
    parser.add_argument("--omop_folder", required=True)
    parser.add_argument("--output_folder", required=True)
    parser.add_argument("--omop_tables", nargs="+", default=None)
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        person_sample=args.person_sample,
        omop_folder=args.omop_folder,
        output_folder=args.output_folder,
        omop_tables=args.omop_tables,
    )
