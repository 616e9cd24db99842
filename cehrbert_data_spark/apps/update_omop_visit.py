"""Apply a visit_mapping to the OMOP event tables.

After connect_omop_visit produced ``visit_mapping/``, every domain table's
``visit_occurrence_id`` is re-pointed at the master visit
(reference: tools/update_omop_visit.py:9-42). Vocabulary tables and person
are copied through unchanged.

Deliberate divergence: the reference builds the coalesce-remap join but
then writes the ORIGINAL ``omop_table`` (update_omop_visit.py:18-34 never
rebinds the variable), so its output is an identity copy of the input.
This app implements the evident intent — events actually move to their
master visit — which is why this tool is pinned by unit tests
(tests/test_apps_tools.py) rather than a reference-output golden.

Run: ``python -m cehrbert_data_spark.apps.update_omop_visit
--input_folder <omop_dir> --mapping_folder <dir_with_visit_mapping>
--output_folder <out_dir>``
"""

from __future__ import annotations

import argparse
import os
import shutil

from cehrbert_data_spark.omop.visits import remap_visit_ids
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import read_parquet
from cehrbert_data_spark.sources.writers import write_parquet

#: Event tables carrying a visit_occurrence_id FK.
EVENT_TABLES = [
    "condition_occurrence",
    "procedure_occurrence",
    "drug_exposure",
    "measurement",
    "observation",
    "device_exposure",
]

#: Tables copied through unchanged (no visit FK to rewrite).
PASSTHROUGH_TABLES = [
    "person",
    "observation_period",
    "death",
    "concept",
    "concept_ancestor",
    "concept_relationship",
]


def main(
    input_folder: str,
    mapping_folder: str,
    output_folder: str,
    spark=None,
) -> list[str]:
    spark = spark or build_session("update_omop_visit")
    mapping = read_parquet(spark, os.path.join(mapping_folder, "visit_mapping"))
    written = []
    for name in EVENT_TABLES:
        path = os.path.join(input_folder, name)
        if not os.path.exists(path):
            continue
        table = read_parquet(spark, path)
        if "visit_occurrence_id" in table.columns:
            table = remap_visit_ids(table, mapping)
        out = os.path.join(output_folder, name)
        write_parquet(table, out)
        written.append(name)
    for name in PASSTHROUGH_TABLES:
        src = os.path.join(input_folder, name)
        dst = os.path.join(output_folder, name)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copytree(src, dst)
            written.append(name)
    return written


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Re-point events at master visits")
    parser.add_argument("--input_folder", required=True)
    parser.add_argument("--mapping_folder", required=True)
    parser.add_argument("--output_folder", required=True)
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        input_folder=args.input_folder,
        mapping_folder=args.mapping_folder,
        output_folder=args.output_folder,
    )
