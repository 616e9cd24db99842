"""JDBC OMOP download app: database → per-table parquet + patient splits.

Keyed OMOP tables download with 16 range partitions on the PK bounded by a
pushed-down ``MAX(pk)`` scalar subquery (S3/S4 — reference:
tools/download_omop_tables.py:29-66); unkeyed tables stream through a single
JDBC scan. After download, an 80/20 person split (seed 42) is written to
``patient_splits/`` unless one exists (S11, reference :134-141).

Credentials come from an ini file with DEFAULT keys
``base_url``/``driver``/``user``/``password`` (same shape the reference
reads with configparser).

Run: ``python -m cehrbert_data_spark.apps.download_omop_tables
-c creds.ini -tc person visit_occurrence -o <out_dir>``
"""

from __future__ import annotations

import argparse
import configparser
import os

from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import read_jdbc_partitioned, read_parquet
from cehrbert_data_spark.sources.writers import random_person_split, write_parquet

#: OMOP table → primary key used as the JDBC range-partition column
#: (reference: tools/download_omop_tables.py:18-26).
TABLE_PARTITION_KEYS = {
    "person": "person_id",
    "condition_occurrence": "condition_occurrence_id",
    "measurement": "measurement_id",
    "drug_exposure": "drug_exposure_id",
    "procedure_occurrence": "procedure_occurrence_id",
    "observation": "observation_id",
    "visit_occurrence": "visit_occurrence_id",
}


def download_table(spark, url: str, table: str, properties: dict, output_folder: str) -> None:
    pk = TABLE_PARTITION_KEYS.get(table)
    if pk is not None:
        df = read_jdbc_partitioned(spark, url, table, pk, properties=properties)
    else:
        reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
        for k, v in properties.items():
            reader = reader.option(k, v)
        df = reader.load()
    write_parquet(df, os.path.join(output_folder, table))


def main(
    credential_path: str,
    domain_table_list: list[str],
    output_folder: str,
    spark=None,
) -> list[str]:
    spark = spark or build_session("download_omop_tables")
    config = configparser.ConfigParser()
    config.read(credential_path)
    creds = dict(config.defaults())
    url = creds.pop("base_url")
    downloaded = []
    for table in domain_table_list:
        try:
            download_table(spark, url, table, creds, output_folder)
            downloaded.append(table)
        except Exception as e:  # per-table isolation, matching the reference CLI
            print(f"failed to download {table}: {e}")

    splits_folder = os.path.join(output_folder, "patient_splits")
    person_folder = os.path.join(output_folder, "person")
    if not os.path.exists(splits_folder) and os.path.exists(person_folder):
        person = read_parquet(spark, person_folder)
        write_parquet(random_person_split(person), splits_folder)
    return downloaded


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Download OMOP tables over JDBC")
    parser.add_argument("-c", "--credential_path", required=True)
    parser.add_argument("-tc", "--domain_table_list", nargs="+", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        credential_path=args.credential_path,
        domain_table_list=args.domain_table_list,
        output_folder=args.output_folder,
    )
