"""Batch feature extraction for EHRSHOT benchmark cohorts.

Walks a directory of per-task cohort folders, each holding
``labeled_patients.csv``, and runs the feature-extraction app per task
(reference: tools/prepare_ehrshot_cohorts.py:5-22). Tasks whose output
already exists are skipped so the loop is resumable.

Run: ``python -m cehrbert_data_spark.apps.prepare_ehrshot_cohorts
--cohort_dir <dir> -i <omop_dir> -o <out_dir> [extract_features args...]``
"""

from __future__ import annotations

import argparse
import os

from cehrbert_data_spark.apps import extract_features
from cehrbert_data_spark.session import build_session


def main(
    cohort_dir: str,
    input_folder: str,
    output_folder: str,
    person_id_column: str = "patient_id",
    index_date_column: str = "prediction_time",
    label_column: str = "value",
    spark=None,
    **extract_kwargs,
) -> list[str]:
    spark = spark or build_session("prepare_ehrshot_cohorts")
    done = []
    for task in sorted(os.listdir(cohort_dir)):
        labeled = os.path.join(cohort_dir, task, "labeled_patients.csv")
        if not os.path.exists(labeled):
            continue
        task_out = os.path.join(output_folder, task)
        if os.path.exists(task_out):
            continue
        extract_features.main(
            cohort_path=labeled,
            input_folder=input_folder,
            output_folder=task_out,
            person_id_column=person_id_column,
            index_date_column=index_date_column,
            label_column=label_column,
            spark=spark,
            **extract_kwargs,
        )
        done.append(task)
    return done


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Prepare EHRSHOT cohorts")
    parser.add_argument("--cohort_dir", required=True)
    parser.add_argument("-i", "--input_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("--person_id_column", default="patient_id")
    parser.add_argument("--index_date_column", default="prediction_time")
    parser.add_argument("--label_column", default="value")
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        cohort_dir=args.cohort_dir,
        input_folder=args.input_folder,
        output_folder=args.output_folder,
        person_id_column=args.person_id_column,
        index_date_column=args.index_date_column,
        label_column=args.label_column,
    )
