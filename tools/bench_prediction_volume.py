"""App-level VOLUME run: generate_prediction_cohort end-to-end on the
augmented OMOP sample replicated N× with the plan budget gate ON — the
prediction-app counterpart of tools/bench_training_volume.py (round-9
verdict ask 5: the r5 plan census measured 93 exchanges for this app;
assert the app's own 144 ceiling and volume-invariance of the count).

    python tools/bench_prediction_volume.py [replicas] [cohort ...]

cohorts: any PREDICTION_COHORTS key (default: readmission hospitalization
— the index-event labeler and the observation-window/total-window pair,
the two structurally distinct target shapes).

Prints one JSON line per cohort: persons in, labeled samples out,
positive count, wall seconds, exchange census, plus the replica
consistency check: replicas only shift ids (dates/values are identical),
so every original person must contribute an IDENTICAL multiset of
(index_date, label) in each replica — any drift means per-person logic
leaked across persons at volume. Checked exactly: each
(original person, index_date) must carry exactly one distinct label and
exactly `replicas` members.

Run while no other Spark JVM is active (single-box rule); at 100+
replicas set SPARK_DRIVER_MEMORY=8g+.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

#: must match tests/volume_sample.py OFFSET
OFFSET = 100_000


def main() -> int:
    from volume_sample import build_volume_sample

    from cehrbert_data_spark.apps.generate_prediction_cohort import (
        PREDICTION_COHORTS,
        main as app_main,
    )
    from cehrbert_data_spark.session import build_session

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    replicas = int(args[0]) if args and args[0].isdigit() else 100
    names = [a for a in args if a in PREDICTION_COHORTS] or [
        "readmission",
        "hospitalization",
    ]

    spark = build_session("bench_prediction_volume")
    from pyspark.sql import functions as F

    rc = 0
    with tempfile.TemporaryDirectory() as workdir:
        t0 = time.time()
        input_folder = build_volume_sample(
            os.path.join(workdir, "omop"), replicas=replicas
        )
        build_s = time.time() - t0
        n_persons = spark.read.parquet(
            os.path.join(input_folder, "person")
        ).count()
        for name in names:
            t0 = time.time()
            out = app_main(
                input_folder=input_folder,
                output_folder=os.path.join(workdir, f"out_{name}"),
                cohort_name=name,
                ehr_table_list=[
                    "condition_occurrence",
                    "drug_exposure",
                    "procedure_occurrence",
                ],
                observation_window=360,
                hold_off_window=180,
                prediction_window=30,
                plan_check=True,
                spark=spark,
            )
            wall = time.time() - t0
            result = spark.read.parquet(out)
            n_rows = result.count()
            n_pos = result.where(F.col("label") == 1).count()
            per = (
                result.groupBy(
                    (F.col("person_id").cast("long") % OFFSET).alias("orig"),
                    "index_date",
                )
                .agg(
                    F.countDistinct("label").alias("labels"),
                    F.count(F.lit(1)).alias("members"),
                )
            )
            bad = per.where(
                (F.col("labels") != 1) | (F.col("members") != replicas)
            ).count()
            print(
                json.dumps(
                    {
                        "config": name,
                        "replicas": replicas,
                        "persons_in": n_persons,
                        "samples_out": n_rows,
                        "positives": n_pos,
                        "build_input_sec": round(build_s, 1),
                        "pipeline_sec": round(wall, 1),
                        "replica_consistency_violations": bad,
                    }
                ),
                flush=True,
            )
            if bad:
                rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
