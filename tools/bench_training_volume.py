"""App-level VOLUME run: generate_training_data end-to-end on the augmented
OMOP sample replicated N× (default 100 ⇒ ≈2,200 persons), with the plan
budget gate ON — the composed-pipeline counterpart of the per-operator
scaled sweeps (VERDICT r8 ask 8).

    python tools/bench_training_volume.py [replicas] [config ...]

configs: day_day | cehrbert_mix | cehrbert_mix_artificial (default: day_day
cehrbert_mix_artificial — the lightest and the heaviest supported plans).

Prints one JSON line per config: persons in, sequences out, wall seconds,
plan-budget report (exchange count — the shuffle census the round notes
record), plus a replica-consistency check: every replica of a person must
produce identical (num_of_visits, num_of_concepts); any cross-replica
drift means per-person logic leaked across persons at volume. Output rows
must equal persons (one sequence per person that survives the age filter),
and per-original-person group counts must equal the replica count.

Run while no other Spark JVM is active (single-box rule); at 100 replicas
set SPARK_DRIVER_MEMORY=8g.
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

CONFIGS = {
    "day_day": dict(att_type="day", inpatient_att_type="day"),
    "cehrbert_mix": dict(att_type="cehr_bert", inpatient_att_type="mix"),
    "cehrbert_mix_artificial": dict(
        att_type="cehr_bert",
        inpatient_att_type="mix",
        should_construct_artificial_visits=True,
    ),
    # A/B partner for the covering-visit rank-1 strategy (round-9 verdict
    # ask 6): identical output (parity-pinned), different physical plan —
    # min-struct partial agg instead of shuffle+sort window.
    "cehrbert_mix_artificial_agg": dict(
        att_type="cehr_bert",
        inpatient_att_type="mix",
        should_construct_artificial_visits=True,
        artificial_visit_relink_form="agg",
    ),
}

#: must match tests/volume_sample.py OFFSET — replica r of person p has id
#: p + r*OFFSET, so id % OFFSET recovers the original person
OFFSET = 100_000


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    replicas = int(args[0]) if args and args[0].isdigit() else 100
    names = [a for a in args if a in CONFIGS] or ["day_day", "cehrbert_mix_artificial"]

    from volume_sample import build_volume_sample

    from cehrbert_data_spark.apps.generate_training_data import main as app_main
    from cehrbert_data_spark.session import build_session

    spark = build_session("bench_training_volume")
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
            overrides = CONFIGS[name]
            t0 = time.time()
            out = app_main(
                input_folder=input_folder,
                output_folder=os.path.join(workdir, f"out_{name}"),
                domain_table_list=[
                    "condition_occurrence", "drug_exposure", "procedure_occurrence",
                ],
                date_filter="1985-01-01",
                include_visit_type=True,
                include_inpatient_hour_token=True,
                apply_age_filter=True,
                plan_check=True,
                spark=spark,
                **overrides,
            )
            wall = time.time() - t0
            seq = spark.read.parquet(out)
            from pyspark.sql import functions as F

            n_rows = seq.count()
            # replica consistency: all replicas of an original person must
            # agree on (num_of_visits, num_of_concepts), and each original
            # person must appear exactly `replicas` times
            per = (
                seq.groupBy(
                    (F.col("person_id").cast("long") % OFFSET).alias("orig"),
                    "num_of_visits",
                    "num_of_concepts",
                )
                .count()
                .groupBy("orig")
                .agg(
                    F.count(F.lit(1)).alias("variants"),
                    F.sum("count").alias("members"),
                )
            )
            bad = per.where(
                (F.col("variants") != 1) | (F.col("members") != replicas)
            ).count()
            print(json.dumps({
                "config": name,
                "replicas": replicas,
                "persons_in": n_persons,
                "sequences_out": n_rows,
                "build_input_sec": round(build_s, 1),
                "pipeline_sec": round(wall, 1),
                "replica_consistency_violations": bad,
            }))
            if bad:
                return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
