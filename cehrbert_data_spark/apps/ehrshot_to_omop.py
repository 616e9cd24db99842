"""EHRSHOT → OMOP conversion app (D10).

Composes the conversion layer in ``omop/ehrshot.py`` into the reference's
CLI flow (reference: tools/ehrshot_to_omop.py:786-915): read the EHRSHOT
event CSV, reconstruct visit ids, pivot the person table, convert each
domain's rows to its OMOP table (code → concept_id via the vocabulary,
value typing for measurement/observation, visit dedup by priority), and copy
the vocabulary through.

Domain-table ids are assigned with the distributed two-pass ranker over a
deterministic (person, time, code) order — same dense 1..N contract as the
reference's global-window ``row_number`` (ehrshot_to_omop.py:900) without
the single-partition shuffle.

Run: ``python -m cehrbert_data_spark.apps.ehrshot_to_omop
--ehr_shot_file events.csv --vocabulary_folder <vocab> -o <out_dir>``
"""

from __future__ import annotations

import argparse
import os
import shutil

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cehrbert_data_spark.omop.ehrshot import (
    EHRSHOT_SCHEMA,
    INPATIENT_CODES,
    convert_code_to_omop_concept,
    create_omop_person,
    disconnect_visit_id,
    drop_duplicate_visits,
    extract_value,
    generate_visit_id,
    promote_inferred_inpatient,
)
from cehrbert_data_spark.operators.ids import dense_ids
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import read_parquet
from cehrbert_data_spark.sources.writers import checkpoint_barrier, write_parquet

VOCABULARY_TABLES = ["concept", "concept_relationship", "concept_ancestor"]

#: EHRSHOT column → OMOP column per target table
#: (reference: tools/ehrshot_to_omop.py:20-78).
TABLE_MAPPING: dict[str, dict[str, str]] = {
    "visit_occurrence": {
        "patient_id": "person_id",
        "start": "visit_start_datetime",
        "end": "visit_end_datetime",
        "code": "visit_source_value",
        "visit_id": "visit_occurrence_id",
    },
    "condition_occurrence": {
        "patient_id": "person_id",
        "start": "condition_start_datetime",
        "end": "condition_end_datetime",
        "code": "condition_source_value",
        "visit_id": "visit_occurrence_id",
    },
    "procedure_occurrence": {
        "patient_id": "person_id",
        "start": "procedure_datetime",
        "end": "procedure_end_datetime",
        "code": "procedure_source_value",
        "visit_id": "visit_occurrence_id",
    },
    "drug_exposure": {
        "patient_id": "person_id",
        "start": "drug_exposure_start_datetime",
        "end": "drug_exposure_end_datetime",
        "code": "drug_source_value",
        "visit_id": "visit_occurrence_id",
    },
    "measurement": {
        "patient_id": "person_id",
        "start": "measurement_datetime",
        "code": "measurement_source_value",
        "visit_id": "visit_occurrence_id",
    },
    "observation": {
        "patient_id": "person_id",
        "start": "observation_datetime",
        "code": "observation_source_value",
        "visit_id": "visit_occurrence_id",
    },
    "death": {
        "patient_id": "person_id",
        "start": "death_datetime",
        "code": "death_source_value",
    },
}

CONCEPT_ID_MAPPING = {
    "visit_occurrence": "visit_concept_id",
    "condition_occurrence": "condition_concept_id",
    "procedure_occurrence": "procedure_concept_id",
    "drug_exposure": "drug_concept_id",
    "measurement": "measurement_concept_id",
    "observation": "observation_concept_id",
    "death": "death_type_concept_id",
}


def convert_domain_table(name: str, events, concept):
    """One EHRSHOT domain slice → its OMOP table."""
    mapping = TABLE_MAPPING[name]
    table = events.where(F.col("omop_table") == name)
    original = list(table.columns)
    for src, dst in mapping.items():
        if dst.endswith("datetime"):
            table = table.withColumn(dst, F.col(src).cast(T.TimestampType()))
            table = table.withColumn(dst[:-4], F.col(dst).cast(T.DateType()))
        else:
            table = table.withColumn(dst, F.col(src))
    if name in ("measurement", "observation"):
        table = extract_value(table, concept)
    table = convert_code_to_omop_concept(table, concept, "code").withColumnRenamed(
        "concept_id", CONCEPT_ID_MAPPING[name]
    )
    if name == "visit_occurrence":
        # EHRSHOT has no discharge disposition; inpatient-like visits get 0
        # (reference: ehrshot_to_omop.py:880-890)
        table = drop_duplicate_visits(table).withColumn(
            "discharged_to_concept_id",
            F.when(
                F.col("visit_concept_id").isin([9201, 262, 8971, 8920]),
                F.lit(0).cast(T.IntegerType()),
            ).otherwise(F.lit(None).cast(T.IntegerType())),
        )
    else:
        table = dense_ids(
            table,
            [F.col("person_id"), F.col(mapping["start"]), F.col("code")],
            out=f"{name}_id",
        )
    return table.drop(*[c for c in original if c in table.columns])


def main(
    ehr_shot_file: str,
    vocabulary_folder: str,
    output_folder: str,
    day_cutoff: int = 1,
    spark=None,
) -> list[str]:
    spark = spark or build_session("ehrshot_to_omop")
    events = (
        spark.read.option("header", "true")
        .schema(EHRSHOT_SCHEMA)
        .csv(ehr_shot_file)
        .withColumn("visit_id", F.col("visit_id").cast(T.LongType()))
        .drop("_c0")
    )
    # Materialization barriers (the reference's S10 write+re-read pattern,
    # patient_event_decorator_base.py:38-43; ehrshot_to_omop.py:492-494):
    # each reconstruction step references its input several times (self-joins
    # + multi-way unions), so without a barrier the logical plan grows
    # multiplicatively and the per-domain fan-out below re-derives the whole
    # tree — the plan itself, not the data, overwhelms the driver.
    events = checkpoint_barrier(generate_visit_id(events, day_cutoff=day_cutoff))
    # Refinements (reference: ehrshot_to_omop.py:593-741, 818-858): split
    # visits whose events leak outside their range, then promote outpatient
    # visits with >24 h clinical spans to inferred inpatient visits.
    events = disconnect_visit_id(events, day_cutoff=day_cutoff)
    events = checkpoint_barrier(promote_inferred_inpatient(events))
    concept = read_parquet(spark, os.path.join(vocabulary_folder, "concept"))

    person = create_omop_person(events, concept)
    write_parquet(person, os.path.join(output_folder, "person"))
    written = ["person"]

    for name in TABLE_MAPPING:
        table = convert_domain_table(name, events, concept)
        write_parquet(table, os.path.join(output_folder, name))
        written.append(name)

    for vocab in VOCABULARY_TABLES:
        src = os.path.join(vocabulary_folder, vocab)
        dst = os.path.join(output_folder, vocab)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copytree(src, dst)
            written.append(vocab)
    return written


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Convert EHRSHOT data to OMOP")
    parser.add_argument("--ehr_shot_file", required=True)
    parser.add_argument("--vocabulary_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("--day_cutoff", type=int, default=1)
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        ehr_shot_file=args.ehr_shot_file,
        vocabulary_folder=args.vocabulary_folder,
        output_folder=args.output_folder,
        day_cutoff=args.day_cutoff,
    )
