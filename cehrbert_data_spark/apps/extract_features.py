"""Feature-extraction app: external cohort (CSV/parquet) + OMOP folder →
ATT sequences or concept-frequency features per cohort member.

Mirrors the reference's lifecycle (reference: tools/extract_features.py:75-333,
SURVEY.md §3.3): normalize the user-named columns to person_id / index_date /
label, assign cohort_member_ids, extract + clamp EHR records to the index
date (observation window + hold-off), build features, re-attach
demographics and labels.

Run: ``python -m cehrbert_data_spark.apps.extract_features --cohort <file>
-i <omop_dir> -o <out_dir> --person_id_column pid --index_date_column t
--label_column y``
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cehrbert_data_spark.omop.events import extract_ehr_records
from cehrbert_data_spark.omop.sequence import (
    create_concept_frequency_data,
    create_sequence_data_with_att,
)
from cehrbert_data_spark.operators.ids import dense_ids
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import (
    normalize_domain_table,
    read_csv,
    read_parquet,
)
from cehrbert_data_spark.sources.writers import write_parquet


def load_cohort(
    spark,
    cohort_path: str,
    person_id_column: str,
    index_date_column: str,
    label_column: str,
) -> DataFrame:
    """Normalize the external cohort to (cohort_member_id, person_id,
    index_date, label) — member ids are dense in (person, index) order via the
    distributed two-pass ranker (the reference uses a global window,
    tools/extract_features.py:104)."""
    if cohort_path.endswith(".csv"):
        cohort = read_csv(spark, cohort_path)
    else:
        cohort = read_parquet(spark, cohort_path)
    cohort = cohort.select(
        F.col(person_id_column).alias("person_id"),
        F.to_timestamp(F.col(index_date_column)).alias("index_date"),
        F.col(label_column).alias("label"),
    )
    return dense_ids(
        cohort,
        [F.col("person_id"), F.col("index_date")],
        out="cohort_member_id",
    )


def main(
    cohort_path: str,
    input_folder: str,
    output_folder: str,
    person_id_column: str = "person_id",
    index_date_column: str = "index_date",
    label_column: str = "label",
    domain_table_list: list[str] | None = None,
    observation_window: int = 0,
    hold_off_window: int = 0,
    use_sequence: bool = True,
    att_type: str = "cehr_bert",
    inpatient_att_type: str = "mix",
    include_visit_type: bool = False,
    exclude_visit_tokens: bool = False,
    include_inpatient_hour_token: bool = False,
    last_visit_feature: str | None = None,
    spark=None,
):
    spark = spark or build_session("extract_features")
    domain_table_list = domain_table_list or [
        "condition_occurrence", "procedure_occurrence", "drug_exposure"
    ]

    cohort = load_cohort(
        spark, cohort_path, person_id_column, index_date_column, label_column
    )

    def load(name):
        return normalize_domain_table(read_parquet(spark, os.path.join(input_folder, name)))

    tables = {n: load(n) for n in domain_table_list + ["person", "visit_occurrence"]}
    concept = None
    if os.path.exists(os.path.join(input_folder, "concept")):
        concept = load("concept")

    # Events always carry visit_concept_id — this engine's decorator chain
    # requires it internally; ``include_visit_type`` governs whether the
    # SEQUENCE emits visit-type tokens (the reference threads the flag into
    # both layers, but its decorators tolerate the missing column).
    records = extract_ehr_records(
        tables, domain_table_list, concept=concept, include_visit_type=True
    )

    # Duplicate events per cohort membership, clamp to the index date with
    # hold-off and optional observation window
    # (reference: cohorts/spark_app_base.py:610-632).
    member = cohort.select("person_id", "cohort_member_id", "index_date")
    records = records.join(member, "person_id")
    upper = F.expr(f"index_date - INTERVAL {hold_off_window} DAY + INTERVAL 0.1 SECOND")
    records = records.where(F.col("datetime") <= upper)
    if observation_window > 0:
        lower = F.expr(
            f"index_date - INTERVAL {observation_window + hold_off_window} DAY"
        )
        records = records.where(F.col("datetime") >= lower)
    records = records.drop("index_date")

    if use_sequence:
        features = create_sequence_data_with_att(
            records,
            tables["visit_occurrence"].join(
                tables["person"].select(
                    "person_id",
                    F.coalesce(
                        "birth_datetime",
                        F.concat("year_of_birth", F.lit("-01-01")).cast("timestamp"),
                    ).alias("birth_datetime"),
                ),
                "person_id",
            )
            .withColumn(
                "age",
                F.ceil(
                    F.months_between(F.col("visit_start_date"), F.col("birth_datetime"))
                    / F.lit(12)
                ),
            )
            .drop("birth_datetime"),
            att_type=att_type,
            inpatient_att_type=inpatient_att_type,
            include_visit_type=include_visit_type,
            exclude_visit_tokens=exclude_visit_tokens,
            include_inpatient_hour_token=include_inpatient_hour_token,
            cohort_index=cohort.select("person_id", "cohort_member_id", "index_date"),
        )
    else:
        features = create_concept_frequency_data(records)

    # Re-attach demographics + label the way the reference's task_labels
    # output does (tools/extract_features.py:289-317): age at index year,
    # race coalesced to 0, members without features drop (inner join).
    labeled = cohort.join(
        tables["person"].select(
            "person_id",
            "year_of_birth",
            F.coalesce(F.col("race_concept_id"), F.lit(0))
            .cast("int")
            .alias("race_concept_id"),
            "gender_concept_id",
        ),
        "person_id",
    ).select(
        "person_id", "cohort_member_id", "index_date", "label",
        (F.year("index_date") - F.col("year_of_birth")).alias("age"),
        "race_concept_id", "gender_concept_id",
    )
    out = features.join(labeled, ["person_id", "cohort_member_id"])
    if last_visit_feature is not None:
        # Visit-recency features via the unbounded-lookback as-of match
        # (omop.visits.index_visit_features). 'merge' is the scale form —
        # one shuffle of |cohort|+|visits| no matter how deep each member's
        # history runs; 'rank1' the windowed cross-check (test-pinned equal).
        from cehrbert_data_spark.omop.visits import index_visit_features

        recency = index_visit_features(
            cohort, tables["visit_occurrence"], form=last_visit_feature
        ).select(
            "person_id",
            "cohort_member_id",
            "last_visit_occurrence_id",
            "last_visit_concept_id",
            "days_since_last_visit",
        )
        out = out.join(recency, ["person_id", "cohort_member_id"], "left")
    out_path = os.path.join(output_folder, "task_features")
    write_parquet(out, out_path)
    return out_path


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Extract features for an external cohort")
    parser.add_argument("--cohort", required=True, dest="cohort_path")
    parser.add_argument("-i", "--input_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("--person_id_column", default="person_id")
    parser.add_argument("--index_date_column", default="index_date")
    parser.add_argument("--label_column", default="label")
    parser.add_argument("-tc", "--domain_table_list", nargs="+", default=None)
    parser.add_argument("-ow", "--observation_window", type=int, default=0)
    parser.add_argument("-how", "--hold_off_window", type=int, default=0)
    parser.add_argument("--frequency_features", action="store_true")
    parser.add_argument("--att_type", default="cehr_bert")
    parser.add_argument("--inpatient_att_type", default="mix")
    parser.add_argument(
        "--last_visit_feature",
        default=None,
        choices=["merge", "rank1"],
        help="attach last-visit recency features via the merge-form "
        "(unbounded-lookback, scale shape) or rank-1 as-of join",
    )
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        cohort_path=args.cohort_path,
        input_folder=args.input_folder,
        output_folder=args.output_folder,
        person_id_column=args.person_id_column,
        index_date_column=args.index_date_column,
        label_column=args.label_column,
        domain_table_list=args.domain_table_list,
        observation_window=args.observation_window,
        hold_off_window=args.hold_off_window,
        use_sequence=not args.frequency_features,
        att_type=args.att_type,
        inpatient_att_type=args.inpatient_att_type,
        last_visit_feature=args.last_visit_feature,
    )
