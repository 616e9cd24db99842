"""Prediction-cohort app: run any registered (target, outcome) pair end-to-end.

One CLI replaces the reference's 13 per-task prediction apps
(prediction_cohorts/*.py — each a thin main() over create_prediction_cohort,
spark_app_base.py:794-896): pick a pair from
:data:`cehrbert_data_spark.omop.cohort_library.PREDICTION_COHORTS` by name,
build both cohorts, label over the prediction window, attach ATT sequences or
frequency features, and write (with train/test split when patient_splits
exists).

Run: ``python -m cehrbert_data_spark.apps.generate_prediction_cohort
-i <omop_dir> -o <out_dir> --cohort_name hf_readmission
-dl 1985-01-01 -du 2023-12-31 -l 18 -u 100 -ow 360 -ps 0 -pw 30``
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import functions as F

from cehrbert_data_spark.omop.cohort import (
    add_time_to_event,
    build_base_cohort,
    label_cohort,
    to_meds_format,
)
from cehrbert_data_spark.omop.cohort_library import PREDICTION_COHORTS
from cehrbert_data_spark.omop.events import extract_ehr_records
from cehrbert_data_spark.omop.sequence import (
    create_concept_frequency_data,
    create_sequence_data_with_att,
)
from cehrbert_data_spark.omop.vocab import get_descendant_concepts
from cehrbert_data_spark.session import build_session
from cehrbert_data_spark.sources.readers import normalize_domain_table, read_parquet
from cehrbert_data_spark.sources.writers import write_parquet, write_split

DEFAULT_EHR_TABLES = ["condition_occurrence", "procedure_occurrence", "drug_exposure"]


def main(
    input_folder: str,
    output_folder: str,
    cohort_name: str,
    date_lower_bound: str = "1985-01-01",
    date_upper_bound: str = "2099-12-31",
    age_lower_bound: int = 0,
    age_upper_bound: int = 100,
    observation_window: int = 360,
    hold_off_window: int = 0,
    prediction_start_days: int = 0,
    prediction_window: int = 30,
    prediction_window_unbounded: bool = False,
    ehr_table_list: list[str] | None = None,
    is_feature_concept_frequency: bool = False,
    att_type: str = "cehr_bert",
    meds_format: bool = False,
    single_contribution: bool = False,
    plan_check: bool = False,
    dry_run: bool = False,
    spark=None,
) -> str:
    if cohort_name not in PREDICTION_COHORTS:
        raise ValueError(
            f"unknown cohort {cohort_name!r}; choose from {sorted(PREDICTION_COHORTS)}"
        )
    spark = spark or build_session(f"generate_prediction_cohort_{cohort_name}")
    target_fn, outcome_fn = PREDICTION_COHORTS[cohort_name]

    def instantiate(factory):
        # SQL-templated builders embed the date lower bound (the reference
        # threads spark_args.date_lower_bound into its query templates) and
        # window-derived params: hospitalization_target's total_window is
        # observation_window + hold_off_window (reference:
        # prediction_cohorts/hospitalization.py:63), NOT a constant — only
        # the golden config (360+180) coincides with the 540 default.
        import inspect

        params = inspect.signature(factory).parameters
        kwargs = {}
        if "date_lower_bound" in params:
            kwargs["date_lower_bound"] = date_lower_bound
        if "total_window" in params:
            kwargs["total_window"] = observation_window + hold_off_window
        return factory(**kwargs)

    target_builder, outcome_builder = instantiate(target_fn), instantiate(outcome_fn)

    def load(name):
        return normalize_domain_table(read_parquet(spark, os.path.join(input_folder, name)))

    dep_names = set(
        target_builder.dependency_list + outcome_builder.dependency_list
        + ["person", "visit_occurrence", "observation_period"]
        + ["concept", "concept_ancestor", "concept_relationship"]
        + (ehr_table_list or DEFAULT_EHR_TABLES)
    )
    tables = {
        n: load(n)
        for n in dep_names
        if os.path.exists(os.path.join(input_folder, n))
    }

    def ancestor_fn(spec):
        if not spec.is_standard:
            # non-standard seeds resolve by the iterative 'Subsumes' BFS
            # (reference: vocab_utils.build_ancestry_table_for)
            from cehrbert_data_spark.omop.vocab import build_ancestry_table

            return build_ancestry_table(
                tables["concept_relationship"], spec.ancestor_concept_ids
            )
        return get_descendant_concepts(
            tables["concept"], tables["concept_ancestor"], spec.ancestor_concept_ids
        )

    def build(builder, build_tables, prior_observation_period):
        # Reference: the target qualifies on observation_window +
        # hold_off_window days of prior observation; the outcome on 0 —
        # but BOTH pass through the observation-period / demographics /
        # age / date qualification (spark_app_base.py:794-846, 200-213).
        return build_base_cohort(
            spark, builder, build_tables,
            age_lower_bound=age_lower_bound, age_upper_bound=age_upper_bound,
            date_lower_bound=date_lower_bound, date_upper_bound=date_upper_bound,
            prior_observation_period=prior_observation_period,
            ancestor_table_fn=ancestor_fn,
        )

    target = build(target_builder, tables, observation_window + hold_off_window)
    # outcome builders may consume views the target build registered
    # (e.g. hospitalization_mortality); missing deps resolve from the catalog
    outcome_tables = {
        **tables,
        **{
            n: spark.table(n)
            for n in outcome_builder.dependency_list if n not in tables
        },
    }
    outcome = build(outcome_builder, outcome_tables, 0)

    # An outcome with a negative ("questionable") query removes those persons
    # from the target (reference: create_prediction_cohort sets
    # is_questionable_outcome_existed from the outcome builder).
    negative = (
        spark.table(outcome_builder.negative_query.table_name)
        if outcome_builder.negative_query is not None else None
    )
    labeled = label_cohort(
        target, outcome, tables["observation_period"],
        prediction_start_days=prediction_start_days,
        prediction_window=prediction_window,
        prediction_window_unbounded=prediction_window_unbounded,
        single_contribution=single_contribution,
        negative_cohort=negative,
    )
    # study_end_date / time_to_event always ride along in the reference's
    # final cohort output (spark_app_base.py:559-583).
    labeled = add_time_to_event(
        labeled,
        tables.get("observation_period"),
        prediction_window,
        prediction_window_unbounded,
    )

    domain_names = [
        n for n in (ehr_table_list or DEFAULT_EHR_TABLES) if n in tables
    ]
    records = extract_ehr_records(
        tables, domain_names, concept=tables.get("concept"), include_visit_type=True
    )

    # Duplicate events per cohort membership and clamp to the observation
    # window before the index date (reference: spark_app_base.py:610-632).
    member = labeled.select("person_id", "cohort_member_id", "index_date")
    records = records.join(member, "person_id")
    upper = F.expr(f"index_date - INTERVAL {hold_off_window} DAY + INTERVAL 0.1 SECOND")
    records = records.where(F.col("datetime") <= upper)
    if observation_window > 0:
        records = records.where(
            F.col("datetime")
            >= F.expr(f"index_date - INTERVAL {observation_window + hold_off_window} DAY")
        )
    records = records.drop("index_date")

    if is_feature_concept_frequency:
        features = create_concept_frequency_data(records)
    else:
        visit_with_age = (
            tables["visit_occurrence"]
            .join(
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
            .drop("birth_datetime")
        )
        features = create_sequence_data_with_att(
            records, visit_with_age, att_type=att_type,
            cohort_index=labeled.select("cohort_member_id", "person_id", "index_date"),
        )
    result = features.join(
        labeled.select(
            "cohort_member_id", "person_id", "index_date", "label", "age",
            "gender_concept_id", "race_concept_id",
            "outcome_date", "study_end_date", "time_to_event",
        ),
        ["cohort_member_id", "person_id"],
    )
    if meds_format:
        result = to_meds_format(result)

    if plan_check:
        # App-level plan budget on the composed labeled-feature pipeline
        # (see plans.budget): analysis-only, fails fast on a degraded plan.
        # Exchange ceiling: measured 74-116 across all 12 cohorts (the
        # heaviest, t2dm_hf, was 302 before dependency views were
        # checkpointed — see omop/cohort.py create_cohort); 144 leaves
        # refactor headroom while failing on a doubled plan.
        from cehrbert_data_spark.plans.budget import assert_plan_budget

        report = assert_plan_budget(
            result, f"generate_prediction_cohort:{cohort_name}", max_exchanges=144
        )
        print(f"plan budget ok: {report}")

    out = os.path.join(output_folder, cohort_name)
    if dry_run:
        return out
    splits_path = os.path.join(input_folder, "patient_splits")
    person_col = "subject_id" if meds_format else "person_id"
    if os.path.exists(splits_path):
        write_split(result, read_parquet(spark, splits_path), out, person_col=person_col)
    else:
        write_parquet(result, out)
    return out


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Generate a labeled prediction cohort")
    parser.add_argument("-i", "--input_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("--cohort_name", required=True, choices=sorted(PREDICTION_COHORTS))
    parser.add_argument("-dl", "--date_lower_bound", default="1985-01-01")
    parser.add_argument("-du", "--date_upper_bound", default="2099-12-31")
    parser.add_argument("-l", "--age_lower_bound", type=int, default=0)
    parser.add_argument("-u", "--age_upper_bound", type=int, default=100)
    parser.add_argument("-ow", "--observation_window", type=int, default=360)
    parser.add_argument("-how", "--hold_off_window", type=int, default=0)
    parser.add_argument("-ps", "--prediction_start_days", type=int, default=0)
    parser.add_argument("-pw", "--prediction_window", type=int, default=30)
    parser.add_argument("--prediction_window_unbounded", action="store_true")
    parser.add_argument("-tc", "--ehr_table_list", nargs="+", default=None)
    parser.add_argument("--is_feature_concept_frequency", action="store_true")
    parser.add_argument("--att_type", default="cehr_bert")
    parser.add_argument("--meds_format", action="store_true")
    parser.add_argument("--single_contribution", action="store_true")
    parser.add_argument(
        "--plan_check", action="store_true",
        help="assert the composed pipeline's plan budget before writing",
    )
    parser.add_argument(
        "--dry_run", action="store_true",
        help="build and (with --plan_check) validate the plan, write nothing",
    )
    return parser.parse_args(argv)


if __name__ == "__main__":
    args = parse_args()
    main(
        input_folder=args.input_folder,
        output_folder=args.output_folder,
        cohort_name=args.cohort_name,
        date_lower_bound=args.date_lower_bound,
        date_upper_bound=args.date_upper_bound,
        age_lower_bound=args.age_lower_bound,
        age_upper_bound=args.age_upper_bound,
        observation_window=args.observation_window,
        hold_off_window=args.hold_off_window,
        prediction_start_days=args.prediction_start_days,
        prediction_window=args.prediction_window,
        prediction_window_unbounded=args.prediction_window_unbounded,
        ehr_table_list=args.ehr_table_list,
        is_feature_concept_frequency=args.is_feature_concept_frequency,
        att_type=args.att_type,
        meds_format=args.meds_format,
        single_contribution=args.single_contribution,
        plan_check=args.plan_check,
        dry_run=args.dry_run,
    )
