"""End-to-end tests for the tool apps: visit connect/update, sampling,
prediction-time conversion (reference test model: run the app main() on a
tiny OMOP folder and assert invariants)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.apps import (
    connect_omop_visit,
    convert_prediction_time,
    sample_omop_tables,
    update_omop_visit,
)


def _ts(d, h=0):
    return datetime.datetime(2020, 1, d, h)


@pytest.fixture()
def omop_dir(spark, tmp_path):
    """Tiny OMOP folder: person 1 has two inpatient visits 2h apart (merge),
    plus an outpatient visit inside the stay (absorb); person 2 untouched."""
    visits = spark.createDataFrame(
        [
            (10, 1, 9201, _ts(1).date(), _ts(1), _ts(2).date(), _ts(2, 10)),
            (11, 1, 9201, _ts(2).date(), _ts(2, 12), _ts(4).date(), _ts(4)),
            (12, 1, 9202, _ts(1).date(), _ts(1, 5), _ts(1).date(), _ts(1, 6)),
            (20, 2, 9202, _ts(5).date(), _ts(5), _ts(5).date(), _ts(5, 1)),
        ],
        "visit_occurrence_id: long, person_id: long, visit_concept_id: int, "
        "visit_start_date: date, visit_start_datetime: timestamp, "
        "visit_end_date: date, visit_end_datetime: timestamp",
    )
    conditions = spark.createDataFrame(
        [(100, 1, 44054006, _ts(2).date(), 11), (101, 2, 44054006, _ts(5).date(), 20)],
        "condition_occurrence_id: long, person_id: long, condition_concept_id: long, "
        "condition_start_date: date, visit_occurrence_id: long",
    )
    persons = spark.createDataFrame(
        [(1, 1980), (2, 1990)], "person_id: long, year_of_birth: int"
    )
    root = tmp_path / "omop"
    visits.write.parquet(str(root / "visit_occurrence"))
    conditions.write.parquet(str(root / "condition_occurrence"))
    persons.write.parquet(str(root / "person"))
    return str(root)


@pytest.mark.slow
def test_connect_then_update_visit(spark, omop_dir, tmp_path):
    out = str(tmp_path / "fixed")
    connect_omop_visit.main(omop_dir, out, spark=spark)

    fixed = spark.read.parquet(out + "/visit_occurrence")
    mapping = spark.read.parquet(out + "/visit_mapping")
    # visits 11 (gap 2h <= 24h) and 12 (inside stay) collapse into 10
    kept = {r["visit_occurrence_id"] for r in fixed.collect()}
    assert kept == {10, 20}
    mapped = {
        (r["visit_occurrence_id"], r["master_visit_occurrence_id"])
        for r in mapping.collect()
    }
    assert mapped == {(11, 10), (12, 10)}
    # master visit span widened to cover the absorbed visit
    span = fixed.where("visit_occurrence_id = 10").collect()[0]
    assert span["visit_end_datetime"] == _ts(4)

    out2 = str(tmp_path / "updated")
    written = update_omop_visit.main(omop_dir, out, out2, spark=spark)
    assert "condition_occurrence" in written and "person" in written
    cond = spark.read.parquet(out2 + "/condition_occurrence")
    by_id = {r["condition_occurrence_id"]: r["visit_occurrence_id"] for r in cond.collect()}
    assert by_id == {100: 10, 101: 20}  # 11 → master 10, 20 unchanged


def test_sample_omop_tables(spark, omop_dir, tmp_path):
    sample = spark.createDataFrame([(1,)], "person_id: long")
    sample_path = str(tmp_path / "sample")
    sample.write.parquet(sample_path)

    out = str(tmp_path / "subset")
    written = sample_omop_tables.main(sample_path, omop_dir, out, spark=spark)
    assert set(written) == {"person", "visit_occurrence", "condition_occurrence"}
    assert spark.read.parquet(out + "/person").count() == 1
    visits = spark.read.parquet(out + "/visit_occurrence")
    assert {r["person_id"] for r in visits.collect()} == {1}


def test_convert_prediction_time(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2020, 6, 1, 12, 30, 0))],
        "subject_id: long, prediction_time: timestamp",
    )
    src = tmp_path / "in" / "cohort.parquet"
    df.coalesce(1).write.parquet(str(src))

    out_local = str(tmp_path / "local")
    convert_prediction_time.main(str(tmp_path / "in"), out_local, mode="local",
                                 timezone="America/New_York", spark=spark)
    row = spark.read.parquet(out_local + "/cohort").collect()[0]
    # 12:30 UTC == 08:30 EDT (June = daylight time)
    assert row["prediction_time"] == datetime.datetime(2020, 6, 1, 8, 30, 0)

    out_str = str(tmp_path / "str")
    convert_prediction_time.main(str(tmp_path / "in"), out_str, mode="str", spark=spark)
    row = spark.read.parquet(out_str + "/cohort").collect()[0]
    assert row["prediction_time"] == "2020-06-01 12:30:00.000000"


def test_curate_corpus_end_to_end(spark, tmp_path):
    from cehrbert_data_spark.apps.curate_corpus import main as curate_main

    out_dir = str(tmp_path / "curated")
    metrics = curate_main(
        "/root/testdata/sf0.001/documents.parquet",
        out_dir,
        plan_check=True,
        spark=spark,
    )
    # every stage monotonically narrows the corpus
    assert metrics["input"] >= metrics["after_exact_dedup"] >= metrics["after_near_dedup"]
    assert metrics["after_near_dedup"] == metrics["output"] > 0
    # funnel attribution covers every input doc exactly once
    funnel_total = sum(v for k, v in metrics.items() if k.startswith("funnel_"))
    assert funnel_total == metrics["input"]
    # written corpus matches the reported count; report parquet readable
    corpus = spark.read.parquet(f"{out_dir}/corpus")
    assert corpus.count() == metrics["output"]
    report = spark.read.parquet(f"{out_dir}/report")
    assert {r["stage"] for r in report.collect()} >= {"input", "output"}
    # curated docs are unique by text (exact dedup held)
    assert corpus.select("text").distinct().count() == metrics["output"]


def test_curate_corpus_jsonl_sink(spark, tmp_path):
    from cehrbert_data_spark.apps.curate_corpus import main as curate_main

    out_dir = str(tmp_path / "curated_jl")
    metrics = curate_main(
        "/root/testdata/sf0.001/documents.parquet",
        out_dir,
        out_format="jsonl",
        near_dedup=False,
        spark=spark,
    )
    back = spark.read.json(f"{out_dir}/corpus")
    assert back.count() == metrics["output"]


def test_curate_corpus_shuffle_shards_sink(spark, tmp_path):
    import glob as _glob

    from cehrbert_data_spark.apps.curate_corpus import main as curate_main

    out_dir = str(tmp_path / "curated_sh")
    metrics = curate_main(
        "/root/testdata/sf0.001/documents.parquet",
        out_dir,
        near_dedup=False,
        shuffle_shards=4,
        spark=spark,
    )
    shards = sorted(_glob.glob(f"{out_dir}/corpus/shard=*"))
    assert len(shards) == 4
    back = spark.read.parquet(f"{out_dir}/corpus")
    assert back.count() == metrics["output"]
    assert back.select("doc_id").distinct().count() == metrics["output"]


def test_curate_corpus_substring_dedup_stage(spark, tmp_path):
    from cehrbert_data_spark.apps.curate_corpus import main as curate_main

    out_dir = str(tmp_path / "curated_ss")
    metrics = curate_main(
        "/root/testdata/sf0.001/documents.parquet",
        out_dir,
        substring_dedup_n=5,
        plan_check=True,
        spark=spark,
    )
    # stage present and doc COUNT unchanged by it (tokens are removed, docs
    # survive) — downstream stages still narrow monotonically
    assert metrics["after_substring_dedup"] == metrics["funnel_pass"]
    assert (
        metrics["after_substring_dedup"]
        >= metrics["after_exact_dedup"]
        >= metrics["after_near_dedup"]
        == metrics["output"]
        > 0
    )
    # no surviving doc contains a 5-gram duplicated within the output corpus
    # MORE than its own duplication budget: spot-check that the rewrite ran
    # by confirming at least one doc shrank vs the raw input
    corpus = spark.read.parquet(f"{out_dir}/corpus")
    raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.length("text").alias("raw_len")
    )
    joined = corpus.select("doc_id", F.length("text").alias("new_len")).join(
        raw, "doc_id"
    )
    assert joined.where(F.col("new_len") < F.col("raw_len")).count() > 0
