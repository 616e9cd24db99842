"""Domain consumers of the scale-shaped join forms (round-6 verdict ask #6).

``asof_join_union`` (merge form) and ``overlap_join_buckets`` were
oracle-green but nothing in the OMOP layer used them; these tests pin their
first real consumers:

* ``omop.visits.index_visit_features`` — unbounded-lookback "last visit
  before index date" recency features, merge form identical row-for-row to
  the rank-1 form on the reference's 22-person OMOP sample, and surfaced
  end-to-end through the extract_features app;
* ``omop.visits.concurrent_visit_census`` — keyless interval-overlap
  facility-load counts, checked against an O(n²) brute force.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

OMOP_SAMPLE = "/root/reference/sample_data/omop_sample"


def _load_cohort_and_visits(spark, tmp_path):
    from feature_cohort import write_cohort_csv
    from cehrbert_data_spark.apps.extract_features import load_cohort
    from cehrbert_data_spark.sources.readers import (
        normalize_domain_table,
        read_parquet,
    )

    csv_path = write_cohort_csv(str(tmp_path))
    cohort = load_cohort(spark, csv_path, "subject_id", "prediction_time", "outcome")
    visits = normalize_domain_table(
        read_parquet(spark, os.path.join(OMOP_SAMPLE, "visit_occurrence"))
    )
    return cohort, visits


def _by_member(df):
    # person_id arrives as int from the operator path and as string from
    # parquet written off the CSV-typed cohort — normalize for comparison
    return {
        (int(r["person_id"]), int(r["cohort_member_id"])): (
            r["last_visit_occurrence_id"],
            r["last_visit_concept_id"],
            r["days_since_last_visit"],
        )
        for r in df.collect()
    }


@pytest.mark.skipif(not os.path.isdir(OMOP_SAMPLE), reason="sample OMOP absent")
@pytest.mark.slow
def test_index_visit_features_merge_equals_rank1_on_sample(spark, tmp_path):
    from cehrbert_data_spark.omop.visits import index_visit_features

    cohort, visits = _load_cohort_and_visits(spark, tmp_path)
    merge = _by_member(index_visit_features(cohort, visits, form="merge"))
    rank1 = _by_member(index_visit_features(cohort, visits, form="rank1"))
    assert merge == rank1
    # skew-hardened merge form: 30-day buckets, identical result
    salted = _by_member(
        index_visit_features(
            cohort, visits, form="merge", salt_bucket_seconds=30 * 86400
        )
    )
    assert salted == merge
    assert len(merge) == 5  # every member present (left semantics)
    # members have history before their index by construction, so the
    # feature is non-NULL and the gap is non-negative
    assert all(v[0] is not None and v[2] >= 0 for v in merge.values())


def test_index_visit_features_ties_and_no_history(spark):
    from cehrbert_data_spark.omop.visits import index_visit_features

    cohort = spark.createDataFrame(
        [(1, 101, "2020-06-01 00:00:00"), (2, 102, "2020-01-01 00:00:00")],
        "person_id: int, cohort_member_id: int, index_date: string",
    ).withColumn("index_date", F.to_timestamp("index_date"))
    # person 1: two visits tied on start — the GREATEST id must win in both
    # forms; person 2: only a visit AFTER the index — no match.
    visits = spark.createDataFrame(
        [
            (1, 11, 9201, "2020-05-20 08:00:00"),
            (1, 12, 9202, "2020-05-20 08:00:00"),
            (2, 21, 9201, "2020-03-01 00:00:00"),
        ],
        "person_id: int, visit_occurrence_id: int, visit_concept_id: int,"
        " visit_start_datetime: string",
    ).withColumn("visit_start_datetime", F.to_timestamp("visit_start_datetime"))
    for form in ("merge", "rank1"):
        got = {
            r["cohort_member_id"]: (
                r["last_visit_occurrence_id"],
                r["days_since_last_visit"],
            )
            for r in index_visit_features(cohort, visits, form=form).collect()
        }
        assert got[101] == (12, 12), form
        assert got[102] == (None, None), form
    with pytest.raises(ValueError):
        index_visit_features(cohort, visits, form="nope")


def test_concurrent_visit_census_matches_bruteforce(spark):
    from datetime import datetime

    from cehrbert_data_spark.omop.visits import concurrent_visit_census

    rows = [
        # (id, start, end) — clusters that straddle the 1-week buckets
        (1, "2020-01-01 00:00:00", "2020-01-10 00:00:00"),
        (2, "2020-01-05 00:00:00", "2020-01-06 00:00:00"),
        (3, "2020-01-10 00:00:00", "2020-01-20 00:00:00"),  # touches 1 at end
        (4, "2020-02-01 00:00:00", "2020-02-02 00:00:00"),  # isolated
        (5, "2019-12-20 00:00:00", "2020-03-01 00:00:00"),  # spans many buckets
        (6, None, "2020-01-05 00:00:00"),                   # malformed: NULL start
        (7, "2020-01-09 00:00:00", "2020-01-02 00:00:00"),  # malformed: inverted
    ]
    visits = spark.createDataFrame(
        rows,
        "visit_occurrence_id: long, visit_start_datetime: string,"
        " visit_end_datetime: string",
    ).select(
        "visit_occurrence_id",
        F.to_timestamp("visit_start_datetime").alias("visit_start_datetime"),
        F.to_timestamp("visit_end_datetime").alias("visit_end_datetime"),
    )
    got = {
        r["visit_occurrence_id"]: r["n_concurrent"]
        for r in concurrent_visit_census(visits).collect()
    }

    def ts(s):
        return datetime.fromisoformat(s)

    ok = [(i, ts(s), ts(e)) for i, s, e in rows if s and e and ts(s) <= ts(e)]
    want = {i: 0 for i, *_ in rows}
    for i, s1, e1 in ok:
        want[i] = sum(
            1 for j, s2, e2 in ok if j != i and s1 <= e2 and s2 <= e1
        )
    assert got == want
    # inclusive-end touch and the malformed rows specifically
    assert got[3] >= 1 and got[6] == 0 and got[7] == 0


def test_concurrent_visit_census_date_only_abutting(spark):
    """Date-only schema: exclusive-next-day end bounds must NOT make
    merely-abutting visits concurrent (A's last day Jan 5, B starts Jan 6),
    while visits sharing a calendar day ARE concurrent."""
    from cehrbert_data_spark.omop.visits import concurrent_visit_census

    rows = [
        (1, "2020-01-01", "2020-01-05"),  # abuts 2, shares a day with 3
        (2, "2020-01-06", "2020-01-08"),  # abuts 1 only
        (3, "2020-01-05", "2020-01-05"),  # same-day overlap with 1
        (4, "2020-02-01", "2020-02-01"),  # isolated
    ]
    visits = spark.createDataFrame(
        rows,
        "visit_occurrence_id: long, visit_start_date: string,"
        " visit_end_date: string",
    ).select(
        "visit_occurrence_id",
        F.to_date("visit_start_date").alias("visit_start_date"),
        F.to_date("visit_end_date").alias("visit_end_date"),
    )
    got = {
        r["visit_occurrence_id"]: r["n_concurrent"]
        for r in concurrent_visit_census(visits).collect()
    }
    assert got == {1: 1, 2: 0, 3: 1, 4: 0}


def test_concurrent_visit_census_mixed_schema_final_second(spark):
    """Mixed date-only/datetime schema: a datetime visit starting inside
    the FINAL SECOND of a date-only visit's last day (23:59:59.5) shares
    that calendar day and must count as concurrent — the date-derived end
    is pulled back by one microsecond, not one second (round-8 ADVICE).
    A visit starting at exactly midnight of the NEXT day must not."""
    from cehrbert_data_spark.omop.visits import concurrent_visit_census

    rows = [
        (1, None, "2020-01-01", None, "2020-01-05"),  # date-only, last day Jan 5
        (2, "2020-01-05 23:59:59.5", None, "2020-01-06 04:00:00", None),  # inside final second
        (3, "2020-01-06 00:00:00", None, "2020-01-06 01:00:00", None),  # next-day midnight
    ]
    visits = spark.createDataFrame(
        rows,
        "visit_occurrence_id: long, visit_start_datetime: string,"
        " visit_start_date: string, visit_end_datetime: string,"
        " visit_end_date: string",
    ).select(
        "visit_occurrence_id",
        F.to_timestamp("visit_start_datetime").alias("visit_start_datetime"),
        F.to_date("visit_start_date").alias("visit_start_date"),
        F.to_timestamp("visit_end_datetime").alias("visit_end_datetime"),
        F.to_date("visit_end_date").alias("visit_end_date"),
    )
    got = {
        r["visit_occurrence_id"]: r["n_concurrent"]
        for r in concurrent_visit_census(visits).collect()
    }
    # 1↔2 concurrent (2 starts 23:59:59.5 on 1's last day); 2↔3 overlap as
    # real instants; 1↔3 merely abut at the day boundary.
    assert got == {1: 1, 2: 2, 3: 1}


@pytest.mark.skipif(not os.path.isdir(OMOP_SAMPLE), reason="sample OMOP absent")
@pytest.mark.slow
def test_extract_features_app_last_visit_feature(spark, tmp_path):
    """End-to-end: the app option surfaces the merge-form recency features,
    and they equal the rank-1 operator output member-for-member."""
    from feature_cohort import write_cohort_csv
    from cehrbert_data_spark.apps.extract_features import main
    from cehrbert_data_spark.omop.visits import index_visit_features

    csv_path = write_cohort_csv(str(tmp_path))
    out = main(
        cohort_path=csv_path,
        input_folder=OMOP_SAMPLE,
        output_folder=str(tmp_path / "out"),
        person_id_column="subject_id",
        index_date_column="prediction_time",
        label_column="outcome",
        use_sequence=False,  # frequency features: fast, same attachment path
        last_visit_feature="merge",
        spark=spark,
    )
    got = _by_member(spark.read.parquet(out))
    cohort, visits = _load_cohort_and_visits(spark, tmp_path)
    want = _by_member(index_visit_features(cohort, visits, form="rank1"))
    # app output keeps only members with features (inner join on features) —
    # every one it kept must carry the rank-1-identical recency columns
    assert got and all(want[k] == v for k, v in got.items())
