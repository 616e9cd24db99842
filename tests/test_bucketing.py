"""Bucketed-write layout: the 100 TB claim is that person_id-bucketed
tables join with NO shuffle — assert it on the physical plan, not by
folklore."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.sources.writers import read_bucketed, write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    """Force a shuffle-eligible join so the assertion is about bucketing,
    not about the broadcast threshold hiding the exchange."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _plan(df) -> str:
    return df.sparkSession._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_bucketed_join_no_shuffle(spark, tmp_path, no_broadcast):
    people = spark.range(0, 1000).select(
        F.col("id").alias("person_id"), (F.col("id") % 7).alias("grp")
    )
    events = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("person_id"), F.col("id").alias("event_id")
    )
    write_bucketed(people, "b_people", "person_id", 8, path=str(tmp_path / "p"))
    write_bucketed(
        events, "b_events", "person_id", 8, sort_cols=["person_id"], path=str(tmp_path / "e")
    )
    try:
        joined = read_bucketed(spark, "b_people").join(
            read_bucketed(spark, "b_events"), "person_id"
        )
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p  # the whole point of the layout
        assert joined.count() == 5000

        # and a bucket-key aggregation needs no exchange either
        agg = read_bucketed(spark, "b_events").groupBy("person_id").count()
        assert "Exchange" not in _plan(agg)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_people")
        spark.sql("DROP TABLE IF EXISTS b_events")


def test_unbucketed_join_shuffles(spark, tmp_path, no_broadcast):
    """Control: the same join over plain parquet DOES exchange — proves the
    assertion above is detecting bucketing, not something else."""
    people = spark.range(0, 1000).select(F.col("id").alias("person_id"))
    events = spark.range(0, 5000).select((F.col("id") % 1000).alias("person_id"))
    people.write.parquet(str(tmp_path / "pp"))
    events.write.parquet(str(tmp_path / "ee"))
    joined = spark.read.parquet(str(tmp_path / "pp")).join(
        spark.read.parquet(str(tmp_path / "ee")), "person_id"
    )
    assert "Exchange" in _plan(joined)
