from __future__ import annotations

from pyspark.sql import functions as F

from cehrbert_data_spark.operators.skew import salted_count, salted_join


def test_salted_join_matches_plain_join(spark):
    left = spark.createDataFrame(
        [(1, i) for i in range(200)] + [(2, 0), (3, 1)], "k: int, v: int"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "a"), (9, "x")], "k: int, tag: string")
    plain = {(r["k"], r["v"], r["tag"]) for r in left.join(right, "k").collect()}
    salted = {(r["k"], r["v"], r["tag"]) for r in salted_join(left, right, "k").collect()}
    assert salted == plain and len(plain) == 201


def test_salted_count_matches_plain_count(spark):
    df = spark.createDataFrame([("hot",)] * 500 + [("cold",)], "k: string")
    plain = {(r["k"], r["count"]) for r in df.groupBy("k").count().collect()}
    salted = {(r["k"], r["count"]) for r in salted_count(df, ["k"]).collect()}
    assert salted == plain == {("hot", 500), ("cold", 1)}
