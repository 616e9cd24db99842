"""ATT token bucketing vs the reference's Python semantics
(reference: decorators/patient_event_decorator_base.py:93-152)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cehrbert_data_spark.functions.temporal import (
    att_day_token,
    att_mix_token,
    att_month_token,
    att_token,
    att_token_sql,
    att_week_token,
    get_att_expr,
)

BOUNDARIES = [-8, -1, 0, 1, 6, 7, 8, 27, 28, 29, 30, 31, 90, 359, 360, 361, 1079, 1080, 2000]


def _ref_cehr_bert(d):
    if d is None:
        return None
    if d < 0:
        return "W-1"
    if d < 28:
        return f"W{math.floor(d / 7)}"
    if d < 360:
        return f"M{math.floor(d / 30)}"
    return "LT"


def _ref_day(d):
    if d is None:
        return None
    return f"D{d}" if d < 1080 else "LT"


def _ref_week(d):
    if d is None:
        return None
    return f"W{math.floor(d / 7)}" if d < 1080 else "LT"


def _ref_month(d):
    if d is None:
        return None
    return f"M{math.floor(d / 30)}" if d < 1080 else "LT"


def _ref_mix(d):
    if d is None:
        return None
    if d <= 7:
        return f"D{d}"
    if d <= 30:
        return f"W{math.ceil(d / 7)}"
    if d <= 360:
        return f"M{math.ceil(d / 30)}"
    return "LT"


def _run(spark, expr_fn):
    df = spark.createDataFrame([(d,) for d in BOUNDARIES] + [(None,)], "d: int")
    return {r["d"]: r["tok"] for r in df.select("d", expr_fn(F.col("d")).alias("tok")).collect()}


def test_att_token(spark):
    got = _run(spark, att_token)
    for d in BOUNDARIES:
        assert got[d] == _ref_cehr_bert(d), d
    assert got[None] is None


def test_att_day_token(spark):
    got = _run(spark, att_day_token)
    for d in BOUNDARIES:
        assert got[d] == _ref_day(d), d


def test_att_week_token(spark):
    got = _run(spark, att_week_token)
    for d in BOUNDARIES:
        assert got[d] == _ref_week(d), d


def test_att_month_token(spark):
    got = _run(spark, att_month_token)
    for d in BOUNDARIES:
        assert got[d] == _ref_month(d), d


def test_att_mix_token(spark):
    got = _run(spark, att_mix_token)
    for d in BOUNDARIES:
        assert got[d] == _ref_mix(d), d


def test_dispatch_and_sql_rendering(spark):
    assert get_att_expr("cehr_bert") is att_token
    df = spark.createDataFrame([(d,) for d in BOUNDARIES], "d: int")
    got = {
        r["d"]: r["tok"]
        for r in df.selectExpr("d", att_token_sql("d") + " AS tok").collect()
    }
    for d in BOUNDARIES:
        assert got[d] == _ref_cehr_bert(d), d
