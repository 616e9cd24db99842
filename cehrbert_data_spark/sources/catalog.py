"""Temp-view catalog for the templated-SQL surface (S9).

The reference registers every dependency as a global temp view so cohort
templates can reference them (reference: cohorts/spark_app_base.py:68-74) and
drops them on teardown (:244). Session-scoped views are the default here;
global views only when cross-session sharing is actually needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def register_views(views: dict[str, DataFrame], global_scope: bool = False) -> None:
    for name, df in views.items():
        if global_scope:
            df.createOrReplaceGlobalTempView(name)
        else:
            df.createOrReplaceTempView(name)


def drop_view(spark: SparkSession, name: str, global_scope: bool = False) -> None:
    if global_scope:
        spark.catalog.dropGlobalTempView(name)
    else:
        spark.catalog.dropTempView(name)
