"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (per-patient/user sequence assembly
— the reference's core capability) on sf0.001. ``queries()`` /
``oracle_sql()`` expose the full operator battery declared in
``cehrbert_data_spark.queries`` (one entry per implemented operator from
SURVEY.md §2, plus the LLM-pipeline operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cehrbert_data_spark.queries import all_oracles, all_queries
from cehrbert_data_spark.queries.sequences import seq_user_sequence


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return seq_user_sequence(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query."""
    return all_oracles()
