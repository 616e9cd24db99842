"""Graph / iterative queries: transitive closure (SURVEY.md §2.11 R1/R2).

The reference walks 'Subsumes' edges of ``concept_relationship`` by frontier
BFS (utils/vocab_utils.py:4-64). Here the same operator runs over a synthetic
binary-tree DAG derived from the customer keys, so DuckDB can verify it with
a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.closure import transitive_closure
from cehrbert_data_spark.sources.readers import read_table

_MAX_KEY = 200


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-tree edges k -> 2k, 2k+1 over custkeys <= _MAX_KEY."""
    cust = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    ).where(F.col("k") <= _MAX_KEY)
    left = cust.select(F.col("k").alias("src"), (F.col("k") * 2).alias("dst"))
    right = cust.select(F.col("k").alias("src"), (F.col("k") * 2 + 1).alias("dst"))
    # dst > src also drops the 0 -> 0 self-loop (custkeys start at 0), which
    # would make the oracle's recursive CTE non-terminating (distance grows
    # without bound on a cycle).
    return left.unionByName(right).where(
        (F.col("dst") <= _MAX_KEY) & (F.col("dst") > F.col("src"))
    )


def r1_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transitive_closure(_edges(spark, sf_dir), "src", "dst")


R1_SQL = f"""
WITH RECURSIVE
edges AS (
  SELECT src, dst FROM (
    SELECT c_custkey AS src, c_custkey * 2 AS dst FROM customer WHERE c_custkey <= {_MAX_KEY}
    UNION ALL
    SELECT c_custkey AS src, c_custkey * 2 + 1 AS dst FROM customer WHERE c_custkey <= {_MAX_KEY}
  ) WHERE dst <= {_MAX_KEY} AND dst > src
),
closure(src, dst, distance) AS (
  SELECT src, dst, 1 AS distance FROM edges
  UNION
  SELECT c.src, e.dst, c.distance + 1
  FROM closure c JOIN edges e ON c.dst = e.src
)
SELECT src, dst, distance FROM closure
"""


QUERIES = {
    "r1_transitive_closure": (r1_transitive_closure, R1_SQL),
}
