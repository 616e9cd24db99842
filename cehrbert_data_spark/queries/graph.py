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
    """Binary-tree edges k -> 2k, 2k+1 over custkeys <= _MAX_KEY.

    Expression strings (r11 RPC pass 4): identical analyzed trees to the
    Column form at a fraction of the Py4J build chatter — this builder runs
    inside r1's driver loop wall time.
    """
    cust = (
        read_table(spark, sf_dir, "customer")
        .selectExpr("c_custkey AS k")
        .where(f"k <= {_MAX_KEY}")
    )
    left = cust.selectExpr("k AS src", "k * 2 AS dst")
    right = cust.selectExpr("k AS src", "k * 2 + 1 AS dst")
    # dst > src also drops the 0 -> 0 self-loop (custkeys start at 0), which
    # would make the oracle's recursive CTE non-terminating (distance grows
    # without bound on a cycle).
    return left.unionByName(right).where(
        f"dst <= {_MAX_KEY} AND dst > src"
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


def r3_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer fixed-point PageRank (operators/closure.py:pagerank) over the
    customer↔supplier trade graph: one edge per distinct (customer,
    supplier) pair weighted by lineitem count, symmetrized so mass flows
    both ways; customers live at node 2k, suppliers at 2k+1 (disjoint id
    spaces). 3 fixed iterations — the plan is a static join tree the
    oracle unrolls as CTEs."""
    from cehrbert_data_spark.operators.closure import pagerank

    return pagerank(
        trade_edges(spark, sf_dir), "src", "dst", weight="w", iters=3
    )


def trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The customer↔supplier trade graph r3_pagerank runs on — exposed so
    tools/pagerank_gate.py gates the SAME graph at the billion-edge rung
    (any drift between the gate's graph and the query's graph would void
    the replica-consistency evidence)."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            (F.col("o_custkey") * 2).alias("a"),
            (F.col("l_suppkey") * 2 + 1).alias("b"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )


def _pagerank_sql(iters: int = 3, scale: int = 1_000_000,
                  damp_num: int = 85, damp_den: int = 100) -> str:
    # Every CTE is MATERIALIZED: DuckDB inlines single-reference CTEs, and
    # inlining the r{t-1} -> c{t} chain re-derives the edge join per
    # iteration — 4x slower at 10x and a >70 GB disk spill at 30x+.
    # Materialization pins each iteration's state once, exactly like the
    # Spark side's checkpoint_barrier (identical results, verified).
    base = scale * (damp_den - damp_num) // damp_den
    ctes = [f"""
pairs AS MATERIALIZED (
  SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b, COUNT(*) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT a AS src, b AS dst, w FROM pairs
  UNION ALL
  SELECT b AS src, a AS dst, w FROM pairs
),
outw AS MATERIALIZED (SELECT src, SUM(w) AS outw FROM edges GROUP BY src),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
r0 AS MATERIALIZED (SELECT node, CAST({scale} AS BIGINT) AS r FROM nodes)"""]
    for t in range(1, iters + 1):
        ctes.append(f"""
c{t} AS MATERIALIZED (
  SELECT e.dst, SUM((r.r * e.w) // o.outw) AS s
  FROM edges e JOIN r{t-1} r ON e.src = r.node JOIN outw o ON e.src = o.src
  GROUP BY e.dst
),
r{t} AS MATERIALIZED (
  SELECT n.node,
         CAST({base} + ({damp_num} * COALESCE(c.s, 0)) // {damp_den} AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{t} c ON n.node = c.dst
)""")
    return (
        "WITH " + ",".join(ctes)
        + f"\nSELECT node, r AS rank_scaled FROM r{iters}"
    )


R3_SQL = _pagerank_sql()


QUERIES = {
    "r1_transitive_closure": (r1_transitive_closure, R1_SQL),
    "r3_pagerank": (r3_pagerank, R3_SQL),
}
