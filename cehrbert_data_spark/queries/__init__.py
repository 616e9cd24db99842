"""Declared query battery: one entry per implemented operator (SURVEY.md §2).

Each module exposes ``QUERIES: dict[name, (spark_fn, oracle_sql | None)]``
where ``spark_fn(spark, sf_dir) -> DataFrame`` and ``oracle_sql`` is the
ANSI-SQL equivalent DuckDB runs on the same parquet for the correctness gate.

Cross-engine exactness discipline (why results hash-match bit-for-bit):
  * money-like sums go through DECIMAL casts (order-independent);
  * ratios divide two exact quantities as doubles (same operands → same IEEE
    result in both engines);
  * float vectors are quantized to integers before dot products;
  * every rank/order uses a total (tie-broken) ordering.
"""

from __future__ import annotations

from cehrbert_data_spark.queries import relational, sequences, graph, llm, clinical


def all_queries():
    merged = {}
    for mod in (relational, sequences, graph, llm, clinical):
        for name, (fn, _) in mod.QUERIES.items():
            merged[name] = fn
    return merged


def all_oracles():
    merged = {}
    for mod in (relational, sequences, graph, llm, clinical):
        for name, (_, sql) in mod.QUERIES.items():
            if sql is not None:
                merged[name] = sql
    return merged
