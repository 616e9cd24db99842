"""Bounded checksum duals for the megarow-output queries.

Five battery queries emit results proportional to the fact tables
(15–95M rows at the 1000× rung: a1_multi_agg, a2_hourly_mean,
a5_freq_filter, w1_latest_order, w7_sessionize), so the cross-engine gate
— which collects both sides — could not verify them past 100×. Each dual
here folds the query's FULL population into ONE row:

    n_rows  = COUNT(*)
    xor_h   = BIT_XOR(h)                     (order-independent)
    sum_h   = SUM(h) in DECIMAL(38,0)        (second independent fold)

with ``h`` the first 60 bits of md5 over a canonical serialization of
every output column (the same portable-hash discipline as
``operators.text.md5_long`` / the minhash oracles). A single wrong,
missing, or duplicated row flips both folds with probability
1 − 2⁻⁶⁰-ish, and the oracle compares one row at any SF — these duals run
in the 1000× sweep where their base queries cannot.

Canonical serialization (must be byte-identical across engines, so no
engine-formatted doubles/dates ever reach the hash):

* BIGINT/INT → decimal string (identical text in Spark and DuckDB);
* TIMESTAMP → epoch microseconds (``unix_micros`` / ``EPOCH_US``);
* DATE → days since 1970-01-01 (``datediff`` / ``DATEDIFF('day', ...)``);
* money/measure sums → the EXACT decimal accumulator scaled to BIGINT
  (sum · 10^scale), not the final double;
* NULL → the literal 'N' (CONCAT_WS would silently skip it).

For a1/a2 that last rule means the dual hashes the exact OPERANDS of the
published double (decimal sum, count) rather than the double itself: the
final decimal→double cast / division is a pure per-row function of those
operands and is pinned by the base query's own oracle at 1×/10×/100× —
the duals add the full-population evidence at the scales where the double
step's inputs could no longer be checked at all.

Per-group magnitudes do not grow with the key-shifted scaling (entities
replicate, per-entity history doesn't), so the scaled-BIGINT accumulators
(≤ ~1e11 per group) hold at every rung; SUM(h) over ≤ 10^8 groups stays
≤ ~10^26 ≪ 10^38.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.text import md5_long
from cehrbert_data_spark.queries.relational import (
    A5_SQL,
    W1_SQL,
    W7_SQL,
    a5_freq_filter,
    w1_latest_order,
    w7_sessionize,
)
from cehrbert_data_spark.sources.readers import read_table



def _micros(col: str) -> Column:
    """Epoch microseconds of a (NTZ) timestamp column. The parquet reader
    yields TIMESTAMP_NTZ; casting through TIMESTAMP under the session's
    pinned UTC zone makes this exactly DuckDB's EPOCH_US(naive ts)."""
    return F.unix_micros(F.col(col).cast("timestamp"))

def _fold(rows: DataFrame, canon: list[Column]) -> DataFrame:
    """COUNT + BIT_XOR + DECIMAL SUM over the 60-bit md5 of the canonical
    row serialization — the whole result in one row, order-independent."""
    parts = [F.coalesce(c.cast("string"), F.lit("N")) for c in canon]
    h = md5_long(F.concat_ws(",", *parts), 60)
    return rows.select(h.alias("h")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(h)").alias("xor_h"),
        F.sum(F.col("h").cast("decimal(38,0)")).cast("string").alias("sum_h"),
    )


def _fold_sql(base_sql: str, canon_exprs: list[str]) -> str:
    parts = ", ".join(
        f"COALESCE(CAST({e} AS VARCHAR), 'N')" for e in canon_exprs
    )
    return f"""
WITH base AS ({base_sql}),
canon AS (
  SELECT CAST(('0x' || SUBSTRING(md5(CONCAT_WS(',', {parts})), 1, 15)) AS BIGINT) AS h
  FROM base
)
SELECT COUNT(*) AS n_rows, BIT_XOR(h) AS xor_h,
       CAST(SUM(CAST(h AS DECIMAL(38,0))) AS VARCHAR) AS sum_h
FROM canon
"""


# --- cs_a1: full-population fold of the A1 multi-function hash agg -----------

def cs_a1_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    rows = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.min("o_orderdate").alias("first_order"),
        F.max("o_orderdate").alias("last_order"),
        F.sum(F.col("o_totalprice").cast("decimal(20,4)")).alias("sum_dec"),
    )
    return _fold(
        rows,
        [
            F.col("o_custkey"),
            F.col("n_orders"),
            F.col("n_statuses"),
            _micros("first_order"),
            _micros("last_order"),
            (F.col("sum_dec") * 10000).cast("long"),
        ],
    )


CS_A1_SQL = _fold_sql(
    """
SELECT o_custkey, COUNT(*) AS n_orders, COUNT(DISTINCT o_orderstatus) AS n_statuses,
       MIN(o_orderdate) AS first_order, MAX(o_orderdate) AS last_order,
       SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS sum_dec
FROM orders GROUP BY o_custkey
""",
    [
        "o_custkey",
        "n_orders",
        "n_statuses",
        "EPOCH_US(first_order)",
        "EPOCH_US(last_order)",
        "CAST(sum_dec * 10000 AS BIGINT)",
    ],
)


# --- cs_a2: full-population fold of the A2 hourly-mean agg -------------------

def cs_a2_hourly_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, sf_dir, "events")
    rows = events.groupBy(
        "user_id",
        F.to_date("ts").alias("bucket_date"),
        F.hour("ts").alias("bucket_hour"),
    ).agg(
        F.min("ts").alias("first_ts"),
        F.sum(F.col("value").cast("decimal(20,6)")).alias("sum_dec"),
        F.count("value").alias("n"),
    )
    return _fold(
        rows,
        [
            F.col("user_id"),
            F.datediff(F.col("bucket_date"), F.lit("1970-01-01")),
            F.col("bucket_hour"),
            _micros("first_ts"),
            (F.col("sum_dec") * 1000000).cast("long"),
            F.col("n"),
        ],
    )


CS_A2_SQL = _fold_sql(
    """
SELECT user_id, CAST(ts AS DATE) AS bucket_date, EXTRACT(HOUR FROM ts) AS bucket_hour,
       MIN(ts) AS first_ts,
       SUM(CAST(value AS DECIMAL(20,6))) AS sum_dec,
       COUNT(value) AS n
FROM events GROUP BY user_id, CAST(ts AS DATE), EXTRACT(HOUR FROM ts)
""",
    [
        "user_id",
        "DATEDIFF('day', DATE '1970-01-01', bucket_date)",
        "bucket_hour",
        "EPOCH_US(first_ts)",
        "CAST(sum_dec * 1000000 AS BIGINT)",
        "n",
    ],
)


# --- cs_a5 / cs_w1 / cs_w7: integer-only outputs fold directly ---------------

def cs_a5_freq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fold(
        a5_freq_filter(spark, sf_dir), [F.col("partkey"), F.col("freq")]
    )


CS_A5_SQL = _fold_sql(A5_SQL, ["partkey", "freq"])


def cs_w1_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fold(
        w1_latest_order(spark, sf_dir),
        [
            F.col("o_custkey"),
            F.col("o_orderkey"),
            _micros("o_orderdate"),
        ],
    )


CS_W1_SQL = _fold_sql(
    W1_SQL, ["o_custkey", "o_orderkey", "EPOCH_US(o_orderdate)"]
)


def cs_w7_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _fold(
        w7_sessionize(spark, sf_dir),
        [
            F.col("user_id"),
            F.col("session_id"),
            F.col("n_events"),
            _micros("session_start"),
            _micros("session_end"),
        ],
    )


CS_W7_SQL = _fold_sql(
    W7_SQL,
    [
        "user_id",
        "session_id",
        "n_events",
        "EPOCH_US(session_start)",
        "EPOCH_US(session_end)",
    ],
)


QUERIES = {
    "cs_a1_multi_agg": (cs_a1_multi_agg, CS_A1_SQL),
    "cs_a2_hourly_mean": (cs_a2_hourly_mean, CS_A2_SQL),
    "cs_a5_freq_filter": (cs_a5_freq_filter, CS_A5_SQL),
    "cs_w1_latest_order": (cs_w1_latest_order, CS_W1_SQL),
    "cs_w7_sessionize": (cs_w7_sessionize, CS_W7_SQL),
}
