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

#: Declaration order matters: the driver's correctness harness checks the
#: first 50 registry entries only, so queries that already have repeated
#: green driver verdicts on record yield their slots to ones that haven't
#: been checked recently. The tail ROTATES each round so no query goes two
#: consecutive rounds without a driver verdict (round-3 lesson: a demoted
#: query can silently carry changed code). All 72 stay declared and are
#: verified locally by tools/verify_oracle.py regardless of position.
#:
#: Round-5 tail (20 of 70): queries that are DRIVER-GREEN in round 4
#: (CORRECTNESS_r04) and whose code paths round 5 did not touch. Round 4's
#: entire 19-query tail is back in the head for fresh verdicts, as are all
#: round-5-touched queries (j4_anti / u1_union / u3_union_all rewrites,
#: st_asof_batch tie fix, the dedup shingle/components changes, the closure
#: loop, every mm_* query incl. the new mm_av_meta).
_TAIL = [
    "q1_pricing_summary",
    "j1_equi_inner",
    "j6_interval_join",
    "j7_asof_join",
    "a2_hourly_mean",
    "a10_span_agg",
    "a6_conditional_agg",
    "a7_winsorize",
    "w1_latest_order",
    "w4_days_since_prev",
    "w3_rank_with_gaps",
    "w6_partition_max",
    "w9_count_over",
    "a3_count_per_group",
    "a9_groupby_max",
    "j9_exists",
    "j9_not_exists",
    "d9_lab_prevalence",
    "t_fingerprint",
    "t_tokens",
    # demoted when j7b_asof_union / j6b_overlap_buckets joined the head
    # mid-round-5 (both r4-DRIVER-green and their code paths untouched
    # since; o1_global_topk was NOT eligible — it sat in the r4 tail)
    "t_quality",
    "d_exact_dedup",
]


def _merged():
    merged = {}
    for mod in (relational, sequences, graph, clinical, llm):
        for name, pair in mod.QUERIES.items():
            merged[name] = pair
    head = {k: v for k, v in merged.items() if k not in _TAIL}
    head.update({k: merged[k] for k in _TAIL})
    return head


def all_queries():
    return {name: fn for name, (fn, _) in _merged().items()}


def all_oracles():
    return {name: sql for name, (_, sql) in _merged().items() if sql is not None}
