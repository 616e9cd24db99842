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
#: query can silently carry changed code). All 57 stay declared and are
#: verified locally by tools/verify_oracle.py regardless of position.
#:
#: Round-4 tail: relational-battery queries green in BOTH r2 and r3 whose
#: module is untouched this round. Round 3's tail (t_quality, t_language,
#: d_exact_dedup, d_ngram_jaccard, sim_cosine_topk, sim_lsh_topk,
#: sim_ivf_topk) is back in the head for fresh verdicts.
_TAIL = [
    "j5_scalar_max",
    "a5_freq_filter",
    "p_filter_project",
    "j4_anti",
    "w2_dense_rank",
    "j3_semi",
    "o1_global_topk",
    "w10_sql_rownum",
    "seq_att_gap_tokens",
    "w5_first_and_span",
    "a8_stats",
    "j10_theta_datediff",
    "j2_left_outer",
    "j8_self_join",
    "u1_union",
    "u3_union_all",
    "u5_distinct",
    "a1_multi_agg",
    "f_scalar_string",
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
