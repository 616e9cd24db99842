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
#: query can silently carry changed code). All 115 stay declared and are
#: verified locally by tools/verify_oracle.py regardless of position.
#:
#: Round-6 tail (65 of 115): queries that are DRIVER-GREEN in round 5
#: (CORRECTNESS_r05) and whose code paths round 6 does not touch. Round 5's
#: entire 22-query tail is back in the head for fresh verdicts, as are all
#: round-6-touched queries (j7b_asof_union null-ts/tiebreak rework,
#: j6b_overlap_buckets malformed-interval guard, the d_minhash_lsh planning
#: work, and the new mm_media_decode / t_repetition / t_contamination /
#: d_dup_ngram_rate / sim_pq_topk / t_domain_mix / t_vocab_coverage /
#: sim_mmr_rerank). d_simhash, k_salted_count, t_stratified_sample,
#: w7_sessionize, seq_att_gap_tokens and seq_user_sequence yielded their
#: head slots to the round-6-new queries (all six are r5-driver-green and
#: untouched this round; seq_user_sequence is additionally smoke-checked
#: every round as the entry() flagship). t_pack_chunks, t_word_rarity and
#: mm_image_dims (all r5-driver-green, code paths untouched) yielded their
#: head slots to the late round-6 adds a12_hll_distinct / t_dsir_sample /
#: t_tfidf_topk; d_embed_neardup and d_embed_neardup_exact (r5-driver-green,
#: operator untouched this round) yielded theirs to a13_bloom_probe /
#: a14_cms_freq, and d_dedup_groups (r5-driver-green, connected_components
#: untouched) to a15_kmv_jaccard. sim_cosine_topk, sim_lsh_buckets,
#: mm_av_meta and r1_transitive_closure (the last four r5-driver-green head
#: queries whose code paths round 6 does not touch; r1 additionally runs
#: every round in bench + property tests) yielded theirs to the final adds
#: a16_rollup / p10_pivot / a17_hist_quantile / t_bm25_topk. f_json_extract
#: / t_lm_surprisal / w12_ntile_dist / w13_gap_fill / a18_corr_regr /
#: a19_cube / p11_unpivot / w14_sliding_window / w15_streaks / w16_interval_union / t_ccnet_bucket / a20_exact_median / d_dedup_summary / r3_pagerank / w17_event_funnel / a21_retention / p12_zorder_key / a22_mad / a23_exact_p90 / t_word_entropy / u7_multiset_ops /
#: t_quality_funnel are brand-new but tail-listed (head is at capacity
#: with queries needing fresh verdicts for round-6-touched code) — locally
#: verified at three SFs this round; promote them for their first driver
#: verdicts next round.
_TAIL = [
    "a18_corr_regr",
    "a19_cube",
    "p11_unpivot",
    "w14_sliding_window",
    "w15_streaks",
    "w16_interval_union",
    "t_quality_funnel",
    "t_ccnet_bucket",
    "a20_exact_median",
    "d_dedup_summary",
    "r3_pagerank",
    "w17_event_funnel",
    "a21_retention",
    "p12_zorder_key",
    "a22_mad",
    "a23_exact_p90",
    "t_word_entropy",
    "u7_multiset_ops",
    "f_json_extract",
    "t_lm_surprisal",
    "w12_ntile_dist",
    "w13_gap_fill",
    "sim_cosine_topk",
    "sim_lsh_buckets",
    "mm_av_meta",
    "r1_transitive_closure",
    "d_dedup_groups",
    "d_embed_neardup",
    "d_embed_neardup_exact",
    "t_pack_chunks",
    "t_word_rarity",
    "mm_image_dims",
    "d_simhash",
    "k_salted_count",
    "t_stratified_sample",
    "w7_sessionize",
    "seq_att_gap_tokens",
    "seq_user_sequence",
    "p_filter_project",
    "j2_left_outer",
    "j3_semi",
    "j4_anti",
    "j5_scalar_max",
    "j8_self_join",
    "j10_theta_datediff",
    "a1_multi_agg",
    "o1_global_topk",
    "u3_union_all",
    "w10_sql_rownum",
    "a5_freq_filter",
    "a8_stats",
    "w2_dense_rank",
    "w5_first_and_span",
    "w11_trailing_range",
    "u1_union",
    "u5_distinct",
    "f_scalar_datetime",
    "f_scalar_string",
    "c_label_cohort",
    "t_language",
    "t_clean_text",
    "st_session_batch",
    "st_asof_batch",
    "mm_media_meta",
    "e_dim_stats",
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
