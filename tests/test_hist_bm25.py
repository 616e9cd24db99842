"""Differential tests for histogram_quantile and bm25_topk vs pure-Python
brute force (same integer arithmetic, independent implementation)."""

from __future__ import annotations

import math
import random
from collections import Counter

from cehrbert_data_spark.operators.aggregations import histogram_quantile
from cehrbert_data_spark.operators.text import bm25_topk


def _brute_hist_q(vals, q_num, q_den, width):
    counts = Counter(math.floor(v / width) for v in vals)
    total = len(vals)
    cum = 0
    for b in sorted(counts):
        cum += counts[b]
        if cum * q_den >= total * q_num:
            return b, total
    raise AssertionError("unreachable for non-empty vals")


def test_histogram_quantile_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        ("g%d" % (i % 3), rng.uniform(-40.0, 200.0)) for i in range(3000)
    ]
    df = spark.createDataFrame(rows, "grp string, value double")
    for q_num, q_den in [(1, 2), (9, 10), (1, 100)]:
        got = {
            r["grp"]: (r["q_bin"], r["n_rows"], r["q_lo"])
            for r in histogram_quantile(
                df, ["grp"], "value", q_num, q_den, bin_width=7.5
            ).collect()
        }
        for g in ("g0", "g1", "g2"):
            vals = [v for k, v in rows if k == g]
            b, total = _brute_hist_q(vals, q_num, q_den, 7.5)
            assert got[g] == (b, total, b * 7.5), (g, q_num, q_den)


def test_histogram_quantile_bin_contains_true_quantile(spark):
    """The selected bin is exactly the bin of the ceil(q*n)-th smallest
    value — i.e. answer error is bounded by one bin width."""
    rng = random.Random(11)
    vals = [rng.uniform(0, 500) for _ in range(999)]
    df = spark.createDataFrame([("a", v) for v in vals], "grp string, value double")
    q_num, q_den, width = 9, 10, 5.0
    row = histogram_quantile(df, ["grp"], "value", q_num, q_den, width).collect()[0]
    target = -(-q_num * len(vals) // q_den)  # ceil
    true_q = sorted(vals)[target - 1]
    assert row["q_bin"] == math.floor(true_q / width)
    assert row["q_lo"] <= true_q < row["q_lo"] + width


WORDS = ["spark", "hash", "merge", "window", "scan", "row", "agg", "the", "a"]


def _brute_bm25(docs, qterms, k, idf_scale=1024, tf_scale=1024):
    toks = {i: t.lower().split() for i, t in docs}
    dl = {i: len(ts) for i, ts in toks.items()}
    n_docs = len(docs)
    total_len = sum(dl.values())
    tf = {
        (i, t): c
        for i, ts in toks.items()
        for t, c in Counter(w for w in ts if w in qterms).items()
    }
    df_t = Counter(t for (_, t) in tf)
    scores: dict[int, list[int]] = {}
    for (i, t), f in tf.items():
        idf_q = ((n_docs * idf_scale) // df_t[t]).bit_length() - 1
        num = f * (6 + 5) * 4 * total_len
        den = 5 * 4 * total_len * f + 6 * (4 - 3) * total_len + 6 * 3 * dl[i] * n_docs
        scores.setdefault(i, []).append(idf_q * ((num * tf_scale) // den))
    ranked = sorted(
        ((i, sum(s), len(s), dl[i]) for i, s in scores.items()),
        key=lambda r: (-r[1], r[0]),
    )[:k]
    return [(i, d, s, n) for i, s, n, d in ranked]


def _rand_docs(seed, n=60):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choices(WORDS, k=rng.randrange(5, 40))))
        for i in range(n)
    ]


def test_bm25_matches_bruteforce(spark):
    docs = _rand_docs(3)
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    qterms = ["spark", "hash", "merge", "window"]
    got = [
        (r["doc_id"], r["dl"], r["score_scaled"], r["n_hit_terms"])
        for r in bm25_topk(df, "doc_id", "text", qterms, k=8).collect()
    ]
    assert got == _brute_bm25(docs, set(qterms), 8)


def test_bm25_precomputed_totals_identical(spark):
    from pyspark.sql import functions as F

    docs = _rand_docs(5)
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    qterms = ["spark", "window"]
    totals = spark.createDataFrame(
        [(len(docs), sum(len(t.split()) for _, t in docs))],
        "n_docs: long, total_len: long",
    )
    base = bm25_topk(df, "doc_id", "text", qterms, k=10).collect()
    pre = bm25_topk(
        df, "doc_id", "text", qterms, k=10, corpus_totals=totals
    ).collect()
    assert base == pre


def test_bm25_term_stuffed_doc_ranks_first(spark):
    docs = [
        (1, "spark hash merge window spark hash merge window"),
        (2, "the a the a the a the a"),
        (3, "spark the a the a the a"),
    ]
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    out = bm25_topk(df, "doc_id", "text", ["spark", "hash", "merge", "window"], k=3)
    rows = out.collect()
    assert rows[0]["doc_id"] == 1 and rows[0]["n_hit_terms"] == 4
    assert [r["doc_id"] for r in rows] == [1, 3]  # doc 2 has no hits
