from __future__ import annotations

import math

from pyspark.sql import functions as F

from cehrbert_data_spark.operators.similarity import cosine_topk, mmr_rerank


def _brute_mmr(vecs, query_ids, k, pool, lam, mu):
    """Independent reference: quantized int dots, greedy argmax, id ties."""
    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    n2 = {i: sum(x * x for x in v) for i, v in q.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(q[a], q[b]))
        return float(d) / (math.sqrt(n2[a]) * math.sqrt(n2[b]))

    out = []
    for qi in query_ids:
        cands = sorted(
            ((cos(qi, i), i) for i in vecs if i != qi),
            key=lambda t: (-t[0], t[1]),
        )[:pool]
        rel = {i: c for c, i in cands}
        remaining = sorted(rel)
        sel = []
        while remaining and len(sel) < k:
            best, best_s = None, None
            for i in remaining:
                ms = max((cos(i, j) for j in sel), default=0.0)
                s = lam * rel[i] - mu * ms
                if best_s is None or s > best_s:
                    best, best_s = i, s
            sel.append(best)
            remaining.remove(best)
            out.append((qi, best, len(sel), rel[best], best_s))
    return out


def test_mmr_diversifies_and_matches_reference(spark):
    # d1 and d2 are exact duplicates closest to the query (sim=1, so the
    # dup penalty is maximal); d3 mirrors d1 across the query axis — same
    # relevance, low mutual sim. Plain top-2 takes (d1, d2) by id
    # tie-break; MMR must take (d1, d3).
    vecs = {
        0: [1.0, 0.0, 0.0],   # query
        1: [0.9, 0.436, 0.0],
        2: [0.9, 0.436, 0.0],
        3: [0.9, -0.436, 0.0],
        4: [0.0, 0.1, 0.995],
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id: long, embedding: array<float>",
    )
    queries = df.where(F.col("vec_id") == 0)

    plain = [
        r["n_id"]
        for r in cosine_topk(df, queries, "vec_id", "embedding", k=2)
        .orderBy("rank")
        .collect()
    ]
    assert plain == [1, 2]

    got = {
        (r["q_id"], r["mmr_rank"]): (r["n_id"], r["relevance"], r["mmr_score"])
        for r in mmr_rerank(
            df, queries, "vec_id", "embedding", k=2, pool=4, lam=0.5, mu=0.5
        ).collect()
    }
    assert [got[(0, 1)][0], got[(0, 2)][0]] == [1, 3]

    ref = _brute_mmr(vecs, [0], k=2, pool=4, lam=0.5, mu=0.5)
    for qi, nid, rk, rel, score in ref:
        g_nid, g_rel, g_score = got[(qi, rk)]
        assert g_nid == nid
        assert g_rel == rel and g_score == score  # bit-exact


def test_mmr_pool_smaller_than_k(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.5, 0.5])],
        "vec_id: long, embedding: array<float>",
    )
    queries = df.where(F.col("vec_id") == 0)
    rows = mmr_rerank(df, queries, "vec_id", "embedding", k=5, pool=2).collect()
    assert sorted(r["mmr_rank"] for r in rows) == [1, 2]
