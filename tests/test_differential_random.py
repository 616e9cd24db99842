"""Seeded randomized differential tests: the operators' distributed
implementations vs an independent pure-Python brute force on the same
randomly generated inputs.

The oracle battery (tools/verify_oracle.py) checks each operator against a
hand-written DuckDB query on the fixed testdata tables; these tests attack
from the other side — adversarial random inputs (duplicate keys, timestamp
ties, NULLs, malformed intervals, multi-bucket spans) where a hand-written
SQL oracle might share the Spark query's blind spot.  The brute force is
deliberately naive (nested loops over collected rows) so it cannot share a
bug with the windowed / bucketed / propagated distributed forms.

Reference parity: the as-of / interval semantics under test are the ones
the reference exercises in its cohort join tests
(reference tests/unit_tests: prior-observation lookup, visit-span overlap);
the keeper-resolution test mirrors the transitive-group collapse every
dedup pipeline needs.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.joins import (
    asof_join,
    asof_join_union,
    interval_join,
    overlap_join_buckets,
)
from cehrbert_data_spark.operators.dedup import connected_components, dedup_keepers

SEEDS = [7, 41, 1234]


def _asof_expected(lrows, rrows, how):
    """Naive at-or-before match: winner = max rts, ties -> max r_id."""
    out = {}
    for key, lts, l_id in lrows:
        if lts is None:
            if how == "left":
                out[l_id] = None
            continue
        cands = [r for r in rrows if r[0] == key and r[1] is not None and r[1] <= lts]
        if not cands:
            if how == "left":
                out[l_id] = None
            continue
        out[l_id] = max(cands, key=lambda r: (r[1], r[2]))[2]
    return out


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.slow
def test_asof_union_and_rank1_forms_agree_with_bruteforce(spark, seed, how):
    rng = random.Random(seed)
    # duplicate keys, heavy (key, ts) ties, ~8% NULL timestamps
    lrows = [
        (rng.randrange(8), None if rng.random() < 0.08 else rng.randrange(25), i)
        for i in range(120)
    ]
    rrows = [
        (rng.randrange(8), None if rng.random() < 0.08 else rng.randrange(25), i)
        for i in range(120)
    ]
    left = spark.createDataFrame(lrows, "key: int, lts: int, l_id: int")
    right = spark.createDataFrame(rrows, "key: int, rts: int, r_id: int")

    expected = _asof_expected(lrows, rrows, how)

    got_union = {
        r["l_id"]: r["r_id"]
        for r in asof_join_union(
            left, right, "key", "lts", "rts", how=how, tiebreak="r_id"
        ).collect()
    }
    assert got_union == expected, f"asof_join_union vs brute force (seed={seed})"

    # salted (time-bucket segmented) merge form: identical semantics, the
    # bucket only re-shapes the physical window; tiny bucket (7 "seconds")
    # forces many cross-bucket carry-ins over the 0-24 ts range
    got_salted = {
        r["l_id"]: r["r_id"]
        for r in asof_join_union(
            left, right, "key", "lts", "rts", how=how, tiebreak="r_id",
            salt_bucket_seconds=7,
        ).collect()
    }
    assert got_salted == expected, f"salted asof_join_union (seed={seed})"

    # rank-1 windowed form, same semantics: unbounded lookback, latest-then-
    # max-r_id wins.  NULL-ts rows never satisfy BETWEEN, matching the union
    # form's guard.
    got_rank1 = {
        r["l_id"]: r["r_id"]
        for r in asof_join(
            left,
            right,
            "key",
            point=F.col("lts"),
            lower=F.col("rts"),
            upper=F.lit(10**9),
            metric=[F.col("rts").desc(), F.col("r_id").desc()],
            left_key="l_id",
            how=how,
        )
        # interval_join's how='left' keeps NULL-lts lefts too; normalize
        .collect()
    }
    # the rank-1 form ranks over left PK, so how='left' unmatched rows carry
    # NULL r_id — same dict shape as the union form
    assert got_rank1 == expected, f"asof_join rank-1 vs brute force (seed={seed})"


@pytest.mark.parametrize("seed", SEEDS)
def test_interval_join_vs_bruteforce(spark, seed):
    rng = random.Random(seed)
    lrows = [(rng.randrange(6), rng.randrange(40), i) for i in range(100)]
    rrows = []
    for i in range(80):
        lo = rng.randrange(40)
        rrows.append((rng.randrange(6), lo, lo + rng.randrange(8), i))
    left = spark.createDataFrame(lrows, "key: int, pt: int, l_id: int")
    right = spark.createDataFrame(rrows, "key: int, lo: int, hi: int, r_id: int")

    expected = {
        (l[2], r[3])
        for l in lrows
        for r in rrows
        if l[0] == r[0] and r[1] <= l[1] <= r[2]
    }
    got = {
        (r["l_id"], r["r_id"])
        for r in interval_join(
            left, right, "key", F.col("pt"), F.col("lo"), F.col("hi")
        ).collect()
    }
    assert got == expected


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("bucket_seconds", [3600, 6 * 3600, 48 * 3600])
def test_overlap_buckets_vs_bruteforce(spark, seed, bucket_seconds):
    """Exactly-once pair emission must hold whether intervals span 1 bucket
    or dozens; malformed (end < start) and NULL intervals never join."""
    rng = random.Random(seed)
    base = datetime(2024, 3, 1)

    def mk(n):
        rows = []
        for i in range(n):
            if rng.random() < 0.06:
                rows.append((None, None, i))
                continue
            s = base + timedelta(hours=rng.randrange(200))
            if rng.random() < 0.06:  # malformed: end precedes start
                rows.append((s, s - timedelta(hours=1 + rng.randrange(5)), i))
            else:
                rows.append((s, s + timedelta(hours=rng.randrange(72)), i))
        return rows

    lrows, rrows = mk(60), mk(60)
    left = spark.createDataFrame(lrows, "ls: timestamp, le: timestamp, l_id: int")
    right = spark.createDataFrame(rrows, "rs: timestamp, re: timestamp, r_id: int")

    def ok(row):
        return row[0] is not None and row[1] is not None and row[0] <= row[1]

    expected = {
        (l[2], r[2])
        for l in lrows
        if ok(l)
        for r in rrows
        if ok(r) and l[0] <= r[1] and r[0] <= l[1]
    }
    got = [
        (r["l_id"], r["r_id"])
        for r in overlap_join_buckets(
            left, right, "ls", "le", "rs", "re", bucket_seconds=bucket_seconds
        ).collect()
    ]
    assert len(got) == len(set(got)), "pair emitted more than once"
    assert set(got) == expected


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.slow
def test_connected_components_vs_unionfind(spark, seed):
    rng = random.Random(seed)
    n = 200
    # sparse random graph -> many small components plus a few long chains
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(120)]
    edges += [(i, i + 1) for i in range(0, 30)]  # one deep chain
    pairs = spark.createDataFrame(edges, "id_a: int, id_b: int")

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    expected = {v: find(v) for v in touched}
    # find() roots are not guaranteed minimal per component under path
    # compression order; normalize to component-min
    comp_min = {}
    for v, r in expected.items():
        comp_min[r] = min(comp_min.get(r, v), v)
    expected = {v: comp_min[r] for v, r in expected.items()}

    got = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert got == expected

    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id: int")
    keepers = {r["id"]: r["keeper"] for r in dedup_keepers(docs, pairs).collect()}
    for v in range(n):
        assert keepers[v] == expected.get(v, v)


def _mmr_expected(vecs, query_ids, k, pool, lam, mu):
    """Naive MMR: quantized int dots, greedy argmax, smallest-id ties."""
    import math

    q = {i: [round(x * 1000) for x in v] for i, v in vecs.items()}
    n2 = {i: sum(x * x for x in v) for i, v in q.items()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(q[a], q[b]))
        return float(d) / (math.sqrt(n2[a]) * math.sqrt(n2[b]))

    out = []
    for qi in query_ids:
        cands = sorted(
            ((cos(qi, i), i) for i in vecs if i != qi), key=lambda t: (-t[0], t[1])
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
            out.append((qi, best, len(sel)))
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_mmr_rerank_vs_bruteforce(spark, seed):
    from cehrbert_data_spark.operators.similarity import mmr_rerank

    rng = random.Random(seed)
    dim = 8
    # clustered vectors: near-duplicates are common, so diversification
    # actually changes the selection vs plain top-k
    centers = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(4)]
    vecs = {}
    for i in range(40):
        c = centers[rng.randrange(4)]
        vecs[i] = [x + rng.uniform(-0.05, 0.05) for x in c]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id: long, embedding: array<float>",
    )
    queries = df.where(F.col("vec_id") < 3)
    got = {
        (r["q_id"], r["mmr_rank"]): r["n_id"]
        for r in mmr_rerank(
            df, queries, "vec_id", "embedding", k=4, pool=10, lam=0.6, mu=0.4
        ).collect()
    }
    expected = _mmr_expected(vecs, [0, 1, 2], k=4, pool=10, lam=0.6, mu=0.4)
    assert len(got) == len(expected)
    for qi, nid, rk in expected:
        assert got[(qi, rk)] == nid


@pytest.mark.parametrize("seed", SEEDS)
def test_domain_mix_vs_bruteforce(spark, seed):
    import hashlib

    from cehrbert_data_spark.operators.sampling import domain_mix_sample

    rng = random.Random(seed)
    weights = {"a": 5, "b": 3, "c": 2}
    wsum = sum(weights.values())
    rows = [(i, rng.choice(["a", "b", "c", "junk"])) for i in range(300)]
    df = spark.createDataFrame(rows, "id: long, dom: string")

    counts = {}
    for _, d in rows:
        counts[d] = counts.get(d, 0) + 1
    cap = min(counts[d] * wsum // w for d, w in weights.items())
    quota = {d: w * cap // wsum for d, w in weights.items()}

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:10], 16)

    expected = set()
    for d, q in quota.items():
        ids = sorted((i for i, dd in rows if dd == d), key=lambda i: (h(i), i))
        expected |= {(i, d) for i in ids[:q]}

    got = {
        (r["id"], r["domain"])
        for r in domain_mix_sample(df, "id", "dom", weights).collect()
    }
    assert got == expected


def _py_ilog2(x):
    return x.bit_length() - 1


@pytest.mark.parametrize("seed", SEEDS)
def test_dsir_select_vs_bruteforce(spark, seed):
    import hashlib

    from cehrbert_data_spark.operators.sampling import dsir_select

    rng = random.Random(seed)
    vocab_t = ["alpha", "beta", "gamma", "delta"]
    vocab_b = ["omega", "psi", "chi", "alpha"]
    rows = []
    for i in range(120):
        tgt = rng.random() < 0.5
        vocab = vocab_t if tgt else vocab_b
        text = " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 12)))
        rows.append((i, text, tgt))
    df = spark.createDataFrame(rows, "id: long, text: string, tgt: boolean")

    n_buckets = 64

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:10], 16) % n_buckets

    cnt_t, cnt_b = {}, {}
    for _, text, tgt in rows:
        for tok in text.lower().strip().split():
            b = bucket(tok)
            (cnt_t if tgt else cnt_b)[b] = (cnt_t if tgt else cnt_b).get(b, 0) + 1
    scores = {}
    for i, text, tgt in rows:
        if tgt:
            continue
        toks = text.lower().strip().split()
        if not toks:
            continue
        scores[i] = sum(
            _py_ilog2(cnt_t.get(bucket(t), 0) + 1)
            - _py_ilog2(cnt_b.get(bucket(t), 0) + 1)
            for t in toks
        )
    k = 20
    expected = sorted(scores, key=lambda i: (-scores[i], i))[:k]

    got = dsir_select(
        df, "id", "text", F.col("tgt"), k=k, n_buckets=n_buckets
    ).collect()
    assert sorted(r["id"] for r in got) == sorted(expected)
    for r in got:
        assert r["score_bits"] == scores[r["id"]]


@pytest.mark.parametrize("seed", SEEDS)
def test_tfidf_topk_vs_bruteforce(spark, seed):
    from cehrbert_data_spark.operators.text import tfidf_topk

    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(1, 25))))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "id: long, text: string")
    n = len(rows)
    scale = 1024

    tf = {}
    dfreq = {}
    for i, text in rows:
        toks = text.lower().strip().split()
        seen = set()
        for t in toks:
            tf[(i, t)] = tf.get((i, t), 0) + 1
            seen.add(t)
        for t in seen:
            dfreq[t] = dfreq.get(t, 0) + 1

    expected = {}
    for i, _ in rows:
        terms = [(t, c) for (d, t), c in tf.items() if d == i]
        scored = sorted(
            (
                (c * _py_ilog2((n * scale) // dfreq[t]), t, c)
                for t, c in terms
            ),
            key=lambda x: (-x[0], x[1]),
        )[:3]
        for rk, (s, t, c) in enumerate(scored, 1):
            expected[(i, rk)] = (t, c, dfreq[t], s)

    got = {
        (r["doc_id"], r["rk"]): (r["term"], r["tf"], r["df_docs"], r["score"])
        for r in tfidf_topk(df, "id", "text", k=3, idf_scale=scale).collect()
    }
    assert got == expected


# --- merge_intervals vs naive sweep ------------------------------------------

def _merged_expected(rows):
    """Naive union-of-intervals per key: sort, sweep, merge touching."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, s, e in rows:
        if s is None or e is None or s > e:
            continue
        by_key[k].append((s, e))
    out = {}
    for k, ivs in by_key.items():
        ivs.sort()
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e), merged[-1][2] + 1)
            else:
                merged.append((s, e, 1))
        out[k] = sorted((s, e, n) for s, e, n in merged)
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_merge_intervals_vs_bruteforce(spark, seed):
    from datetime import date

    from cehrbert_data_spark.operators.windows import merge_intervals

    rng = random.Random(seed)
    rows = []
    for i in range(400):
        k = rng.randrange(6)
        s_day = rng.randrange(1, 360)
        length = rng.randrange(-2, 15)  # some inverted (dropped) intervals
        s = date(2020, 1, 1) + timedelta(days=s_day)
        e = s + timedelta(days=length)
        if rng.random() < 0.05:
            s = None
        rows.append((k, s, e))
    df = spark.createDataFrame(rows, "k: int, s: date, e: date")
    got = {}
    for r in merge_intervals(df, ["k"], "s", "e").collect():
        got.setdefault(r["k"], []).append(
            (r["island_start"], r["island_end"], r["n_intervals"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _merged_expected(rows)


# --- streaks vs naive day-set scan -------------------------------------------

def _streaks_expected(rows):
    from collections import defaultdict

    days = defaultdict(set)
    for k, d in rows:
        days[k].add(d)
    out = {}
    for k, ds in days.items():
        runs = []
        for d in sorted(ds):
            if runs and (d - runs[-1][1]).days == 1:
                runs[-1] = (runs[-1][0], d, runs[-1][2] + 1)
            else:
                runs.append((d, d, 1))
        out[k] = sorted(runs)
    return out


@pytest.mark.parametrize("seed", SEEDS)
def test_streaks_vs_bruteforce(spark, seed):
    from datetime import date

    from cehrbert_data_spark.operators.windows import streaks

    rng = random.Random(seed)
    rows = []
    for i in range(500):
        k = rng.randrange(5)
        d = date(2020, 1, 1) + timedelta(days=rng.randrange(60))
        rows.append((k, d))
    # timestamps at assorted hours collapse to the same calendar day
    ts_rows = [
        (k, datetime(d.year, d.month, d.day, rng.randrange(24), 0)) for k, d in rows
    ]
    df = spark.createDataFrame(ts_rows, "k: int, ts: timestamp")
    got = {}
    for r in streaks(df, ["k"], "ts").collect():
        got.setdefault(r["k"], []).append(
            (r["streak_start"], r["streak_end"], r["streak_len"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got == _streaks_expected(rows)


# --- remove_duplicated_ngrams vs pure-Python suffix scan ---------------------

def _rdn_expected(docs, n, min_count):
    """Naive EXACTSUBSTR: count every n-gram occurrence corpus-wide (within-
    doc repetition counts), then strip every token covered by a duplicated
    n-gram. Tokenization mirrors words(): split of trim on whitespace, so
    an empty/whitespace-only doc yields a single '' token (no n-grams for
    n >= 2)."""
    import re
    from collections import Counter

    toks = {i: re.split(r"\s+", t.strip()) for i, t in docs}
    cnt = Counter()
    for ws in toks.values():
        for p in range(len(ws) - n + 1):
            cnt[" ".join(ws[p : p + n])] += 1
    out = {}
    for i, ws in toks.items():
        covered = set()
        for p in range(len(ws) - n + 1):
            if cnt[" ".join(ws[p : p + n])] >= min_count:
                covered.update(range(p, p + n))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        out[i] = (len(ws), len(kept), " ".join(kept))
    return out


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize("n,min_count", [(2, 2), (3, 2), (5, 3)])
def test_remove_duplicated_ngrams_vs_bruteforce(spark, seed, n, min_count):
    """Adversarial random corpora: tiny vocab (forced duplicate n-grams,
    incl. self-overlapping within-doc repeats), unicode tokens, punctuation
    tokens, docs shorter than n, empty docs, and duplicated spans straddling
    doc start/end."""
    from cehrbert_data_spark.operators.dedup import remove_duplicated_ngrams

    rng = random.Random(seed)
    vocab = ["a", "b", "cc", "δξ", "漢字", "x!", "42", "_", "q-q", "ζ"]
    docs = []
    for i in range(60):
        ln = rng.choice([0, 1, n - 1, n, n + 1, rng.randrange(2, 16)])
        words_ = [rng.choice(vocab) for _ in range(ln)]
        # ~1 in 4 docs: force a run of one token (self-overlapping n-grams)
        if rng.random() < 0.25 and ln >= n:
            words_[: n + rng.randrange(3)] = [rng.choice(vocab)] * (
                n + rng.randrange(3)
            )
        docs.append((i, " ".join(words_)))
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["text"])
        for r in remove_duplicated_ngrams(
            df, "doc_id", "text", n=n, min_count=min_count
        ).collect()
    }
    assert got == _rdn_expected(docs, n, min_count)


# --- hashed_classifier_score vs pure-Python scorer ---------------------------

@pytest.mark.parametrize("seed", SEEDS)
def test_hashed_classifier_score_vs_bruteforce(spark, seed):
    """Randomized weight tables (sparse, negative weights, negative
    intercept), unicode/punctuation tokens, empty docs, and NULL text."""
    import hashlib
    import math
    import re

    from cehrbert_data_spark.operators.text import hashed_classifier_score

    rng = random.Random(seed)
    n_buckets = 128
    intercept = rng.randrange(-5000, 5000)
    # sparse weight table: ~half the buckets have no weight (coalesce-0 path)
    wrows = [
        (b, rng.randrange(-1000, 1000))
        for b in range(n_buckets)
        if rng.random() < 0.5
    ]
    vocab = ["alpha", "beta", "δξ", "漢字", "x!", "42", "", "q-q", "the", "ζ"]
    docs = []
    for i in range(50):
        ln = rng.randrange(0, 12)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(ln))))
    docs.append((98, None))  # NULL text: must drop entirely
    docs.append((99, "   "))  # whitespace-only: single '' token
    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    weights = spark.createDataFrame(wrows, "bucket: long, w_milli: long")
    got = {
        r["doc_id"]: (r["n_tokens"], r["score_milli"], r["logit"], r["prob"])
        for r in hashed_classifier_score(
            df, "doc_id", "text", weights,
            n_buckets=n_buckets, intercept_milli=intercept,
        ).collect()
    }

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets

    wmap = dict(wrows)
    expected = {}
    for i, text in docs:
        if text is None:
            continue
        toks = re.split(r"\s+", text.strip())
        score = sum(wmap.get(bucket(t), 0) for t in toks)
        logit = (float(intercept) + score / len(toks)) / 1000.0
        expected[i] = (len(toks), score, logit, 1.0 / (1.0 + math.exp(-logit)))
    assert set(got) == set(expected)
    for i, (nt, sc, lg, pb) in expected.items():
        assert got[i][0] == nt and got[i][1] == sc, i
        assert got[i][2] == lg, i  # identical IEEE operands -> identical bits
        assert abs(got[i][3] - pb) < 1e-12, i


# --- sketches vs pure-Python replicas -----------------------------------------

def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.mark.parametrize("seed", SEEDS)
def test_hll_registers_and_estimate_vs_bruteforce(spark, seed):
    """Register table AND estimate reproduced bit-for-bit by a pure-Python
    HLL over the same md5 bit-slicing (bucket = h mod m, rank from the
    60-p suffix's bit length)."""
    from cehrbert_data_spark.operators.sketches import hll_alpha, hll_distinct, hll_registers

    rng = random.Random(seed)
    p, m, wbits, scale = 5, 32, 55, 57
    vals = [rng.randrange(10**9) for _ in range(3000)]
    df = spark.createDataFrame([("g", v) for v in vals], "g: string, v: long")

    got_regs = {
        r["bucket"]: r["register"]
        for r in hll_registers(df, ["g"], F.col("v"), p=p).collect()
    }
    regs: dict[int, int] = {}
    for v in vals:
        h = _md5_60(str(v))
        w = h >> p
        rank = (wbits + 1 - w.bit_length()) if w > 0 else (wbits + 1)
        b = h % m
        regs[b] = max(regs.get(b, 0), rank)
    assert got_regs == regs

    row = hll_distinct(df, ["g"], F.col("v"), p=p).collect()[0]
    present_sum = sum(1 << (scale - r) for r in regs.values())
    register_sum = present_sum + (m - len(regs)) * (1 << scale)
    est = float(repr(hll_alpha(m) * m * m * float(1 << scale))) / float(register_sum)
    assert row["n_present"] == len(regs)
    assert row["register_sum"] == register_sum
    assert row["hll_estimate"] == est  # identical IEEE operands
    # sanity: the estimate is in the right ballpark of the true cardinality
    true = len(set(vals))
    assert abs(row["hll_estimate"] - true) / true < 0.5


@pytest.mark.parametrize("seed", SEEDS)
def test_cms_never_underestimates_and_matches_bruteforce(spark, seed):
    from collections import Counter

    from cehrbert_data_spark.operators.sketches import cms_build, cms_estimate

    rng = random.Random(seed)
    depth, width = 4, 64
    # zipf-ish: heavy repeats force collisions at width 64
    vals = [rng.choice([1, 1, 1, 2, 2, rng.randrange(500)]) for _ in range(2000)]
    df = spark.createDataFrame([(v,) for v in vals], "v: long")
    sketch = cms_build(df, F.col("v"), depth=depth, width=width)

    # pure-Python replica of the sketch
    table = Counter()
    for v in vals:
        for r in range(depth):
            table[(r, _md5_60(f"{r}:{v}") % width)] += 1
    got_cells = {(r["r"], r["c"]): r["counter"] for r in sketch.collect()}
    assert got_cells == dict(table)

    truth = Counter(vals)
    probes = list(truth)[:50]
    probe_df = spark.createDataFrame([(v,) for v in probes], "v: long")
    got_est = {
        r["probe_key"]: r["cms_est"]
        for r in cms_estimate(probe_df, sketch, F.col("v"), depth=depth, width=width).collect()
    }
    for v in probes:
        expect = min(table[(r, _md5_60(f"{r}:{v}") % width)] for r in range(depth))
        assert got_est[v] == expect
        assert got_est[v] >= truth[v]  # CMS never underestimates


@pytest.mark.parametrize("seed", SEEDS)
def test_bloom_no_false_negatives_and_exact_bits(spark, seed):
    from cehrbert_data_spark.operators.sketches import bloom_build, bloom_probe

    rng = random.Random(seed)
    m_bits, k = 1024, 3
    members = [rng.randrange(10**8) for _ in range(300)]
    df = spark.createDataFrame([(v,) for v in set(members)], "v: long")
    filt = bloom_build(df, F.col("v"), m_bits=m_bits, k=k)

    # pure-Python replica of the packed words
    words: dict[int, int] = {}
    for v in set(members):
        h = _md5_60(str(v))
        h1, h2 = h % m_bits, (h >> 30) % m_bits
        for i in range(k):
            pos = (h1 + i * h2) % m_bits
            words[pos // 32] = words.get(pos // 32, 0) | (1 << (pos % 32))
    got_words = {r["word"]: r["bits"] for r in filt.collect()}
    assert got_words == words

    # membership: every member probes TRUE (no false negatives, ever)
    probe = spark.createDataFrame(
        [(v,) for v in members[:100]] + [(-(i + 1),) for i in range(100)], "v: long"
    )
    got = {
        r["probe_key"]: r["bloom_maybe"]
        for r in bloom_probe(probe, filt, F.col("v"), m_bits=m_bits, k=k).collect()
    }
    assert all(got[v] for v in members[:100])
    # false-positive rate on definite non-members stays plausible (<20%)
    fp = sum(1 for i in range(100) if got[-(i + 1)])
    assert fp < 20


@pytest.mark.parametrize("seed", SEEDS)
def test_kmv_sketch_and_jaccard_vs_bruteforce(spark, seed):
    """KMV sketch = the k smallest md5 hashes exactly; the Jaccard estimate
    reproduced from a pure-Python replay of the union-resample rule."""
    from cehrbert_data_spark.operators.sketches import kmv_jaccard, kmv_sketch

    rng = random.Random(seed)
    k = 64
    pool = list(range(5000))
    set_a = set(rng.sample(pool, 800))
    # force genuine overlap: half of b drawn from a
    set_b = set(rng.sample(sorted(set_a), 400)) | set(rng.sample(pool, 500))
    df_a = spark.createDataFrame([(v,) for v in set_a], "v: long")
    df_b = spark.createDataFrame([(v,) for v in set_b], "v: long")

    sk_a = kmv_sketch(df_a, F.col("v"), k=k)
    sk_b = kmv_sketch(df_b, F.col("v"), k=k)
    ha = sorted(_md5_60(str(v)) for v in set_a)[:k]
    hb = sorted(_md5_60(str(v)) for v in set_b)[:k]
    assert [r["h"] for r in sk_a.orderBy("h").collect()] == ha
    assert [r["h"] for r in sk_b.orderBy("h").collect()] == hb

    row = kmv_jaccard(sk_a, sk_b, k=k).collect()[0]
    union_k = sorted(set(ha) | set(hb))[:k]
    n_common = sum(1 for h in union_k if h in set(ha) and h in set(hb))
    assert row["n_common"] == n_common
    assert row["jaccard_est"] == n_common / k
    assert row["kth_a"] == ha[-1] and row["kth_b"] == hb[-1]
    assert row["est_distinct_a"] == (k - 1) * float(1 << 60) / float(ha[-1])
    # the estimate tracks the true Jaccard within sketch error
    true_j = len(set_a & set_b) / len(set_a | set_b)
    assert abs(row["jaccard_est"] - true_j) < 0.2


@pytest.mark.parametrize("seed", SEEDS)
def test_write_shuffled_shards_vs_python_md5(spark, tmp_path, seed):
    """The shard sink's membership and in-shard order replayed in pure
    Python: shard = md5_60(epoch_seed || id) % n_shards, order = the md5
    key — exact, no sampling, so ANY upstream layout must reproduce it
    (the round-8 design range-partitioned on a reservoir SAMPLE and could
    not make this guarantee; see sources/writers.py docstring)."""
    import glob as _glob

    from cehrbert_data_spark.sources.writers import write_shuffled_shards

    rng = random.Random(seed)
    n_shards = rng.choice([3, 8, 16])
    epoch = f"ep{seed}"
    # string ids with duplicates-free random structure; skewed lengths
    ids = list({f"doc-{rng.randrange(10**6)}-{rng.choice('abcxyz')}" for _ in range(400)})
    docs = spark.createDataFrame([(i, f"txt {i}") for i in ids], "doc_id: string, text: string")
    out = str(tmp_path / f"sh{seed}")
    write_shuffled_shards(
        docs.repartition(rng.choice([1, 7, 64])), out, "doc_id", n_shards=n_shards, seed=epoch
    )

    expected = {}
    for i in ids:
        h = _md5_60(epoch + i)
        expected.setdefault(h % n_shards, []).append((h, i))
    for shard in expected.values():
        shard.sort()

    dirs = _glob.glob(f"{out}/shard=*")
    assert sorted(int(d.rsplit("=", 1)[1]) for d in dirs) == sorted(expected)
    for d in dirs:
        k = int(d.rsplit("=", 1)[1])
        files = _glob.glob(f"{d}/part-*.parquet")
        assert len(files) == 1
        got = [r["doc_id"] for r in spark.read.parquet(files[0]).collect()]
        assert got == [i for _, i in expected[k]]


@pytest.mark.parametrize("seed", SEEDS)
def test_gap_fill_daily_vs_bruteforce(spark, seed):
    """gap_fill_daily on adversarial shapes: multi-year spans, NULL key
    values (a group of their own), observed days whose values are ALL
    NULL (day_sum NULL -> not observed, forward-filled), leading all-NULL
    days (nothing to fill from -> filled stays NULL), single-day keys."""
    from datetime import date

    from cehrbert_data_spark.operators.windows import gap_fill_daily

    rng = random.Random(seed)
    keys = ["k0", "k1", "k2", None]  # NULL key is a legitimate group
    rows = []
    for k in keys:
        span_days = rng.choice([1, 40, 900])  # incl. multi-year
        base = datetime(2019, 3, 1) + timedelta(days=rng.randrange(30))
        n_events = 1 if span_days == 1 else rng.randrange(5, 25)
        for j in range(n_events):
            d = rng.randrange(span_days)
            ts = base + timedelta(days=d, hours=rng.randrange(24))
            # leading-NULL shape: first ~20% of the span carries NULL values
            v = None if (d < span_days // 5 or rng.random() < 0.15) else round(
                rng.uniform(-50, 50), 3
            )
            rows.append((k, ts, v))
    df = spark.createDataFrame(rows, "key: string, ts: timestamp, v: double")
    got = {
        (r["key"], r["day"]): (r["filled"], r["is_observed"])
        for r in gap_fill_daily(df, ["key"], "ts", "v").collect()
    }

    # brute force: python groupby -> daily sum (None if all NULL) -> dense
    # calendar -> forward fill
    daily: dict[tuple, dict[date, float | None]] = {}
    for k, ts, v in rows:
        dmap = daily.setdefault(k, {})
        day = ts.date()
        if v is not None:
            dmap[day] = (dmap.get(day) or 0.0) + v
        else:
            dmap.setdefault(day, None)
    expected = {}
    for k, dmap in daily.items():
        d0, d1 = min(dmap), max(dmap)
        carry = None
        d = d0
        while d <= d1:
            observed = d in dmap and dmap[d] is not None
            if observed:
                carry = dmap[d]
            expected[(k, d)] = (carry, 1 if observed else 0)
            d += timedelta(days=1)

    assert set(got) == set(expected)
    for key, (exp_fill, exp_obs) in expected.items():
        g_fill, g_obs = got[key]
        assert g_obs == exp_obs, key
        if exp_fill is None:
            assert g_fill is None, key
        else:
            assert g_fill == pytest.approx(exp_fill, rel=1e-9), key


@pytest.mark.parametrize("seed", SEEDS)
def test_kmeans_vs_python_replay(spark, seed):
    """kmeans_summary replayed exactly in pure Python: md5-smallest seed
    init, exact integer squared-L2 assignment with (dist2, cid) ties,
    floor-quantized centroid means, empty-cluster carry-over, fixed
    iterations + final assignment. Inputs are dyadic rationals so the
    float32 storage and the ×1000 quantization are exact in both paths."""
    import math

    from cehrbert_data_spark.operators.clustering import kmeans_summary

    rng = random.Random(seed)
    n, dim, k, n_iter = 120, 8, 5, 3
    vecs = {
        i: [rng.randint(-2000, 2000) / 1024 for _ in range(dim)]
        for i in range(n)
    }
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id: long, embedding: array<float>",
    )
    got = {
        r["cid"]: (r["n_members"], r["inertia"])
        for r in kmeans_summary(df, "vec_id", "embedding", k=k, n_iter=n_iter).collect()
    }

    # --- pure-Python replay -------------------------------------------------
    def half_up(v: float) -> int:
        # Spark F.round / DuckDB ROUND: half away from zero — NOT python's
        # banker's round() (dyadic inputs land exactly on .5 boundaries)
        return math.floor(v + 0.5) if v >= 0 else -math.floor(-v + 0.5)

    iv = {i: [half_up(x * 1000) for x in v] for i, v in vecs.items()}  # exact
    order = sorted(iv, key=lambda i: (_md5_60(str(i)), i))
    cents = {c: list(iv[order[c]]) for c in range(k)}

    def assign(cents):
        out = {}
        for i, v in iv.items():
            best = min(
                (sum((a - b) ** 2 for a, b in zip(v, cv)), c)
                for c, cv in cents.items()
            )
            out[i] = (best[1], best[0])  # (cid, dist2)
        return out

    for _ in range(n_iter):
        a = assign(cents)
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for i, (c, _) in a.items():
            counts[c] = counts.get(c, 0) + 1
            s = sums.setdefault(c, [0] * dim)
            for d, x in enumerate(iv[i]):
                s[d] += x
        cents = {
            c: (
                [math.floor(float(sums[c][d]) / counts[c]) for d in range(dim)]
                if c in counts
                else cv
            )
            for c, cv in cents.items()
        }
    final = assign(cents)
    want: dict[int, tuple[int, int]] = {}
    for i, (c, d2) in final.items():
        m, s = want.get(c, (0, 0))
        want[c] = (m + 1, s + d2)
    assert got == want
