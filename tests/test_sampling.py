from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.sampling import domain_mix_sample, vocab_top_coverage


def _md5_40(x) -> int:
    return int(hashlib.md5(str(x).encode()).hexdigest()[:10], 16)


def test_domain_mix_quotas_and_determinism(spark):
    # Skewed counts: a=30, b=10, c=4; weights 2:1:1 (W=4).
    rows = (
        [(i, "a") for i in range(30)]
        + [(100 + i, "b") for i in range(10)]
        + [(200 + i, "c") for i in range(4)]
        + [(300 + i, "zzz") for i in range(7)]  # unweighted domain: dropped
    )
    df = spark.createDataFrame(rows, "id: long, dom: string")
    out = domain_mix_sample(df, "id", "dom", {"a": 2, "b": 1, "c": 1}).collect()
    # cap = min(30*4//2, 10*4//1, 4*4//1) = min(60, 40, 16) = 16
    # quotas: a = 2*16//4 = 8, b = 1*16//4 = 4, c = 4
    by_dom = {}
    for r in out:
        by_dom.setdefault(r["domain"], []).append(r)
    assert {d: len(v) for d, v in by_dom.items()} == {"a": 8, "b": 4, "c": 4}
    assert all(r["quota"] == {"a": 8, "b": 4, "c": 4}[r["domain"]] for r in out)
    # No domain oversampled; ranks within 1..quota.
    for d, v in by_dom.items():
        assert sorted(r["rk"] for r in v) == list(range(1, len(v) + 1))
    # Kept ids are exactly the md5-smallest per domain (engine-portable rule).
    expect_a = sorted(range(30), key=lambda i: (_md5_40(i), i))[:8]
    assert sorted(r["id"] for r in by_dom["a"]) == sorted(expect_a)
    # Deterministic across re-runs and layouts.
    again = domain_mix_sample(
        df.repartition(7), "id", "dom", {"a": 2, "b": 1, "c": 1}
    ).collect()
    assert {(r["id"], r["rk"]) for r in again} == {(r["id"], r["rk"]) for r in out}


def test_domain_mix_weighted_domain_absent(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], "id: long, dom: string")
    out = domain_mix_sample(df, "id", "dom", {"a": 1, "ghost": 3}).collect()
    # ghost has no rows -> contributes no cap constraint; 'a' keeps all.
    assert sorted(r["id"] for r in out) == [1, 2]


def test_vocab_top_coverage_ranks_ties_and_coverage(spark):
    # freqs: x=3, b=2, a=2, z=1 -> order x, a, b (tie broken token-asc), z.
    df = spark.createDataFrame(
        [("x x x b b",), ("a a z",)], "text: string"
    )
    out = {r["token"]: r for r in vocab_top_coverage(df, "text", k=3).collect()}
    assert set(out) == {"x", "a", "b"}
    assert [out[t]["rank"] for t in ("x", "a", "b")] == [1, 2, 3]
    assert [out[t]["cum_freq"] for t in ("x", "a", "b")] == [3, 5, 7]
    assert all(r["total_tokens"] == 8 for r in out.values())
    assert out["b"]["coverage"] == 7 / 8


def test_vocab_top_coverage_k_larger_than_vocab(spark):
    df = spark.createDataFrame([("one two two",)], "text: string")
    out = vocab_top_coverage(df, "text", k=50).collect()
    assert len(out) == 2
    top = max(out, key=lambda r: r["cum_freq"])
    assert top["cum_freq"] == top["total_tokens"] == 3
    assert top["coverage"] == 1.0


# --- weighted_sample ---------------------------------------------------------

def _py_weighted_keep(seed: str, doc_id: int, w: int, maxw: int, num: int, den: int) -> bool:
    """Pure-Python replica of the operator's integer inequality."""
    u = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
    return u * maxw * den < (1 << 60) * w * num


def test_weighted_sample_matches_python_replica(spark):
    import random

    rng = random.Random(7)
    rows = [(i, rng.randint(0, 500)) for i in range(400)]
    maxw = max(w for _, w in rows)
    df = spark.createDataFrame(rows, "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    got = sorted(
        r["id"] for r in weighted_sample(df, "id", "w", 1, 3, seed="t").collect()
    )
    want = sorted(i for i, w in rows if _py_weighted_keep("t", i, w, maxw, 1, 3))
    assert got == want
    assert want  # the configuration actually keeps something
    # zero-weight rows are never kept (rhs = 0)
    assert all(dict(rows)[i] > 0 for i in got)


def test_weighted_sample_membership_is_layout_invariant(spark):
    rows = [(i, (i * 37) % 211 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    one = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(1), "id", "w", 2, 5).collect()
    )
    wide = sorted(
        r["id"]
        for r in weighted_sample(df.repartition(64), "id", "w", 2, 5).collect()
    )
    assert one == wide
    # a different seed re-draws: same expected mass, different membership
    other = sorted(
        r["id"]
        for r in weighted_sample(df, "id", "w", 2, 5, seed="epoch2").collect()
    )
    assert other != one


def test_weighted_sample_probability_tracks_weight(spark):
    # two weight classes: heavy rows (w = maxw) keep at ~rate, light rows
    # (w = maxw/10) at ~rate/10 -- the proportional-to-size contract.
    n = 4000
    rows = [(i, 1000 if i % 2 == 0 else 100) for i in range(n)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    kept = [r["id"] for r in weighted_sample(df, "id", "w", 1, 2).collect()]
    heavy = sum(1 for i in kept if i % 2 == 0) / (n / 2)
    light = sum(1 for i in kept if i % 2 == 1) / (n / 2)
    assert abs(heavy - 0.5) < 0.05
    assert abs(light - 0.05) < 0.02


def test_weighted_sample_preserves_caller_temp_columns(spark):
    # round-9 advice: a caller column literally named __w / __maxw must
    # survive untouched (the operator generates collision-safe names).
    rows = [(i, (i * 13) % 97 + 1, -i, -2 * i) for i in range(200)]
    df = spark.createDataFrame(rows, "id: long, w: long, __w: long, __maxw: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    out = weighted_sample(df, "id", "w", 1, 2, seed="cc").collect()
    assert out, "sample unexpectedly empty"
    assert set(df.columns) == {"id", "w", "__w", "__maxw"}
    for r in out:
        assert r["__w"] == -r["id"] and r["__maxw"] == -2 * r["id"]
    # membership identical to the collision-free input (same seed/w/maxw)
    plain = spark.createDataFrame(
        [(i, w) for i, w, *_ in rows], "id: long, w: long"
    )
    want = sorted(
        r["id"] for r in weighted_sample(plain, "id", "w", 1, 2, seed="cc").collect()
    )
    assert sorted(r["id"] for r in out) == want


def test_weighted_sample_gcd_reduction_is_membership_invariant(spark):
    rows = [(i, (i * 37) % 211 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    a = sorted(r["id"] for r in weighted_sample(df, "id", "w", 2, 6).collect())
    b = sorted(r["id"] for r in weighted_sample(df, "id", "w", 1, 3).collect())
    assert a == b


def test_weighted_sample_overflow_guard_raises(spark):
    # round-9 advice: max_w * rate_den beyond (10^38-1)//(2^60-1) would
    # overflow the DECIMAL(38,0) keep test and (non-ANSI) silently DROP
    # rows while a HUGEINT oracle keeps computing. The guard must raise
    # instead of diverging. 2^62 * 33 = 1.52e20 > the 8.67e19 bound.
    rows = [(1, 1 << 62), (2, 1 << 61), (3, 1000)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    with pytest.raises(Exception, match="weighted_sample"):
        weighted_sample(df, "id", "w", 1, 33).collect()
    # the same weights with a small denominator stay inside the bound:
    # 2^62 * 2 = 9.2e18 << 8.67e19 -- must NOT raise.
    weighted_sample(df, "id", "w", 1, 2).collect()


def test_weighted_sample_validates_rate_den_magnitude(spark):
    df = spark.createDataFrame([(1, 10)], "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    with pytest.raises(ValueError, match="1e18"):
        weighted_sample(df, "id", "w", 1, 10**18 + 1)
    # but a reducible huge denominator is fine after gcd (10^19/10 -> 10^18)
    weighted_sample(df, "id", "w", 10, 10**19).collect()
    # the numerator is bounded the same way (r10 advice: rate > 1 is legal
    # but an unvalidated rate_num could overflow the rhs product)
    with pytest.raises(ValueError, match="1e18"):
        weighted_sample(df, "id", "w", 10**18 + 1, 1)


def test_weighted_sample_overflow_guard_covers_rate_num(spark):
    # round-10 advice: the guard bounded only the lhs (max_w * rate_den);
    # with rate_num > rate_den the rhs 2^60*w*rate_num could overflow
    # DECIMAL(38,0) unguarded, NULL under non-ANSI, and silently drop every
    # row. The guard now bounds max_w * max(rate_num, rate_den).
    rows = [(1, 1 << 62), (2, 1 << 61), (3, 1000)]
    df = spark.createDataFrame(rows, "id: long, w: long")
    from cehrbert_data_spark.operators.sampling import weighted_sample

    # 2^62 * 33 = 1.52e20 > (10^38-1)//2^60 = 8.67e19 -> must raise
    with pytest.raises(Exception, match="weighted_sample"):
        weighted_sample(df, "id", "w", 33, 1).collect()
    # just inside: 2^62 * 2 = 9.2e18 < bound; rate 2/1 saturates P(keep)=1
    # for the max-weight row, which must therefore be in the sample
    kept = {r["id"] for r in weighted_sample(df, "id", "w", 2, 1).collect()}
    assert 1 in kept
