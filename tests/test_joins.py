from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.joins import (
    anti_filter,
    asof_join,
    interval_join,
    semi_filter,
    with_scalar_max,
)


def _dt(day, hour=0):
    return datetime.datetime(2020, 1, day, hour)


def test_semi_and_anti(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k: int, v: string")
    keys = spark.createDataFrame([(1,), (3,), (3,)], "k: int")
    assert sorted(r["v"] for r in semi_filter(df, keys, "k").collect()) == ["a", "c"]
    assert [r["v"] for r in anti_filter(df, keys, "k").collect()] == ["b"]


def test_with_scalar_max(spark):
    df = spark.createDataFrame([(1,), (7,), (3,)], "v: int")
    out = with_scalar_max(df, "v", "mx").collect()
    assert all(r["mx"] == 7 for r in out) and len(out) == 3


def test_interval_join_bounds_inclusive(spark):
    events = spark.createDataFrame(
        [(1, _dt(1)), (1, _dt(2)), (1, _dt(5)), (2, _dt(2))],
        "pid: int, ts: timestamp",
    )
    visits = spark.createDataFrame(
        [(1, 100, _dt(1), _dt(2)), (1, 101, _dt(4), _dt(6))],
        "pid: int, vid: int, lo: timestamp, hi: timestamp",
    )
    out = interval_join(
        events, visits, "pid", events["ts"], visits["lo"], visits["hi"]
    ).collect()
    got = sorted((r["ts"].day, r["vid"]) for r in out)
    # day1, day2 fall in visit 100 (inclusive bounds); day5 in 101; pid=2 drops.
    assert got == [(1, 100), (2, 100), (5, 101)]


def test_asof_join_picks_best_metric(spark):
    events = spark.createDataFrame(
        [(1, 10, _dt(3))], "pid: int, eid: int, ts: timestamp"
    )
    visits = spark.createDataFrame(
        [(1, 100, _dt(1), _dt(6)), (1, 101, _dt(2), _dt(6))],
        "pid: int, vid: int, lo: timestamp, hi: timestamp",
    )
    out = asof_join(
        events,
        visits,
        "pid",
        events["ts"],
        visits["lo"],
        visits["hi"],
        metric=[F.col("lo").desc(), F.col("vid")],
        left_key="eid",
    ).collect()
    # Latest-starting covering visit wins.
    assert [(r["eid"], r["vid"]) for r in out] == [(10, 101)]


def test_asof_join_union_matches_brute_force(spark):
    import random

    rng = random.Random(42)
    rights = [
        (k, rng.randrange(0, 50), i, float(i))
        for i, k in enumerate(rng.choices(range(5), k=40))
    ]
    lefts = [
        (k, rng.randrange(0, 50), 1000 + i)
        for i, k in enumerate(rng.choices(range(6), k=30))  # key 5 never matches
    ]
    right = spark.createDataFrame(rights, "k: int, rts: long, rid: int, rv: double")
    left = spark.createDataFrame(lefts, "k: int, lts: long, lid: int")

    from cehrbert_data_spark.operators.joins import asof_join_union

    def brute(how):
        out = {}
        for k, lts, lid in lefts:
            cands = [r for r in rights if r[0] == k and r[1] <= lts]
            best = max(cands, key=lambda r: (r[1], r[2])) if cands else None
            if best is not None:
                out[lid] = (best[2], best[3], best[1])
            elif how == "left":
                out[lid] = (None, None, None)
        return out

    for how in ("inner", "left"):
        got = {
            r["lid"]: (r["rid"], r["rv"], r["rts"])
            for r in asof_join_union(
                left, right, on="k", left_ts="lts", right_ts="rts", how=how
            ).collect()
        }
        assert got == brute(how), f"how={how}"


def test_asof_join_union_salted_matches_unsalted(spark):
    """Round-7 verdict ask: the salted (time-bucket segmented) merge form
    must return EXACTLY the unsalted result — the salt only changes the
    physical partitioning — across ties, unmatched keys, and how modes."""
    import random

    rng = random.Random(7)
    rights = [
        (k, rng.randrange(0, 200), i, float(i))
        for i, k in enumerate(rng.choices(range(4), k=120))
    ]
    lefts = [
        (k, rng.randrange(0, 200), 1000 + i)
        for i, k in enumerate(rng.choices(range(5), k=80))  # key 4 never matches
    ]
    right = spark.createDataFrame(rights, "k: int, rts: long, rid: int, rv: double")
    left = spark.createDataFrame(lefts, "k: int, lts: long, lid: int")

    from cehrbert_data_spark.operators.joins import asof_join_union

    for how in ("inner", "left"):
        plain = {
            (r["lid"], r["rid"], r["rv"], r["rts"])
            for r in asof_join_union(
                left, right, on="k", left_ts="lts", right_ts="rts", how=how,
                tiebreak="rid",
            ).collect()
        }
        # bucket of 30 "seconds" over a 0-199 range: ~7 buckets per key
        salted = {
            (r["lid"], r["rid"], r["rv"], r["rts"])
            for r in asof_join_union(
                left, right, on="k", left_ts="lts", right_ts="rts", how=how,
                tiebreak="rid", salt_bucket_seconds=30,
            ).collect()
        }
        assert salted == plain, f"how={how}"


def test_asof_join_union_salted_bounds_single_key_tasks(spark):
    """One pathological key with 10^6 rows: the salted form's window
    partitions on (key, bucket), so the largest window group is bounded by
    the busiest bucket — not the full key — and the result still matches
    the rank-1 expectation."""
    from cehrbert_data_spark.operators.joins import asof_join_union

    n = 1_000_000
    # one key, right event every 10 "seconds" over 10^7; lefts every 100
    right = (
        spark.range(n // 10)
        .select(
            F.lit(1).alias("k"),
            (F.col("id") * 100).alias("rts"),
            F.col("id").alias("rid"),
        )
    )
    left = (
        spark.range(n)
        .select(
            F.lit(1).alias("k"),
            (F.col("id") * 10 + 5).alias("lts"),
            F.col("id").alias("lid"),
        )
    )
    day = 86_400
    out = asof_join_union(
        left, right, on="k", left_ts="lts", right_ts="rts",
        tiebreak="rid", salt_bucket_seconds=day,
    )
    # correctness on the full 10^6 rows: rid must equal lts div 100 —
    # exactly the last right at-or-before each left
    bad = out.where(F.col("rid") != F.floor(F.col("lts") / 100)).count()
    assert bad == 0
    assert out.count() == n
    # the skew bound itself: with a single logical key the window key
    # (k, bucket) still has many groups, and the busiest group is a small
    # fraction of the key's rows
    groups = (
        left.select((F.floor(F.col("lts") / day)).alias("b"))
        .groupBy("b")
        .count()
    )
    n_groups, biggest = groups.count(), groups.agg(F.max("count")).first()[0]
    assert n_groups >= 100
    assert biggest <= n // 100


def test_asof_join_union_tie_and_duplicate_lefts(spark):
    # two rights at the exact left timestamp -> greatest payload wins
    # (at-or-before is inclusive); two identical left rows both survive
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 10, "b")], "k: int, lts: long, tag: string"
    )
    right = spark.createDataFrame(
        [(1, 10, 7), (1, 10, 9), (1, 11, 99)], "k: int, rts: long, rid: int"
    )
    from cehrbert_data_spark.operators.joins import asof_join_union

    rows = asof_join_union(
        left, right, on="k", left_ts="lts", right_ts="rts"
    ).collect()
    assert sorted((r["tag"], r["rid"]) for r in rows) == [("a", 9), ("b", 9)]


def test_asof_join_union_explicit_tiebreak(spark):
    # Duplicate (key, ts) rights: without a tiebreak the payload STRUCT
    # ordering decides (first projected column); with tiebreak= the stated
    # column decides regardless of payload projection order.
    left = spark.createDataFrame([(1, 10, "x")], "k: int, lts: long, tag: string")
    right = spark.createDataFrame(
        [(1, 10, 7, "low"), (1, 10, 9, "high"), (1, 10, 8, "mid")],
        "k: int, rts: long, rid: int, lab: string",
    )
    from cehrbert_data_spark.operators.joins import asof_join_union

    # project lab FIRST so struct order would pick max(lab)='mid' — the
    # explicit tiebreak must override and pick max(rid)=9
    reordered = right.select("k", "rts", "lab", "rid")
    rows = asof_join_union(
        left, reordered, on="k", left_ts="lts", right_ts="rts", tiebreak="rid"
    ).collect()
    assert [(r["rid"], r["lab"]) for r in rows] == [(9, "high")]
    with pytest.raises(ValueError, match="tiebreak"):
        asof_join_union(
            left, right, on="k", left_ts="lts", right_ts="rts", tiebreak="nope"
        )


def test_asof_join_union_null_timestamps(spark):
    # NULL-ts rights must never be carried as a match; NULL-ts lefts drop
    # under inner and survive with NULL right columns under left.
    left = spark.createDataFrame(
        [(1, 10, "has_match"), (2, 10, "no_match"), (1, None, "null_ts")],
        "k: int, lts: long, tag: string",
    )
    right = spark.createDataFrame(
        [(1, 5, 7), (2, None, 666)], "k: int, rts: long, rid: int"
    )
    from cehrbert_data_spark.operators.joins import asof_join_union

    inner = asof_join_union(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert [(r["tag"], r["rid"]) for r in inner] == [("has_match", 7)]
    outer = sorted(
        (r["tag"], r["rid"])
        for r in asof_join_union(
            left, right, on="k", left_ts="lts", right_ts="rts", how="left"
        ).collect()
    )
    assert outer == [("has_match", 7), ("no_match", None), ("null_ts", None)]


def test_overlap_join_buckets_malformed_intervals_excluded(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    t1 = datetime.datetime(2024, 1, 5)
    left = spark.createDataFrame(
        [(1, t0, t1), (2, t1, t0), (3, None, t1)],  # 2 inverted, 3 null start
        "lid: int, l_s: timestamp, l_e: timestamp",
    )
    right = spark.createDataFrame(
        [(100, t0, t1)], "rid: int, r_s: timestamp, r_e: timestamp"
    )
    from cehrbert_data_spark.operators.joins import overlap_join_buckets

    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join_buckets(
            left, right, "l_s", "l_e", "r_s", "r_e", bucket_seconds=24 * 3600
        ).collect()
    )
    assert got == [(1, 100)]


def test_overlap_join_buckets_matches_brute_force(spark):
    import datetime
    import random

    rng = random.Random(7)
    base = datetime.datetime(2024, 1, 1)

    def interval(i):
        s = base + datetime.timedelta(hours=rng.randrange(0, 24 * 60))
        return (i, s, s + datetime.timedelta(hours=rng.randrange(1, 200)))

    lefts = [interval(i) for i in range(25)]
    rights = [interval(100 + i) for i in range(60)]
    left = spark.createDataFrame(lefts, "lid: int, l_s: timestamp, l_e: timestamp")
    right = spark.createDataFrame(rights, "rid: int, r_s: timestamp, r_e: timestamp")

    from cehrbert_data_spark.operators.joins import overlap_join_buckets

    expected = sorted(
        (l[0], r[0])
        for l in lefts
        for r in rights
        if l[1] <= r[2] and r[1] <= l[2]
    )
    # bucket smaller AND larger than typical interval length: pairs spanning
    # many buckets must still be credited exactly once
    for bucket in (6 * 3600, 14 * 24 * 3600):
        got = sorted(
            (r["lid"], r["rid"])
            for r in overlap_join_buckets(
                left, right, "l_s", "l_e", "r_s", "r_e", bucket_seconds=bucket
            ).collect()
        )
        assert got == expected, f"bucket={bucket}"
