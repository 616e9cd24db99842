"""Distributed sketch operators: deterministic HyperLogLog distinct counts.

Spark ships ``approx_count_distinct`` (a HyperLogLog++ variant), but its
hash seed and register layout are engine-private: no other system can
reproduce its registers, so its output cannot be oracle-verified and is not
stable across engine versions. The sketch here trades a few bits of
per-register resolution for full determinism:

  * hashing is md5-based (``operators.text.md5_long``) — any engine that
    can compute md5 reproduces the registers bit-for-bit;
  * the harmonic-mean denominator ``sum(2^-rank)`` is kept as an EXACT
    integer (``sum(1L << (S - rank))`` with a fixed scale ``S``), so the
    register aggregation is order-independent and cross-engine exact;
  * the only floating-point step is one final division of two exact
    numbers, which IEEE-754 rounds identically everywhere.

Reference anchor: the reference computes exact distinct counts in its
concept-stats pass (src/stats via COUNT(DISTINCT person_id)); this sketch
is the 100 TB-scale complement — mergeable registers, fixed memory per
group — that a reference user would reach for when the exact count no
longer fits.

100 TB design: the register table is ``|groups| * m`` rows regardless of
input size, built by one hash-agg with map-side combine (``max`` is
commutative); registers are mergeable, so per-partition partial registers
combine without re-reading data. No windows, no collects.

Small-range note: below ~2.5*m distinct values HyperLogLog's raw estimate
biases high and production implementations switch to linear counting
(``m * ln(m / empty_registers)``). ``ln`` is not correctly-rounded-portable
across engines, so this operator emits the raw estimate plus
``n_present`` — callers can apply the correction; the oracle checks the
registers and raw estimate exactly.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.text import md5_long


def ilog2(col: Column) -> Column:
    """Exact floor(log2(x)) for positive BIGINT via bit-length.

    ``length(bin(x)) - 1`` — both Spark and DuckDB render ``bin`` of a
    positive integer with no leading zeros, so the length IS the bit
    length. Exact where ``log(x)/log(2)`` suffers double rounding.
    """
    return (F.length(F.bin(col)) - F.lit(1)).cast("long")


def hll_alpha(m: int) -> float:
    """Standard HyperLogLog bias-correction constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, group_cols: Sequence[str], value: Column, p: int = 6
) -> DataFrame:
    """Per-group HyperLogLog registers: (groups..., bucket, register).

    The 60-bit md5 hash splits into a ``p``-bit bucket and a ``60-p``-bit
    suffix ``w``; the register rank is the position of w's highest set bit
    counted from the top: ``rank = (60-p) + 1 - bitlen(w)`` (w == 0 ->
    rank = 61-p, the all-zeros maximum). One hash-agg, map-side combined.
    """
    m = 1 << p
    wbits = 60 - p
    h = md5_long(value.cast("string"), bits=60)
    w = F.shiftright(h, p)
    rank = F.when(w > 0, F.lit(wbits + 1) - (ilog2(w) + 1)).otherwise(
        F.lit(wbits + 1)
    )
    return (
        df.select(*group_cols, (h % m).alias("bucket"), rank.alias("rank"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").cast("long").alias("register"))
    )


def hll_distinct(
    df: DataFrame, group_cols: Sequence[str], value: Column, p: int = 6
) -> DataFrame:
    """Deterministic per-group HLL distinct estimate.

    Returns (groups..., m, n_present, register_sum, hll_estimate) where
    ``register_sum = sum_b 2^(S - register_b)`` over all m registers
    (absent registers contribute 2^S, i.e. rank 0) with scale
    ``S = 62 - p`` — the largest scale where ``m * 2^S`` still fits a
    signed 64-bit integer — and ``hll_estimate = alpha_m * m^2 * 2^S /
    register_sum`` (one exact-operand double division).
    """
    m = 1 << p
    scale = 62 - p
    regs = hll_registers(df, group_cols, value, p)
    # Exact 2^(S - rank): shiftleft of a BIGINT one by a column-valued
    # amount (rank >= 1, so the shift is at most S-1 and never overflows).
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({scale} - register AS INT))")
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum(term).cast("long").alias("present_sum"),
    )
    # alpha * m^2 * 2^S embedded via repr() — the shortest round-trip
    # decimal literal parses to the identical double in any IEEE engine.
    numer = repr(hll_alpha(m) * m * m * float(1 << scale))
    empty = F.expr(f"(CAST({m} AS BIGINT) - n_present) * shiftleft(CAST(1 AS BIGINT), {scale})")
    return agg.select(
        *group_cols,
        F.lit(m).cast("long").alias("m"),
        "n_present",
        (F.col("present_sum") + empty).alias("register_sum"),
        (F.lit(float(numer)) / (F.col("present_sum") + empty).cast("double")).alias(
            "hll_estimate"
        ),
    )


def hll_sql(
    table: str, group_cols: Sequence[str], value_expr: str, p: int = 6
) -> str:
    """ANSI-SQL (DuckDB) rendering of :func:`hll_distinct` — the oracle."""
    m = 1 << p
    wbits = 60 - p
    scale = 62 - p
    numer = repr(hll_alpha(m) * m * m * float(1 << scale))
    g = ", ".join(group_cols)
    return f"""
WITH h AS (
  SELECT {g},
         CAST(('0x' || SUBSTRING(md5(CAST({value_expr} AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM {table}
),
r AS (
  SELECT {g}, h % {m} AS bucket,
         CASE WHEN h // {m} > 0
              THEN {wbits + 1} - LENGTH(bin(h // {m}))
              ELSE {wbits + 1} END AS rank
  FROM h
),
regs AS (SELECT {g}, bucket, MAX(rank) AS register FROM r GROUP BY {g}, bucket),
agg AS (
  SELECT {g}, COUNT(*) AS n_present,
         SUM((CAST(1 AS BIGINT) << ({scale} - register))) AS present_sum
  FROM regs GROUP BY {g}
)
SELECT {g}, CAST({m} AS BIGINT) AS m, CAST(n_present AS BIGINT) AS n_present,
       CAST(present_sum + ({m} - n_present) * (CAST(1 AS BIGINT) << {scale}) AS BIGINT)
         AS register_sum,
       {numer} / CAST(present_sum + ({m} - n_present) * (CAST(1 AS BIGINT) << {scale}) AS DOUBLE)
         AS hll_estimate
FROM agg
"""


# --- Bloom filter ------------------------------------------------------------

def bloom_build(df: DataFrame, value: Column, m_bits: int = 4096, k: int = 4) -> DataFrame:
    """Deterministic Bloom filter over a key column: (word, bits).

    Kirsch-Mitzenmacher double hashing off one 60-bit md5: position_i =
    (h1 + i*h2) mod m for i in 0..k-1, packed into 32-bit words inside
    BIGINTs (shift <= 31, so no sign-bit overflow in any engine).

    Scale: the filter is ``m_bits/32`` rows regardless of input size —
    built by one explode + bit_or hash-agg (map-side combined, bit_or is
    idempotent so duplicate keys cost nothing), broadcast to probers. This
    is the distributed analogue of a join-pruning runtime filter, but
    engine-portable and persistable.
    """
    m = m_bits
    h = md5_long(value.cast("string"), bits=60)
    h1 = (h % m).alias("h1")
    h2 = ((F.shiftright(h, 30)) % m).alias("h2")
    pos = (
        df.select(h1, h2)
        .select(
            F.explode(
                F.array(*[((F.col("h1") + i * F.col("h2")) % m) for i in range(k)])
            ).alias("pos")
        )
    )
    return (
        pos.select(
            F.expr("pos div 32").alias("word"),
            F.expr("pos % 32").alias("bit"),
        )
        .groupBy("word")
        .agg(
            F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT)))").alias(
                "bits"
            )
        )
    )


def bloom_probe(
    probe_df: DataFrame,
    filt: DataFrame,
    value: Column,
    m_bits: int = 4096,
    k: int = 4,
    assume_distinct: bool = False,
) -> DataFrame:
    """Probe rows against a :func:`bloom_build` filter.

    Returns the probe rows with a ``bloom_maybe`` flag: true iff all k bit
    positions are set (classic one-sided guarantee — false positives
    possible, false negatives impossible).

    Scale (r12 form, guide §2.3/§2.4): the ``m_bits/32``-row filter folds
    into ONE map row (word -> bits) attached by a single-row broadcast
    nested-loop join, and the k membership tests are a plain projection.
    The previous form exploded the probe to k rows per key, hash-joined on
    word, and re-aggregated with ``bool_and`` — a ``groupBy(probe_key)``
    exchange carrying k×|probe| rows, i.e. it SHUFFLED the entire probe key
    stream that a Bloom probe exists to avoid moving. Identical output
    (same positions, same bits; parity- and oracle-gated).

    ``assume_distinct=True`` skips the per-key dedup when the caller probes
    a unique key (a primary key column): the probe path then has ZERO
    exchanges — the whole probe is a map-side projection.
    """
    m = m_bits
    filt_map = filt.agg(
        F.expr("map_from_arrays(collect_list(word), collect_list(bits)) AS __bm")
    )
    keyed = probe_df.select(value.alias("probe_key"))
    if not assume_distinct:
        keyed = keyed.distinct()
    from cehrbert_data_spark.operators.text import md5_long_sql

    h = md5_long_sql("CAST(probe_key AS STRING)")
    hashed = keyed.selectExpr(
        "probe_key",
        f"{h} % {m} AS __h1",
        f"shiftright({h}, 30) % {m} AS __h2",
    )
    tests = " AND ".join(
        f"((coalesce(__bm[(__h1 + {i} * __h2) % {m} div 32], CAST(0 AS BIGINT))"
        f" & shiftleft(CAST(1 AS BIGINT), CAST((__h1 + {i} * __h2) % {m} % 32 AS INT))) != 0)"
        for i in range(k)
    )
    return hashed.crossJoin(F.broadcast(filt_map)).selectExpr(
        "probe_key", f"({tests}) AS bloom_maybe"
    )


# --- Count-Min sketch --------------------------------------------------------

def cms_build(
    df: DataFrame, value: Column, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-Min sketch of a key column's frequency: (r, c, counter).

    Row-r hash is md5 of ``'r:value'`` mod width. Counters are exact
    integer sums, so the sketch — and every estimate read from it — is
    engine-portable bit-for-bit.

    Scale: the sketch is ``depth*width`` rows no matter the input size;
    one explode + hash-agg with map-side combine. Mergeable by summing
    counters cell-wise.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            md5_long(
                                F.concat_ws(":", F.lit(str(r)), value.cast("string")),
                                bits=60,
                            )
                            % width
                        ).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("cell")
    ).select("cell.r", "cell.c")
    return cells.groupBy("r", "c").agg(F.count(F.lit(1)).cast("long").alias("counter"))


def cms_estimate(
    probe_df: DataFrame,
    sketch: DataFrame,
    value: Column,
    depth: int = 4,
    width: int = 256,
    assume_distinct: bool = False,
) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_build` sketch.

    Returns (probe_key, cms_est) with ``cms_est = min_r counter[r][h_r(v)]``
    — the classic upper-bound estimate (never underestimates).

    Scale (r12 form, guide §2.3/§2.4): the depth×width sketch folds into
    ONE map row (r*width+c -> counter) attached by a single-row broadcast
    nested-loop join, and the estimate is ``least()`` of depth lookups in a
    plain projection. The previous form exploded the probe to depth rows
    per key, hash-joined on (r, c), and re-aggregated with ``min`` — a
    ``groupBy(probe_key)`` exchange carrying depth×|probe| rows. Identical
    output (same cells, same min; parity- and oracle-gated).
    """
    sketch_map = sketch.agg(
        F.expr(
            f"map_from_arrays(collect_list(CAST(r AS BIGINT) * {width} + c),"
            " collect_list(counter)) AS __cm"
        )
    )
    pos = probe_df.select(value.alias("probe_key"))
    if not assume_distinct:
        pos = pos.distinct()
    from cehrbert_data_spark.operators.text import md5_long_sql

    cells = [
        f"coalesce(__cm[{r} * {width} + "
        f"{md5_long_sql(f'''concat_ws(':', '{r}', CAST(probe_key AS STRING))''')} % {width}],"
        " CAST(0 AS BIGINT))"
        for r in range(depth)
    ]
    est = cells[0] if depth == 1 else f"least({', '.join(cells)})"
    return pos.crossJoin(F.broadcast(sketch_map)).selectExpr(
        "probe_key", f"CAST({est} AS BIGINT) AS cms_est"
    )


# --- KMV (k-minimum-values) sketch -------------------------------------------

def kmv_sketch(df: DataFrame, value: Column, k: int = 256) -> DataFrame:
    """KMV distinct-value sketch: the k smallest md5 hashes of the set.

    A k-row sample of the hash space that supports distinct-count
    estimation (``(k-1) * 2^60 / h_k``) and — unlike HLL — set algebra:
    union sketches by re-taking the k smallest, intersect by membership,
    giving a Jaccard estimate (Beyer et al. 2007). Everything except one
    final division is integer, so any md5-capable engine reproduces the
    sketch exactly.

    Scale: distinct-hash then TakeOrdered k — per-partition heaps and a
    k-row driver merge; the sketch is k rows regardless of input size.
    """
    return (
        df.select(md5_long(value.cast("string"), bits=60).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_jaccard(sk_a: DataFrame, sk_b: DataFrame, k: int = 256) -> DataFrame:
    """Jaccard + per-set distinct estimates from two :func:`kmv_sketch` outputs.

    Merges the sketches, re-takes the k smallest union hashes K, and
    estimates J = |K ∩ A ∩ B| / k; distinct counts come from each
    sketch's kth smallest hash. Returns one row:
    (k, kth_a, kth_b, est_distinct_a, est_distinct_b, n_common, jaccard_est).

    If either input set has fewer than k distinct values the estimates
    degrade toward exact (the sketch IS the set); callers comparing to
    exact counts will see that in the query output.

    Scale: inputs are k-row sketches — every join here is broadcast-sized.
    Each sketch feeds THREE consumers (the union re-take, a semi-join, and
    its own kth/count agg), and the TakeOrderedAndProject that produces a
    sketch defeats exchange reuse, so without a barrier the full upstream
    scan+distinct pipeline re-executes once per consumer (r12: a15's plan
    carried 18 Exchanges for 6 recomputations of the orders scan). A k-row
    eager localCheckpoint materializes each sketch ONCE per invocation —
    within-query lineage cut, nothing persists across runs.
    """
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    space = float(1 << 60)
    sk_a = checkpoint_barrier(sk_a)
    sk_b = checkpoint_barrier(sk_b)
    union_k = (
        sk_a.unionByName(sk_b).distinct().orderBy("h").limit(k)
    )
    in_both = (
        union_k.join(sk_a.withColumnRenamed("h", "ha"), F.col("h") == F.col("ha"), "left_semi")
        .join(sk_b.withColumnRenamed("h", "hb"), F.col("h") == F.col("hb"), "left_semi")
    )
    kth_a = sk_a.select(F.max("h").alias("kth_a"), F.count(F.lit(1)).alias("ka"))
    kth_b = sk_b.select(F.max("h").alias("kth_b"), F.count(F.lit(1)).alias("kb"))
    n_common = in_both.select(F.count(F.lit(1)).cast("long").alias("n_common"))
    return (
        kth_a.crossJoin(kth_b)
        .crossJoin(n_common)
        .select(
            F.lit(k).cast("long").alias("k"),
            "kth_a",
            "kth_b",
            # (k-1) * 2^60 / h_k — exact-operand division; if the set had
            # fewer than k distinct values the sketch is exhaustive and the
            # true count is the sketch size itself.
            F.when(F.col("ka") < k, F.col("ka").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(space) / F.col("kth_a").cast("double"))
            .alias("est_distinct_a"),
            F.when(F.col("kb") < k, F.col("kb").cast("double"))
            .otherwise(F.lit(float(k - 1)) * F.lit(space) / F.col("kth_b").cast("double"))
            .alias("est_distinct_b"),
            "n_common",
            (F.col("n_common").cast("double") / F.lit(float(k))).alias("jaccard_est"),
        )
    )
