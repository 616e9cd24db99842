"""Dataset-composition operators: domain mixing and vocabulary coverage.

Training-data pipelines rarely train on a corpus as-collected — they train
on a *mix* (N% web, M% code, ...) and on a tokenizer vocabulary fitted to
that mix. Both operators here are exact and deterministic (md5-ranked
sampling, integer quota arithmetic), so the resulting dataset composition
is auditable and reproducible across runs, engines, and cluster layouts —
the property `rand()`-based samplers cannot give.

100 TB design notes:
  * quotas derive from a per-domain COUNT aggregate (rows = |domains|,
    broadcast back to the corpus — the corpus itself never shuffles twice);
  * per-domain ranking is a key-partitioned window (no global window);
  * vocabulary coverage computes the global top-k with Spark's
    TakeOrdered physical operator (heap per partition, k-row merge — no
    full sort), then does rank/cumulative arithmetic on the k-row result
    via a broadcast triangular self-join — no global window anywhere.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.text import md5_long, regex_tokens


def domain_mix_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, int],
) -> DataFrame:
    """Deterministic resampling to a target domain mix.

    ``weights`` maps domain value -> integer target weight (proportions are
    weights / sum(weights)). The kept total T is the largest corpus size
    achievable without oversampling any domain:

        T = min_d floor(count_d * W / w_d),   W = sum(weights)
        quota_d = floor(w_d * T / W)          (so quota_d <= count_d)

    Each domain keeps its ``quota_d`` documents with the smallest
    md5(id) — a uniform, engine-portable, layout-independent choice.
    All quota arithmetic is integer (exact in Spark and any SQL oracle).

    Returns kept rows: (id, domain, rk, quota).

    Scale: one tiny COUNT agg (|domains| rows) broadcast back to the
    corpus; ranking is a window partitioned by domain. Domains with no
    weight are filtered before any shuffle.
    """
    wsum = sum(weights.values())
    wmap = F.create_map(*[F.lit(x) for kv in weights.items() for x in kv])
    dom = (
        df.where(F.col(domain_col).isin(*weights.keys()))
        .select(F.col(id_col).alias("id"), F.col(domain_col).alias("domain"))
        .withColumn("wt", wmap[F.col("domain")].cast("long"))
    )

    counts = dom.groupBy("domain", "wt").agg(F.count(F.lit(1)).alias("n"))
    # T as a distributed scalar (no collect): 1-row agg, broadcast cross-join.
    cap = counts.select(
        F.min(F.expr(f"(n * {wsum}) div wt")).alias("cap")
    )
    quotas = (
        counts.crossJoin(F.broadcast(cap))
        .select(
            "domain",
            F.expr(f"(wt * cap) div {wsum}").cast("long").alias("quota"),
        )
    )

    w = Window.partitionBy("domain").orderBy(
        md5_long(F.col("id").cast("string"), bits=40), F.col("id")
    )
    ranked = dom.select("id", "domain", F.row_number().over(w).alias("rk"))
    return (
        ranked.join(F.broadcast(quotas), "domain")
        .where(F.col("rk") <= F.col("quota"))
        .select("id", "domain", F.col("rk").cast("long").alias("rk"), "quota")
    )


def vocab_top_coverage(df: DataFrame, text_col: str, k: int = 20) -> DataFrame:
    """Top-k tokenizer vocabulary with cumulative corpus coverage.

    Tokenizes with the corpus BPE-ish regex, counts token frequencies, takes
    the global top-k by (freq DESC, token ASC) — a total order, so ranks are
    deterministic under frequency ties — and reports for each vocabulary
    entry the fraction of all corpus tokens covered by the vocabulary up to
    and including it (the curve a tokenizer's vocab size is chosen from).

    Returns (token, freq, rank, cum_freq, total_tokens, coverage).
    ``coverage`` is the only double — one division of two exact BIGINTs,
    so it renders identically in any IEEE-754 engine.

    Scale: token counting is one hash-agg over exploded tokens (map-side
    combined); top-k uses sort().limit() — Spark plans TakeOrdered, a
    per-partition heap + k-row driver merge, never a full sort; rank and
    cumulative sums come from a broadcast triangular self-join on the
    k-row set (k^2 rows total) instead of a single-partition window.
    """
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    tok = df.select(F.explode(regex_tokens(F.col(text_col))).alias("token"))
    # The corpus explode+agg feeds three consumers (total, and both sides of
    # the triangular join via topk); materialize the |vocab|-row result once
    # — exchange reuse never fires across aliases, and re-exploding the
    # corpus per consumer is the expensive path at scale.
    freqs = checkpoint_barrier(
        tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    )
    total = freqs.select(F.sum("freq").cast("long").alias("total_tokens"))
    topk = freqs.orderBy(F.desc("freq"), F.asc("token")).limit(k)
    a = topk.alias("a")
    b = topk.alias("b")
    before_or_self = (F.col("b.freq") > F.col("a.freq")) | (
        (F.col("b.freq") == F.col("a.freq")) & (F.col("b.token") <= F.col("a.token"))
    )
    ranked = (
        a.join(F.broadcast(b), before_or_self)
        .groupBy(F.col("a.token").alias("token"), F.col("a.freq").alias("freq"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("rank"),
            F.sum(F.col("b.freq")).cast("long").alias("cum_freq"),
        )
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "token",
        F.col("freq").cast("long").alias("freq"),
        "rank",
        "cum_freq",
        "total_tokens",
        (F.col("cum_freq").cast("double") / F.col("total_tokens")).alias("coverage"),
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    k: int,
    n_buckets: int = 4096,
) -> DataFrame:
    """DSIR-style importance-resampled selection (Xie et al., NeurIPS 2023:
    "Data Selection for Language Models via Importance Resampling").

    Scores every NON-target document by how target-like its hashed-unigram
    feature distribution is, and keeps the top ``k``. Per feature bucket b
    the standard method weights by ``log p_target(b) / p_background(b)``;
    natural log is not correctly-rounded-portable across engines, so the
    weight here is the exact integer quantization

        w(b) = floor(log2(cnt_target(b) + 1)) - floor(log2(cnt_bg(b) + 1))

    (bit lengths — see ``operators.sketches.ilog2``), and a document's
    score is the sum of w over its token occurrences: an order-independent
    integer sum any SQL engine reproduces bit-for-bit. The corpus-size
    normalization term is constant per document count and omitted (it
    shifts all scores equally only when documents have equal length;
    occurrence-weighted scoring is the plain DSIR estimator).

    Documents whose text yields zero whitespace tokens have no feature
    rows and are not candidates (same in the SQL oracle).

    Returns the k kept rows: (id, score_bits, n_toks), ties broken by
    smallest id.

    Scale: one explode + hash-agg builds the 2 x n_buckets count table
    (map-side combined, ``n_buckets`` rows total — broadcast back); the
    candidate corpus is scored by one broadcast join + hash-agg; top-k is
    sort().limit() — Spark plans TakeOrdered (per-partition heap, k-row
    driver merge), never a full sort.
    """
    from cehrbert_data_spark.operators.sketches import ilog2

    toks = df.select(
        F.col(id_col).alias("id"),
        target.alias("tgt"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("token"),
    ).select(
        "id", "tgt", (md5_long(F.col("token"), bits=40) % n_buckets).alias("bucket")
    )
    counts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("tgt"), 1).otherwise(0)).alias("cnt_t"),
        F.sum(F.when(F.col("tgt"), 0).otherwise(1)).alias("cnt_b"),
    )
    weights = counts.select(
        "bucket", (ilog2(F.col("cnt_t") + 1) - ilog2(F.col("cnt_b") + 1)).alias("w_bits")
    )
    scores = (
        toks.where(~F.col("tgt"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("id")
        .agg(
            F.sum("w_bits").cast("long").alias("score_bits"),
            F.count(F.lit(1)).cast("long").alias("n_toks"),
        )
    )
    return scores.orderBy(F.desc("score_bits"), F.asc("id")).limit(k)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    rate_num: int,
    rate_den: int,
    seed: str = "ws",
) -> DataFrame:
    """Deterministic per-row weighted Bernoulli sample:
    ``P(keep row i) = min(1, (rate_num/rate_den) * w_i / max(w))``.

    Sampling documents with probability proportional to length/token count
    approximates a UNIFORM sample over tokens with a corpus-size budget
    knob — the composition primitive between uniform doc sampling (every
    doc equal) and ``domain_mix_sample`` (group-level quotas). The
    reference has no sampling beyond patient subsetting
    (apps/sample_omop_tables.py); this is beyond-reference surface for the
    LLM-pipeline brief.

    Exactness/portability: the keep decision is the INTEGER inequality

        u * max_w * rate_den  <  2^60 * w * rate_num,

    with ``u = md5_long(seed || ':' || id) ∈ [0, 2^60)``, evaluated in
    DECIMAL(38,0) on Spark (int128/HUGEINT on engines that have it) — no
    float anywhere, so membership is a pure function of
    (seed, id, w, max_w), reproducible across engines, partitionings, and
    runs. Same md5 discipline as ``domain_mix_sample`` above; ``rand()``
    samplers can give none of these guarantees. Weights must be
    non-negative integers (token/char/byte counts); rows with NULL or
    non-positive weight are never kept (w=0 ⇒ rhs=0).

    100 TB design: one ``max()`` aggregate broadcast back
    (``with_scalar_max`` — the corpus itself never shuffles), then a
    narrow projected filter: one scan + one 1-row broadcast, no other
    exchange. Changing ``seed`` re-draws the sample without re-reading
    anything twice.
    """
    if rate_num <= 0 or rate_den <= 0:
        raise ValueError(f"rate must be positive, got {rate_num}/{rate_den}")
    # The keep inequality is scale-invariant in (rate_num, rate_den), so
    # reducing by the gcd changes nothing about membership while keeping
    # the DECIMAL operands as small as possible.
    g = math.gcd(rate_num, rate_den)
    rate_num //= g
    rate_den //= g
    if max(rate_num, rate_den) > 10**18:
        raise ValueError(
            f"rate={rate_num}/{rate_den} (after gcd reduction) has a term"
            " exceeding 1e18; the exact DECIMAL(38,0) keep test cannot hold"
            " its side of u*max_w*rate_den < 2^60*w*rate_num"
        )
    from cehrbert_data_spark.operators.joins import with_scalar_max

    # Collision-safe temp names: never clobber caller columns.
    w_col, maxw_col = "__w", "__maxw"
    existing = set(df.columns)
    while w_col in existing:
        w_col += "_"
    while maxw_col in existing or maxw_col == w_col:
        maxw_col += "_"

    dec = "decimal(38,0)"
    u = md5_long(
        F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")), 60
    )
    out = with_scalar_max(
        df.withColumn(w_col, F.col(weight_col).cast("long")), w_col, maxw_col
    )
    # BOTH sides of the keep test must stay inside DECIMAL(38,0):
    #   lhs = u * max_w * rate_den   with u < 2^60
    #   rhs = 2^60 * w * rate_num    with w <= max_w
    # so it suffices that max_w * max(rate_num, rate_den) <= (10^38-1)//2^60
    # (the 2^60 factor bounds u on the lhs and is literal on the rhs).
    # Outside that range non-ANSI Spark would NULL the overflowing product
    # and silently DROP the row while an int128/HUGEINT mirror keeps
    # computing — a cross-engine membership divergence. Guarding only the
    # lhs (pre-r11) left rate_num > rate_den (rate > 1 is legal: the keep
    # probability min(1, rate*w/max_w) just saturates) able to overflow the
    # rhs unguarded. assert_true raises in every mode (pattern:
    # aggregations.py corr_regression guard) and folds in as +0 so kept
    # rows are untouched. The guard product itself cannot overflow:
    # max_w <= 2^63 and max rate term <= 1e18 (validated above) => < 1e37.
    bound = (10**38 - 1) // (1 << 60)
    guard = F.assert_true(
        F.col(maxw_col).isNull()
        | (
            F.col(maxw_col).cast(dec)
            * F.lit(max(rate_num, rate_den)).cast(dec)
            <= F.lit(str(bound)).cast(dec)
        ),
        F.lit(
            "weighted_sample: max(weight) * max(rate_num, rate_den) exceeds"
            " the exact DECIMAL(38,0) range of the keep test; reduce the"
            " weights or the rate terms"
        ),
    )
    # Fold the guard into a MULTIPLICAND (not a trailing +0): operands are
    # evaluated before the product, so the assert's message wins over the
    # raw NUMERIC_VALUE_OUT_OF_RANGE the triple product would raise under
    # ANSI mode — and under non-ANSI it fires where the product would have
    # silently gone NULL.
    guard0 = F.coalesce(guard.cast("long"), F.lit(0)).cast(dec)
    lhs = (
        u.cast(dec)
        * (F.col(maxw_col).cast(dec) + guard0)
        * F.lit(rate_den).cast(dec)
    )
    rhs = (
        F.lit(1 << 60).cast(dec)
        * F.col(w_col).cast(dec)
        * F.lit(rate_num).cast(dec)
    )
    return out.where(lhs < rhs).drop(w_col, maxw_col)
