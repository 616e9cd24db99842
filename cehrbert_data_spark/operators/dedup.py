"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Designed for the 100 TB document case:
  * exact dedup is a single hash-aggregate on md5(text) — map-side combine,
    one shuffle on the digest (never on the full text);
  * MinHash/LSH shuffles only (doc_id, band_key) pairs — signature size is
    constant per document regardless of text length;
  * candidate verification joins are equi-joins on shingle/band keys, so
    Catalyst executes hash joins (no cartesian pair enumeration);
  * all hashes derive from md5 (portable, seed-free — see operators.text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.partitioning import widen_for_fanout
from cehrbert_data_spark.operators.text import md5_long, md5_long_sql, shingles, words

#: Mersenne prime 2^31−1 for universal minhash derivation: with a,b < p and
#: x < p the product a·x + b stays under 2^62 — no BIGINT overflow in any
#: engine.
MINHASH_P = 2_147_483_647


def minhash_coefficients(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_h, b_h) pairs for mh_h = (a_h·x + b_h) mod p."""
    return [
        ((h * 2_654_435_761 + 1) % MINHASH_P, (h * 40_503 + 12_345) % MINHASH_P)
        for h in range(num_hashes)
    ]


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: md5(text) → (digest, n_docs, keep_id) where
    ``keep_id`` is the smallest id (the canonical representative)."""
    return (
        df.selectExpr(f"md5(`{text_col}`) AS digest", f"`{id_col}` AS id")
        .groupBy("digest")
        .agg(F.expr("count(1) AS n_docs"), F.expr("min(id) AS keep_id"))
    )


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, distinct: bool = True
) -> DataFrame:
    """(id, shingle) pairs — shared base for Jaccard and MinHash.

    ``distinct=True`` (set semantics) shuffles the full shingle text — needed
    for Jaccard's intersection counts. MinHash passes ``distinct=False``:
    min() is duplicate-insensitive, so the dedup shuffle is pure waste there.

    Shingles are built by exploding an index range and slicing the word
    array with NATIVE expressions (slice + concat_ws stay in whole-stage
    codegen) instead of exploding a ``transform``-built array — higher-order
    lambdas evaluate interpreted, and this is the hottest per-row loop of
    every shingle-based operator (measured ~20% faster at sf0.1). Same
    shingle strings as :func:`operators.text.shingles` by construction.
    """
    # Guarded range: sequence(1, 0) infers a NEGATIVE step ([1, 0], two
    # bogus indices), so docs shorter than k words must yield an empty
    # array explicitly — matching GENERATE_SERIES(1, n-k+1) in the oracles.
    # selectExpr strings, not composed Columns: this chain was ~150 Py4J
    # round trips of per-operator chatter on EVERY shingle-consumer build
    # (guide §1 fixed overheads; same analyzed plan — words() is
    # split(trim(.), '\s+'), the default parser keeps '\\s+' as \s+).
    idx = (
        f"CASE WHEN size(__w) >= {k} THEN sequence(1, size(__w) - {k - 1})"
        f" ELSE CAST(array() AS array<int>) END"
    )
    pairs = (
        # by=id: hash widen (no round-robin pre-sort) AND the signature /
        # size groupBy("id") downstream reuses this exchange — Project is
        # alias-aware and Generate preserves partitioning, so the explode
        # output stays hash(id)-clustered (r11, one Exchange removed).
        widen_for_fanout(df, by=id_col)
        .selectExpr(
            f"`{id_col}` AS id", f"split(trim(`{text_col}`), '\\\\s+') AS __w"
        )
        .selectExpr("id", "__w", f"explode({idx}) AS __i")
        .selectExpr("id", f"concat_ws(' ', slice(__w, __i, {k})) AS shingle")
    )
    return pairs.distinct() if distinct else pairs


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via a shingle equi-join.

    Pairs are only enumerated for documents sharing ≥1 shingle (inverted-
    index join), so cost scales with real overlap, not |docs|².
    Jaccard = |∩| / (|A| + |B| − |∩|) in exact integer arithmetic.

    The (id, shingle) set feeds three consumers (both join sides + sizes);
    it is materialized once — this IS the inverted index, the thing a
    production shingle store persists — instead of re-exploding the corpus
    per consumer (exchange reuse never fires across the aliases).
    """
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    sh = checkpoint_barrier(doc_shingles(df, id_col, text_col, k))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "n_a", "n_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """Wide signature row (id, mh_0..mh_{n-1}): ``num_hashes`` universal-hash
    min-hashes per doc.

    ONE md5 per shingle; the ``num_hashes`` hash functions are cheap affine
    derivations mh_h = (a_h·x + b_h) mod p over the md5 value (universal
    hashing, p = 2^31−1) — integer arithmetic any engine reproduces exactly.
    One shuffle keyed on id with parallel min-aggregates (map-side partial
    aggregation); no seeds-crossJoin multiplying shingle rows, no n× md5.
    """
    sh = doc_shingles(df, id_col, text_col, k, distinct=False).selectExpr(
        "*", f"{md5_long_sql('shingle')} % {MINHASH_P} AS x"
    )
    # F.expr strings, not composed Column arithmetic: each Column operator
    # is a Py4J round trip, and 16 hashes × ~6 operators dominated the
    # DataFrame BUILD time of every minhash caller (r11 profile: 0.19 s of
    # 0.47 s build in this listcomp alone). The alias rides INSIDE the expr
    # string (`… AS mh_h`): a separate .alias() is another Java round trip
    # plus reflection/GC chatter — measured 253 → 77 RPCs for this listcomp
    # alone, analyzed plan identical (integer literals, same arithmetic,
    # same Alias node).
    aggs = [
        F.expr(f"min((({a} * x) + {b}) % {MINHASH_P}) AS mh_{h}")
        for h, (a, b) in enumerate(minhash_coefficients(num_hashes))
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_signatures_stateless(
    df: DataFrame, id_col: str, text_col: str, k: int = 3, num_hashes: int = 16
) -> DataFrame:
    """Per-row MinHash signature with NO shuffle: higher-order array
    functions (transform + array_min) instead of explode + groupBy.

    Semantically identical to :func:`minhash_signatures` (docs with no
    shingles are dropped either way). Measured ~2.5× slower per row in
    batch — higher-order lambdas evaluate interpreted, outside whole-stage
    codegen — so the agg form stays the batch default. This form exists for
    STREAMS: it is a stateless projection, so it composes with downstream
    stateful operators where a streaming groupBy(id) aggregation could not
    (chained stateful aggregations are restricted in Structured Streaming).
    """
    sh = shingles(words(F.col(text_col)), k)
    hx = F.transform(sh, lambda s: md5_long(s) % MINHASH_P)
    base = df.where(F.size(sh) > 0).select(F.col(id_col).alias("id"), hx.alias("hx"))
    aggs = [
        F.array_min(
            F.transform(F.col("hx"), lambda x: (F.lit(a) * x + F.lit(b)) % MINHASH_P)
        ).alias(f"mh_{h}")
        for h, (a, b) in enumerate(minhash_coefficients(num_hashes))
    ]
    return base.select("id", *aggs)


def band_signature(sig: DataFrame, num_hashes: int = 16, band_size: int = 2) -> DataFrame:
    """Unpivot a wide signature into (id, band, band_key) rows via ``stack``
    — a narrow generator, no shuffle, stream-safe."""
    n_bands = num_hashes // band_size
    stack_args = []
    for b in range(n_bands):
        cols = [f"mh_{h}" for h in range(b * band_size, (b + 1) * band_size)]
        key = "concat_ws(',', " + ", ".join(f"CAST({c} AS STRING)" for c in cols) + ")"
        stack_args.append(f"{b}, {key}")
    return sig.selectExpr(
        "id", f"stack({n_bands}, {', '.join(stack_args)}) AS (band, band_key)"
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 2,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on
    (band, band_key), emit distinct (id_a < id_b) pairs with the number of
    colliding bands (collision probability ≈ 1-(1-s^band_size)^bands).

    Banding unpivots the wide signature with ``stack`` — a narrow generator,
    no shuffle; the only shuffles are the signature groupBy and the
    pair-count groupBy. The bucket join is a plain equi-join on
    (band, band_key), HINTED to a shuffle join: a broadcast here would ship
    the ENTIRE corpus's banded signatures to every executor (a non-starter
    at scale), and — because a broadcast exchange differs from a shuffle
    exchange — would force Spark to compute the whole scan→shingle→
    signature subtree twice. With both sides shuffled on the same keys,
    ReusedExchange computes the signature pipeline exactly once.

    ``max_bucket_size`` is the production skew lever: join cost is
    Σ|bucket|², and a band key shared by thousands of documents (templated
    spam, boilerplate) contributes a quadratic blow-up while adding almost
    no recall — any pair it would emit that matters also collides in a
    smaller bucket of a more selective band. When set, buckets with more
    than ``max_bucket_size`` members are EXCLUDED from pair generation
    (the standard cap in large-scale dedup pipelines; measured on the 100×
    corpus: sum|bucket|² 418M → bounded by cap·|rows|). Default None —
    exact banding semantics, nothing silently dropped; callers that cap
    should surface the choice (curate_corpus exposes --lsh_max_bucket).
    """
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = band_signature(sig, num_hashes, band_size)
    if max_bucket_size is not None:
        if max_bucket_size < 2:
            raise ValueError(f"max_bucket_size must be >= 2, got {max_bucket_size}")
        # One window count over the SAME (band, band_key) keys the bucket
        # join shuffles on — the filtered subtree feeds both join sides, so
        # ReusedExchange still computes the signature pipeline exactly once
        # (a broadcast anti-join against the heavy hitters would add a
        # second, differently-shaped exchange and recompute it).
        banded = (
            banded.selectExpr(
                "*",
                "count(1) OVER (PARTITION BY band, band_key) AS __bucket_n",
            )
            .where(f"`__bucket_n` <= {int(max_bucket_size)}")
            .drop("__bucket_n")
        )
    a = banded.alias("a")
    b = banded.hint("shuffle_hash").alias("b")
    # Single-expr condition/grouping/agg builds (r11 §7 discipline): same
    # analyzed trees as the composed-Column forms, a fraction of the Py4J
    # round trips.
    return (
        a.join(
            b,
            F.expr("a.band = b.band AND a.band_key = b.band_key AND a.id < b.id"),
        )
        .groupBy(F.expr("a.id AS id_a"), F.expr("b.id AS id_b"))
        .agg(F.expr("count(1) AS n_bands"))
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 2,
    threshold: float = 0.5,
) -> DataFrame:
    """The canonical two-stage near-dup pipeline: MinHash-LSH candidate
    generation followed by EXACT Jaccard verification of only the
    candidates — precision becomes exact, recall stays the LSH banding
    curve, and the verify stage's cost is Σ|candidate pair shingles|, never
    the n² triangle (the shape that makes verified dedup feasible at
    100 TB).

    The verification join fans each candidate pair out by side A's distinct
    shingles, then equi-joins side B's shingles on (id, shingle) — pairs
    with zero overlap drop out of the inner join, which is exactly the
    ``threshold > 0`` filter's behavior.

    The distinct shingle set feeds THREE consumers (both verify-join sides
    and the size counts); as a lazy subtree each consumer re-exploded the
    whole corpus (column pruning defeats exchange reuse). Instead of
    materializing corpus-wide shingles (corpus×k bytes — storage-hostile at
    100 TB), the shingle set is first RESTRICTED to documents that appear
    in some candidate pair (semi-join on the materialized candidates) and
    only that bounded set is materialized once — sizes of non-candidate
    docs are never consumed, so semantics are unchanged.
    """
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    cand = checkpoint_barrier(
        minhash_lsh_pairs(df, id_col, text_col, k, num_hashes, band_size)
    )
    cand_ids = (
        cand.select(F.col("id_a").alias(id_col))
        .union(cand.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    docs_in_play = df.join(cand_ids, id_col, "left_semi")
    sh = checkpoint_barrier(
        doc_shingles(docs_in_play, id_col, text_col, k, distinct=True)
    )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        cand.join(a, cand["id_a"] == F.col("a.id"))
        .join(b, (cand["id_b"] == F.col("b.id")) & (F.col("b.shingle") == F.col("a.shingle")))
        .groupBy(cand["id_a"].alias("id_a"), cand["id_b"].alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_shared").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_shared", "jaccard")
    )


def minhash_dedup_against(
    new_df: DataFrame,
    corpus_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 2,
) -> DataFrame:
    """Near-dup candidates of a NEW batch against an existing CORPUS — the
    incremental-ingest shape production dedup actually runs (a daily
    increment against the full historical corpus), as opposed to the
    one-shot self-join of :func:`minhash_lsh_pairs`.

    Returns (new_id, corpus_id, n_bands). At 100 TB the corpus side's
    banded signatures live in a persisted bucketed store and only the NEW
    batch's signatures are computed per run; the join stays an equi-join on
    (band, band_key) — cost Σ_bucket |new_b|·|corpus_b|, proportional to
    the increment, never to corpus². The corpus side is shuffle-hash-hinted
    for the same reason as the self-join form: broadcasting corpus-wide
    signatures cannot scale.
    """
    sig_n = minhash_signatures(new_df, id_col, text_col, k, num_hashes)
    sig_c = minhash_signatures(corpus_df, id_col, text_col, k, num_hashes)
    bn = band_signature(sig_n, num_hashes, band_size).alias("n")
    bc = band_signature(sig_c, num_hashes, band_size).hint("shuffle_hash").alias("c")
    return (
        bn.join(
            bc,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_key") == F.col("c.band_key")),
        )
        .groupBy(F.col("n.id").alias("new_id"), F.col("c.id").alias("corpus_id"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.35,
    centroid_mod: int = 64,
) -> DataFrame:
    """SemDeDup-style semantic deduplication over an embedding column:
    cluster with the deterministic IVF codebook (similarity.ivf_assign,
    nprobe=1), then within each inverted list mark every vector whose exact
    quantized cosine to a SMALLER-id list member is >= ``threshold`` as a
    duplicate of the smallest such id.

    Returns one row per vector: (id, cid, dup_of, is_dup) — dup_of NULL
    for keepers. Scale shape: the pair enumeration is an equi-join on cid
    (Σ |list|², like IVF search — no n²), the centroid set broadcasts, and
    the keeper rule (min id beats) needs no iteration because duplicates
    are anchored to the smallest id per list, not chained. Like-for-like
    near-dup pairs across DIFFERENT lists are out of scope by construction
    (the recall/cost tradeoff SemDeDup makes).
    """
    from cehrbert_data_spark.operators.similarity import (
        int_dot,
        ivf_assign,
        with_quantized_norm,
    )

    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    q = with_quantized_norm(df, vec_col).select(
        F.col(id_col).alias("id"), "ivec", "inorm2"
    )
    # The assignment subtree (corpus × broadcast centroids, scored) feeds
    # THREE consumers (both pair-join sides + the keeper output); column
    # pruning makes their subtrees non-identical so exchange reuse never
    # fires (verified: 3 BroadcastNestedLoopJoin instances, 0
    # ReusedExchange) — materialize once instead of scoring the corpus 3×.
    assigned = checkpoint_barrier(
        q.join(
            ivf_assign(df, id_col, vec_col, centroid_mod, nprobe=1).select("id", "cid"),
            "id",
        )
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = (
        int_dot("a.ivec", "b.ivec").cast("double")
        / (F.sqrt(F.col("a.inorm2")) * F.sqrt(F.col("b.inorm2")))
    )
    dup_anchor = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid")) & (F.col("a.id") < F.col("b.id")),
        )
        .where(cos >= threshold)
        .groupBy(F.col("b.id").alias("id"))
        .agg(F.min(F.col("a.id")).alias("dup_of"))
    )
    return assigned.select("id", "cid").join(dup_anchor, "id", "left").select(
        "id",
        "cid",
        "dup_of",
        F.col("dup_of").isNotNull().alias("is_dup"),
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """(id, comp) for the undirected graph of near-duplicate pairs — the
    keeper-resolution step every dedup pipeline needs after candidate
    generation (A~B, B~C must collapse to ONE keeper even though (A,C) was
    never emitted). comp is the component's minimum id, so it doubles as the
    canonical keeper id.

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels; converges in O(component
    diameter) rounds — near-dup clusters are shallow (most are 2-3 docs), so
    2-3 shuffle rounds in practice. Each round is one equi-join + groupBy
    (both shuffle on id and scale horizontally); convergence is detected by
    the monotone SUM(comp) invariant — labels only ever decrease (strictly,
    for at least one row, on any non-converged round), so an unchanged sum
    means a fixed point, and the check is the lazy checkpoint's
    materializing action (one job per round, same discipline as
    operators.closure). The sum accumulates in DECIMAL(38,0): a BIGINT sum
    over 10^10+ rows of large ids can wrap silently in non-ANSI mode, and a
    wrapped sum colliding with the previous round's wrapped sum would
    terminate the loop early with non-minimal labels; 38 decimal digits
    hold 2^63 · 10^10 with room to spare, so equality-of-sums remains a
    sound fixed-point test at any scale.

    Path-shaped duplicate graphs (templated/sliding near-dup text) have
    diameter ~n; pure propagation would need ~n rounds. After the first 3
    rounds a pointer-jump step (comp <- label[comp]) joins in, halving the
    remaining distance each round — O(log diameter) total, so a chain of
    thousands still converges inside the default budget. If the loop still
    exhausts ``max_iterations`` without reaching the fixed point, raises
    RuntimeError rather than silently returning non-minimal labels (which
    would corrupt keeper resolution downstream).
    """
    edges = pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
    edges = (
        edges.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = edges.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    ).localCheckpoint(eager=False)
    # Exact (never-overflowing) label sum — see the docstring's invariant.
    label_sum = F.sum(F.col("comp").cast("decimal(38,0)"))
    prev_sum = labels.agg(label_sum).collect()[0][0]
    converged = False
    for round_i in range(max_iterations):
        neighbor_min = (
            edges.join(labels, edges["dst"] == labels["id"])
            .groupBy(edges["src"].alias("id"))
            .agg(F.min(labels["comp"]).alias("ncomp"))
        )
        labels = (
            labels.join(neighbor_min.withColumnRenamed("id", "nid"),
                        labels["id"] == F.col("nid"), "left")
            .select(
                labels["id"].alias("id"),
                F.least(labels["comp"], F.coalesce(F.col("ncomp"), labels["comp"])).alias("comp"),
            )
        )
        if round_i >= 3:
            # Long chain still unconverged: pointer-jump (comp <- label[comp])
            # to halve remaining distance per round instead of stepping 1 hop.
            parents = labels.select(
                F.col("id").alias("pid"), F.col("comp").alias("pcomp")
            )
            labels = (
                labels.join(parents, labels["comp"] == F.col("pid"), "left")
                .select(
                    labels["id"].alias("id"),
                    F.least(
                        labels["comp"], F.coalesce(F.col("pcomp"), labels["comp"])
                    ).alias("comp"),
                )
            )
        labels = labels.localCheckpoint(eager=False)
        new_sum = labels.agg(label_sum).collect()[0][0]
        if new_sum == prev_sum:
            converged = True
            break
        prev_sum = new_sum
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} rounds; "
            "component diameter exceeds the iteration budget — raise "
            "max_iterations (pointer-jumping makes each extra round halve the "
            "remaining distance)"
        )
    return labels


def remove_duplicated_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    min_count: int = 2,
    out_col: str | None = None,
    barrier_path: str | None = None,
) -> DataFrame:
    """Exact substring-level dedup (Lee et al. 2022, the EXACTSUBSTR pass of
    "Deduplicating Training Data Makes Language Models Better"): REMOVE
    every token covered by an n-gram occurring >= ``min_count`` times
    corpus-wide (occurrence count, not document frequency — within-document
    repetition counts toward the threshold, matching the suffix-array
    formulation). Near-dup DOC removal (minhash_lsh_pairs -> dedup_keepers)
    drops whole documents; this drops the boilerplate spans INSIDE
    otherwise-unique documents — the two compose.

    Returns ``df`` with ``text_col`` replaced (or ``out_col`` added):
    surviving tokens rejoined by single spaces in original order, plus
    ``n_tokens`` / ``n_kept`` accounting columns. Whitespace is normalized
    as a side effect (a cleaned corpus makes that a no-op). Documents whose
    every token is covered come back as ''.

    Scale shape — the suffix-array algorithm re-expressed relationally:
    token positions explode to (id, pos, digest) n-gram rows (one md5 per
    n-gram, digests shuffle, never text); the duplicated set is ONE
    map-side-combined hash-agg with a count filter; covered positions
    explode each duplicated span to its n token indices; removal is an
    (id, pos) anti-join; reassembly is the sequence-assembly idiom
    (array_sort of (pos, word) structs inside one groupBy). No doc-pair
    enumeration anywhere — cost is token-grain, linear in corpus size.

    **Barrier storage sizing**: the (id, pos, digest) gram set feeds two
    consumers (the occurrence count and the span join) and is materialized
    once behind a barrier. The default ``localCheckpoint`` pins it on
    EXECUTOR storage: ≈ one row per token, ~20-24 bytes each (long id +
    int pos + long digest) — about 3-4× the corpus token count in bytes.
    At petabyte corpus scale that executor-memory/disk residency can
    exceed the cluster's storage fraction; pass ``barrier_path`` (an
    object-store/HDFS URI) to spill the gram set to a DURABLE parquet
    round-trip instead — same single-materialization semantics, storage
    off-cluster, and the written gram set is reusable across reruns.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    out_col = out_col or text_col
    w = words(F.col(text_col))
    base = widen_for_fanout(df, by=id_col).select(
        F.col(id_col).alias("id"), w.alias("__w")
    )
    n_tok = F.size("__w")
    toks = base.select(
        "id", F.posexplode("__w").alias("__p0", "__word")
    ).select("id", (F.col("__p0") + 1).alias("pos"), F.col("__word").alias("word"))
    idx = F.when(n_tok >= n, F.sequence(F.lit(1), n_tok - (n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    grams = base.select("id", "__w", F.explode(idx).alias("pos")).select(
        "id",
        "pos",
        md5_long(F.concat_ws(" ", F.slice(F.col("__w"), F.col("pos"), n))).alias(
            "digest"
        ),
    )
    # The gram set feeds both the occurrence count and the span join —
    # materialize once (exchange reuse never fires across pruned subtrees).
    # barrier_path spills it durably instead of pinning executor storage
    # (see the docstring's sizing note).
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    grams = checkpoint_barrier(grams, path=barrier_path)
    dups = (
        grams.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("__occ"))
        .where(F.col("__occ") >= min_count)
        .select("digest")
    )
    covered = (
        grams.join(dups, "digest")
        .select("id", F.explode(F.sequence(F.col("pos"), F.col("pos") + (n - 1))).alias("pos"))
        .distinct()
    )
    kept = toks.join(covered, ["id", "pos"], "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda x: x["word"],
            ),
        ).alias("__new_text"),
    )
    # Reserved helper-key name: a caller whose id_col is literally "id"
    # must not have its join key swallowed by drop("id") on the helper side.
    sizes = base.select(F.col("id").alias("__rdn_id"), n_tok.alias("n_tokens"))
    rebuilt = rebuilt.withColumnRenamed("id", "__rdn_id")
    out = (
        df.join(sizes, df[id_col] == sizes["__rdn_id"]).drop("__rdn_id")
        .join(
            rebuilt, df[id_col] == rebuilt["__rdn_id"], "left"
        )
        .drop("__rdn_id")
        .withColumn("n_kept", F.coalesce("n_kept", F.lit(0)).cast("long"))
        .withColumn(out_col, F.coalesce("__new_text", F.lit("")))
        .drop("__new_text")
    )
    return out


def dedup_keepers(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """(id, keeper) over ALL documents: transitive near-dup groups collapse
    to their minimum id; documents in no pair keep themselves. One broadcast-
    friendly left join after components (the component table is |dup docs|,
    tiny relative to the corpus)."""
    comps = connected_components(pairs, a_col, b_col)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comps.withColumnRenamed("id", "cid"), F.col("id") == F.col("cid"), "left")
        .select("id", F.coalesce(F.col("comp"), F.col("id")).alias("keeper"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 48) -> DataFrame:
    """SimHash fingerprint: sign of the per-bit weighted sum of word hashes.

    Words are weighted by their occurrence count; two documents with small
    Hamming distance between fingerprints are near-duplicates. Pure integer
    bit arithmetic (portable across engines).
    """
    word_counts = (
        widen_for_fanout(df, by=id_col).select(
            F.col(id_col).alias("id"),
            F.explode(words(F.col(text_col))).alias("word"),
        )
        .groupBy("id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("wh", md5_long(F.col("word"), bits))
    )
    bit_idx = df.sparkSession.range(bits).select(F.col("id").alias("bit"))
    # F.shiftleft/shiftright take a Python-int bit count; the bit index here
    # is a column, so the shifts go through SQL expressions instead.
    contrib = word_counts.crossJoin(F.broadcast(bit_idx)).select(
        "id",
        "bit",
        F.when(
            F.expr("shiftright(wh, CAST(bit AS INT)) & CAST(1 AS BIGINT)") == 1,
            F.col("cnt"),
        )
        .otherwise(-F.col("cnt"))
        .alias("c"),
    )
    bit_signs = contrib.groupBy("id", "bit").agg(F.sum("c").alias("s"))
    return bit_signs.groupBy("id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(bit AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    candidates: str = "lsh",
    num_planes: int | None = None,
    num_tables: int = 8,
    target_recall: float = 0.95,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a_id, b_id, cosine) with
    a_id < b_id and cosine >= threshold, over quantized exact-int cosine.

    ``candidates="lsh"`` (default — the 100 TB path): enumerate only pairs
    sharing a sign-bit LSH bucket in any of ``num_tables`` hash tables
    (similarity.lsh_candidate_pairs — equi-join on (tbl, bucket), join volume
    Σ bucket², never n²), then verify each candidate with the exact quantized
    cosine — precision is exact; only recall is approximate.

    When ``num_planes`` is None it is derived from the threshold by the
    standard sign-LSH parameter rule: per-plane collision probability at
    cosine τ is p = 1 − acos(τ)/π, and the largest P with
    p^P ≥ 1 − (1 − target_recall)^(1/T) keeps table recall ≥ target while
    maximizing bucket selectivity. High thresholds (real near-dup, τ ≥ 0.9)
    get ~7-8 planes and tiny buckets; low thresholds fundamentally force
    coarser buckets — measured at sf0.01, τ=0.35: P=3, T=16 → 99.6 % recall.

    ``max_bucket_size`` passes through to the LSH bucket join (see
    similarity.lsh_candidate_pairs): degenerate buckets — every
    near-origin vector shares the all-zeros sign pattern — cost |bucket|²
    for near-zero recall; cap them explicitly at scale. Default None.

    ``candidates="all_pairs"``: the exactness oracle — full a<b triangle
    (BroadcastNestedLoop, O(n²) compares). Correct at any recall but does not
    scale; use it to measure the LSH path's recall on a sample.
    """
    if num_planes is None:
        import logging
        import math

        p = 1.0 - math.acos(max(min(threshold, 1.0), -1.0)) / math.pi
        need = 1.0 - (1.0 - target_recall) ** (1.0 / num_tables)
        num_planes = max(1, int(math.log(need) / math.log(p))) if 0 < p < 1 else 8
        # Surface the derived recall characteristics at call sites — callers
        # moving from the exact all-pairs path should see what they traded.
        logging.getLogger(__name__).info(
            "embedding_neardup_pairs: derived num_planes=%d (num_tables=%d) "
            "for threshold=%.3f, target_recall=%.3f",
            num_planes, num_tables, threshold, target_recall,
        )
    from cehrbert_data_spark.operators.similarity import (
        int_dot,
        lsh_candidate_pairs,
        with_quantized_norm,
    )

    sided = with_quantized_norm(widen_for_fanout(df, by=id_col), vec_col).select(
        F.col(id_col).alias("id"), "ivec", "inorm2"
    )
    cos = (
        int_dot("a.ivec", "b.ivec").cast("double")
        / (F.sqrt(F.col("a.inorm2")) * F.sqrt(F.col("b.inorm2")))
    )
    if candidates == "lsh":
        cand = lsh_candidate_pairs(
            df, id_col, vec_col, num_planes, num_tables,
            max_bucket_size=max_bucket_size,
        )
        a = sided.alias("a")
        b = sided.alias("b")
        joined = (
            cand.join(a, cand["id_a"] == F.col("a.id"))
            .join(b, cand["id_b"] == F.col("b.id"))
        )
    elif candidates == "all_pairs":
        a, b = sided.alias("a"), sided.alias("b")
        joined = a.join(b, F.col("a.id") < F.col("b.id"))
    else:
        raise ValueError(f"candidates must be 'lsh' or 'all_pairs', got {candidates!r}")
    return (
        joined.select(
            F.col("a.id").alias("a_id"),
            F.col("b.id").alias("b_id"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def contamination_scores(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark-contamination detection: for every corpus document, the
    fraction of its distinct k-gram shingles that also appear anywhere in
    ``eval_df`` (the held-out benchmark / eval corpus).

    This is the asymmetric *containment* check training pipelines run before
    a data release (n-gram decontamination a la GPT-3 appendix C / PaLM):
    pairwise Jaccard dedup (:func:`ngram_jaccard_pairs`) asks "are these two
    documents alike?"; contamination asks "does this training document leak
    any benchmark text?" — a doc can embed a whole eval example and still
    have low Jaccard to it.

    Returns (id, n_ngrams, n_hits, contam_ratio, flagged).

    Scale shape: the benchmark side is tiny next to a 100 TB corpus, so its
    distinct shingle-digest set is BROADCAST — the corpus never shuffles its
    shingle text, only (id, is_hit) flags into the per-doc count aggregate
    (map-side combinable). Shingles join on a 60-bit md5 digest, not the
    raw string, to keep the broadcast table and the hash probes compact.
    """
    corpus_sh = doc_shingles(corpus, id_col, text_col, k).select(
        "id", md5_long(F.col("shingle")).alias("digest")
    )
    eval_sh = (
        doc_shingles(eval_df, id_col, text_col, k)
        .select(md5_long(F.col("shingle")).alias("digest"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    joined = corpus_sh.join(F.broadcast(eval_sh), "digest", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
        .withColumn(
            "contam_ratio",
            F.col("n_hits").cast("double") / F.col("n_ngrams"),
        )
        .withColumn("flagged", F.col("contam_ratio") >= threshold)
    )


def dup_ngram_rates(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Per-document duplicated-n-gram fraction: of a doc's distinct k-grams,
    how many occur in at least one OTHER document (corpus-level repetition, a
    la Lee et al. "Deduplicating Training Data Makes Language Models Better").

    Unlike the pairwise dedup ops this never enumerates document pairs — the
    signal is computed from the global shingle document-frequency table, so
    cost is two hash-aggregates plus one equi-join on the shingle digest
    regardless of how many near-duplicate pairs exist. That makes it the
    cheapest corpus-level dup signal at 100 TB: shuffle volume is the
    distinct (id, digest) set, never n² pairs and never the shingle text.

    Returns (id, n_ngrams, n_dup, dup_rate, max_df) where ``max_df`` is the
    highest document frequency among the doc's shingles.
    """
    sh = doc_shingles(df, id_col, text_col, k).select(
        "id", md5_long(F.col("shingle")).alias("digest")
    )
    # The (id, digest) set feeds both the doc-frequency aggregate and the
    # per-doc rollup; materialize once (exchange reuse never fires across
    # pruned subtrees — round-6 lesson).
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    sh = checkpoint_barrier(sh)
    docfreq = sh.groupBy("digest").agg(F.count(F.lit(1)).alias("df"))
    return (
        sh.join(docfreq, "digest")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.sum(F.when(F.col("df") >= 2, 1).otherwise(0)).alias("n_dup"),
            F.max("df").alias("max_df"),
        )
        .withColumn("dup_rate", F.col("n_dup").cast("double") / F.col("n_ngrams"))
        .select("id", "n_ngrams", "n_dup", "dup_rate", "max_df")
    )
