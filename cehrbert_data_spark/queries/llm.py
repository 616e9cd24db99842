"""LLM-training-data pipeline queries over documents/embeddings.

Dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity search
(brute-force cosine + LSH buckets), text analysis (quality, language,
tokens, fingerprints), multimodal metadata. Every hash derives from md5 so
DuckDB can verify the same computation (see operators.text.md5_long).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from cehrbert_data_spark.operators.multimodal import attach_media_metadata
from cehrbert_data_spark.operators.similarity import cosine_topk, lsh_bucket
from cehrbert_data_spark.operators.text import (
    fingerprint,
    language_scores,
    quality_features,
)
from cehrbert_data_spark.sources.readers import read_table

# DuckDB rendering of operators.text.md5_long(col, bits).
def _md5_long_sql(expr: str, bits: int = 60) -> str:
    return f"CAST(('0x' || SUBSTRING(md5({expr}), 1, {bits // 4})) AS BIGINT)"


# --- text analysis -----------------------------------------------------------

def t_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hash widen (guide §2.5): the regex/array feature projection otherwise
    # runs on the single-row-group scan's ONE task (r11: 0.44 s -> 0.20 s
    # median exec at sf0.1; no-op at real scale).
    from cehrbert_data_spark.operators.partitioning import widen_for_fanout

    docs = widen_for_fanout(read_table(spark, sf_dir, "documents"), by="doc_id")
    return quality_features(docs).select(
        "doc_id",
        "q_n_chars",
        "q_n_words",
        "q_n_tokens",
        "q_mean_word_len",
        "q_distinct_ratio",
        "q_stopword_ratio",
    )


T_QUALITY_SQL = """
WITH w AS (
  SELECT doc_id, text, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
)
SELECT doc_id,
       LENGTH(text) AS q_n_chars,
       LEN(words) AS q_n_words,
       LEN(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS q_n_tokens,
       CAST(LIST_SUM(LIST_TRANSFORM(words, x -> LENGTH(x))) AS DOUBLE)
         / GREATEST(LEN(words), 1) AS q_mean_word_len,
       CAST(LEN(LIST_DISTINCT(words)) AS DOUBLE) / GREATEST(LEN(words), 1) AS q_distinct_ratio,
       CAST(LEN(LIST_FILTER(words, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
         / GREATEST(LEN(words), 1) AS q_stopword_ratio
FROM w
"""


def t_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return language_scores(docs).select("doc_id", "lang", "lid_en_score", "lid_predicted")


T_LANGUAGE_SQL = """
WITH w AS (
  SELECT doc_id, lang, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
s AS (
  SELECT doc_id, lang,
         CAST(LEN(LIST_FILTER(words, x -> x IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
           / GREATEST(LEN(words), 1) AS lid_en_score
  FROM w
)
SELECT doc_id, lang, lid_en_score,
       CASE WHEN lid_en_score >= 0.05 THEN 'en' ELSE 'unknown' END AS lid_predicted
FROM s
"""


def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fingerprint"))


T_FINGERPRINT_SQL = f"""
WITH w AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
)
SELECT doc_id,
       CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(words)),
                i -> ((i % 16) + 1) * ({_md5_long_sql('words[i]', 48)} % 1000003)))
         % 1000000007 AS BIGINT) AS fingerprint
FROM w
"""


def t_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token accounting per source: whitespace words vs BPE-ish regex
    tokens (the unit LLM data budgets are written in)."""
    from cehrbert_data_spark.operators.text import regex_tokens, words

    docs = read_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(words(F.col("text"))).alias("n_words"),
        F.size(regex_tokens(F.col("text"))).alias("n_tokens"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("total_words"),
        F.sum("n_tokens").alias("total_tokens"),
        F.avg("n_tokens").alias("avg_tokens_per_doc"),
        F.max("n_tokens").alias("max_tokens"),
    )


T_TOKENS_SQL = """
WITH per_doc AS (
  SELECT source,
         LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_words,
         LEN(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens
  FROM documents
)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens, AVG(n_tokens) AS avg_tokens_per_doc,
       MAX(n_tokens) AS max_tokens
FROM per_doc GROUP BY source
"""


# --- dedup ---------------------------------------------------------------------

def d_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return exact_dedup_groups(docs, "doc_id", "text")


D_EXACT_SQL = """
SELECT md5(text) AS digest, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
FROM documents GROUP BY md5(text)
"""


def d_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.2)


D_JACCARD_SQL = """
WITH w AS (
  SELECT doc_id AS id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT DISTINCT id,
         ARRAY_TO_STRING(words[i:i+2], ' ') AS shingle
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 2
),
sizes AS (SELECT id, COUNT(*) AS n_shingles FROM sh GROUP BY id),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT id_a, id_b, n_shared, sa.n_shingles AS n_a, sb.n_shingles AS n_b,
       CAST(n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_shared) AS jaccard
FROM shared
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE CAST(n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - n_shared) >= 0.2
"""


def d_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, "doc_id", "text", k=3, num_hashes=16, band_size=2)


def _minhash_banded_cte() -> str:
    """Shared CTE chain ending at ``banded(id, band, band_key)``, mirroring
    operators.dedup.minhash_signatures exactly: one md5 per shingle,
    universal-hash derivations, 2-hash bands. Both the LSH-pairs oracle and
    the streaming-dedup batch dual build on it."""
    from cehrbert_data_spark.operators.dedup import (
        MINHASH_P,
        minhash_coefficients,
    )

    coeffs = minhash_coefficients(16)
    mins = ",\n         ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_P}) AS mh_{h}"
        for h, (a, b) in enumerate(coeffs)
    )
    band_cases = " ".join(
        f"WHEN {b} THEN CAST(mh_{2 * b} AS VARCHAR) || ',' || CAST(mh_{2 * b + 1} AS VARCHAR)"
        for b in range(8)
    )
    return f"""
WITH w AS (
  SELECT doc_id AS id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
sh AS (
  -- no DISTINCT (r11): every consumer of this chain reads only `banded`,
  -- which derives from per-id MINs -- MIN over duplicated shingles equals
  -- MIN over the distinct set, and the 2.2B-row dedup hash was the oracle's
  -- memory wall at the 50M-doc rung. (The Spark operator still dedups
  -- shingles, per the reference semantics; signatures are identical either
  -- way. d_minhash_verified's exact-Jaccard oracle keeps ITS DISTINCT --
  -- set sizes matter there.)
  SELECT id, ARRAY_TO_STRING(words[i:i+2], ' ') AS shingle
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 2
),
hashed AS (
  SELECT id, {_md5_long_sql('shingle')} % {MINHASH_P} AS x FROM sh
),
sig AS (
  SELECT id,
         {mins}
  FROM hashed GROUP BY id
),
banded AS (
  SELECT id, b.band AS band,
         CASE b.band {band_cases} END AS band_key
  FROM sig, (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS band) b
)"""


def _minhash_sql() -> str:
    return f"""{_minhash_banded_cte()}
SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_bands
FROM banded a JOIN banded b
  ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
GROUP BY a.id, b.id
"""


D_MINHASH_SQL = _minhash_sql()


def d_minhash_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION LSH configuration under the driver gate:
    ``max_bucket_size`` excludes heavy-hitter band buckets from pair
    generation BEFORE the bucket join (operators/dedup.py:223-240), turning
    the join's Σ|bucket|² cost from quadratic-in-cluster-size to bounded by
    cap·|rows|. The 1000x bench is why this entry exists: the uncapped
    exact-banding mode exhausted shuffle-spill disk on a corpus whose
    duplicate clusters reached ~1000 members, while this capped form
    finished the same 5M docs in 41.3 s (BENCH_1000x_r09.json). cap=2 (the
    minimum) so the exclusion path is exercised at BOTH gate scales
    (buckets of 3+ exist at sf0.001 and sf0.01)."""
    docs = read_table(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, band_size=2,
        max_bucket_size=2,
    )


# Mirrors the operator exactly: oversized buckets drop BEFORE the pair
# join, so n_bands counts collisions in surviving buckets only.
D_MINHASH_CAPPED_SQL = f"""{_minhash_banded_cte()},
kept AS (
  SELECT id, band, band_key FROM (
    SELECT id, band, band_key,
           COUNT(*) OVER (PARTITION BY band, band_key) AS n
    FROM banded
  ) WHERE n <= 2
)
SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_bands
FROM kept a JOIN kept b
  ON a.band = b.band AND a.band_key = b.band_key AND a.id < b.id
GROUP BY a.id, b.id
"""


def st_minhash_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The streaming MinHash near-dup operator's batch dual under the
    oracle: (id, band, keeper) collision records with keeper = the LSH
    bucket's minimum id. The streaming path (applyInPandasWithState over
    (band, band_key) buckets, cross-batch min-id state with idle-bucket
    timeout) is pinned to exactly these single-batch semantics by
    tests/test_streaming.py's stream==batch equality; this entry puts the
    shared keeper contract under the driver gate — the last stateful
    streaming operator with nontrivial state to get one (VERDICT r8
    ask 6)."""
    from cehrbert_data_spark.streaming.operators import minhash_dedup_stream

    docs = read_table(spark, sf_dir, "documents")
    out = minhash_dedup_stream(docs, "doc_id", "text", k=3, num_hashes=16, band_size=2)
    return out.select("id", F.col("band").cast("long").alias("band"), "keeper")


ST_MINHASH_SQL = f"""{_minhash_banded_cte()},
keepers AS (
  SELECT band, band_key, MIN(id) AS keeper FROM banded GROUP BY band, band_key
)
SELECT b.id, b.band, k.keeper
FROM banded b JOIN keepers k ON b.band = k.band AND b.band_key = k.band_key
WHERE b.id <> k.keeper
"""


def d_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage dedup: LSH candidates, then exact-Jaccard verification of
    only those candidates (exact precision at candidate-bounded cost)."""
    from cehrbert_data_spark.operators.dedup import minhash_verified_pairs

    docs = read_table(spark, sf_dir, "documents")
    return minhash_verified_pairs(
        docs, "doc_id", "text", k=3, num_hashes=16, band_size=2, threshold=0.2
    )


D_MINHASH_VERIFIED_SQL = f"""
WITH pairs AS ({_minhash_sql()}),
vw AS (
  SELECT doc_id AS id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
vsh AS (
  SELECT DISTINCT id, ARRAY_TO_STRING(words[i:i+2], ' ') AS shingle
  FROM vw, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 2
),
vsizes AS (SELECT id, COUNT(*) AS n_shingles FROM vsh GROUP BY id),
vshared AS (
  SELECT p.id_a, p.id_b, COUNT(*) AS n_shared
  FROM pairs p
  JOIN vsh a ON a.id = p.id_a
  JOIN vsh b ON b.id = p.id_b AND b.shingle = a.shingle
  GROUP BY p.id_a, p.id_b
)
SELECT s.id_a, s.id_b, s.n_shared,
       CAST(s.n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - s.n_shared) AS jaccard
FROM vshared s
JOIN vsizes sa ON sa.id = s.id_a
JOIN vsizes sb ON sb.id = s.id_b
WHERE CAST(s.n_shared AS DOUBLE) / (sa.n_shingles + sb.n_shingles - s.n_shared) >= 0.2
"""


def d_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keeper resolution over MinHash-LSH candidate pairs: transitive
    near-dup groups (A~B, B~C) collapse to one canonical keeper via
    distributed connected components; untouched docs keep themselves."""
    from cehrbert_data_spark.operators.dedup import dedup_keepers

    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", k=3, num_hashes=16, band_size=2)
    return dedup_keepers(docs, pairs, "doc_id")


D_DEDUP_GROUPS_SQL = f"""
WITH RECURSIVE pairs AS ({_minhash_sql()}),
uedges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM uedges
  UNION
  SELECT e.src, r.r FROM uedges e JOIN reach r ON e.dst = r.id
),
comp AS (SELECT id, MIN(r) AS comp FROM reach GROUP BY id)
SELECT d.doc_id AS id, COALESCE(c.comp, d.doc_id) AS keeper
FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
"""


def d_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return simhash(docs, "doc_id", "text", bits=48)


D_SIMHASH_SQL = f"""
WITH wc AS (
  SELECT doc_id AS id, word, COUNT(*) AS cnt, {_md5_long_sql('word', 48)} AS wh
  FROM (SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS word FROM documents)
  GROUP BY doc_id, word
),
bit_signs AS (
  SELECT id, b.bit AS bit,
         SUM(CASE WHEN (wh >> b.bit) & 1 = 1 THEN cnt ELSE -cnt END) AS s
  FROM wc, (SELECT UNNEST(GENERATE_SERIES(0, 47)) AS bit) b
  GROUP BY id, b.bit
)
SELECT id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
FROM bit_signs GROUP BY id
"""


# --- similarity search ------------------------------------------------------------

def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return cosine_topk(emb, queries, "vec_id", "embedding", k=10)


SIM_TOPK_SQL = """
WITH q AS (
  SELECT vec_id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS (
  SELECT vec_id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
),
pairs AS (
  SELECT qv.vec_id AS q_id, nv.vec_id AS n_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(qv.ivec)),
              i -> qv.ivec[i] * nv.ivec[i])) AS DOUBLE)
           / (SQRT(qv.norm2) * SQRT(nv.norm2)) AS cosine
  FROM normed qv, normed nv
  WHERE qv.vec_id < 5 AND nv.vec_id != qv.vec_id
)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT q_id, n_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
  FROM pairs
) WHERE rank <= 10
"""


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: LSH-bucket candidates, exact cosine rank within."""
    from cehrbert_data_spark.operators.similarity import lsh_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return lsh_topk(emb, "vec_id", "embedding", k=5, num_planes=8)


SIM_LSH_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS (
  SELECT id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
),
contrib AS (
  SELECT id, p.p AS p,
         SUM(ivec[d] * ({_md5_long_sql("CONCAT(p.p, '_', d - 1)", 48)} % 2001 - 1000)) AS dot
  FROM q, UNNEST(GENERATE_SERIES(1, LEN(ivec))) AS g(d), (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS p) p
  GROUP BY id, p.p
),
buckets AS (
  SELECT id, SUM(CASE WHEN dot > 0 THEN (1::BIGINT << CAST(p AS INT)) ELSE 0 END) AS bucket
  FROM contrib GROUP BY id
),
sided AS (
  SELECT n.id, n.ivec, n.norm2, b.bucket
  FROM normed n JOIN buckets b ON n.id = b.id
),
pairs AS (
  SELECT a.id AS q_id, b.id AS n_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
              i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
           / (SQRT(a.norm2) * SQRT(b.norm2)) AS cosine
  FROM sided a JOIN sided b ON a.bucket = b.bucket AND a.id != b.id
)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT q_id, n_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
  FROM pairs
) WHERE rank <= 5
"""


def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN via IVF coarse quantization (deterministic codebook, nprobe=2)."""
    from cehrbert_data_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, "vec_id", "embedding", k=5, centroid_mod=64, nprobe=2)


SIM_IVF_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS (
  SELECT id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
),
centroids AS (
  SELECT id AS cid, ivec AS cvec, norm2 AS cnorm2 FROM normed WHERE id % 64 = 0
),
scored AS (
  SELECT n.id, c.cid,
         ROW_NUMBER() OVER (
           PARTITION BY n.id
           ORDER BY CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(n.ivec)),
                         i -> n.ivec[i] * c.cvec[i])) AS DOUBLE)
                    / (SQRT(n.norm2) * SQRT(c.cnorm2)) DESC,
                    c.cid ASC
         ) AS probe_rank
  FROM normed n CROSS JOIN centroids c
),
corpus AS (
  SELECT n.id, n.ivec, n.norm2, s.cid
  FROM normed n JOIN scored s ON n.id = s.id AND s.probe_rank = 1
),
queries AS (
  SELECT n.id, n.ivec, n.norm2, s.cid
  FROM normed n JOIN scored s ON n.id = s.id AND s.probe_rank <= 2
),
pairs AS (
  SELECT DISTINCT a.id AS q_id, b.id AS n_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
              i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
           / (SQRT(a.norm2) * SQRT(b.norm2)) AS cosine
  FROM queries a JOIN corpus b ON a.cid = b.cid AND a.id != b.id
)
SELECT q_id, n_id, cosine, rank FROM (
  SELECT q_id, n_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id) AS rank
  FROM pairs
) WHERE rank <= 5
"""


def ml_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed k-means (operators/clustering.py): 3 fixed Lloyd
    iterations from an md5-deterministic seed sample, exact-integer
    distances, floor-quantized centroid updates — the IVF codebook
    trainer, summarized to report grain (cid, n_members, inertia)."""
    from cehrbert_data_spark.operators.clustering import kmeans_summary

    emb = read_table(spark, sf_dir, "embeddings")
    return kmeans_summary(emb, "vec_id", "embedding", k=8, n_iter=3)


def _kmeans_sql(k: int = 8, n_iter: int = 3) -> str:
    """Oracle mirroring clustering.kmeans_summary exactly: the fixed Lloyd
    chain unrolled into MATERIALIZED CTEs (DuckDB inlines single-reference
    CTEs — without the hint it re-derives every earlier iteration per
    step, the PageRank-oracle lesson)."""
    md5 = _md5_long_sql("CAST(id AS VARCHAR)")

    def dist2(n: str, c: str) -> str:
        return (
            f"{n}.norm2 + LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN({c}.cvec)),"
            f" i -> {c}.cvec[i] * {c}.cvec[i]))"
            f" - 2 * LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN({n}.ivec)),"
            f" i -> {n}.ivec[i] * {c}.cvec[i]))"
        )

    parts = [f"""
WITH q AS MATERIALIZED (
  SELECT vec_id AS id,
         LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS MATERIALIZED (
  SELECT id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
),
c0 AS MATERIALIZED (
  SELECT rn - 1 AS cid, ivec AS cvec FROM (
    SELECT ivec, ROW_NUMBER() OVER (ORDER BY {md5}, id) AS rn FROM normed
  ) WHERE rn <= {k}
)"""]
    for t in range(1, n_iter + 2):
        prev = f"c{t - 1}"
        # assignment pass t against the previous centroids
        parts.append(f""",
a{t} AS MATERIALIZED (
  SELECT id, ivec, norm2, cid, dist2 FROM (
    SELECT id, ivec, norm2, cid, dist2,
           ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist2, cid) AS rn
    FROM (
      SELECT n.id, n.ivec, n.norm2, c.cid, {dist2("n", "c")} AS dist2
      FROM normed n CROSS JOIN {prev} c
    )
  ) WHERE rn = 1
)""")
        if t == n_iter + 1:
            break  # final pass only assigns; no update follows
        parts.append(f""",
m{t} AS MATERIALIZED (
  SELECT cid, d AS pos,
         CAST(FLOOR(CAST(SUM(ivec[d]) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM a{t}, UNNEST(GENERATE_SERIES(1, LEN(ivec))) AS g(d)
  GROUP BY cid, d
),
c{t} AS MATERIALIZED (
  SELECT p.cid, COALESCE(u.cvec, p.cvec) AS cvec
  FROM {prev} p LEFT JOIN (
    SELECT cid, LIST(m ORDER BY pos) AS cvec FROM m{t} GROUP BY cid
  ) u ON p.cid = u.cid
)""")
    parts.append(f"""
SELECT cid, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(dist2) AS BIGINT) AS inertia
FROM a{n_iter + 1} GROUP BY cid
""")
    return "".join(parts)


ML_KMEANS_SQL = _kmeans_sql()


def sim_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return lsh_bucket(emb, "vec_id", "embedding", num_planes=8)


SIM_LSH_SQL = f"""
WITH q AS (
  SELECT vec_id AS id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
contrib AS (
  SELECT id, p.p AS p,
         SUM(ivec[d] * ({_md5_long_sql("CONCAT(p.p, '_', d - 1)", 48)} % 2001 - 1000)) AS dot
  FROM q, UNNEST(GENERATE_SERIES(1, LEN(ivec))) AS g(d), (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS p) p
  GROUP BY id, p.p
)
SELECT id, CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << CAST(p AS INT)) ELSE 0 END) AS BIGINT) AS bucket
FROM contrib GROUP BY id
"""


def d_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a cosine threshold, via the
    scale path: multi-table LSH candidates (equi-join on (tbl, bucket)) →
    exact quantized-cosine verification. The oracle mirrors the candidate
    generation exactly, so the check covers the whole LSH pipeline. P=3/T=16
    is the measured 99.6 %-recall setting for τ=0.35 at sf0.01 (see
    ``d_embed_neardup_exact`` for the recall baseline)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.35,
        candidates="lsh", num_planes=3, num_tables=16,
    )


D_EMBED_NEARDUP_SQL = f"""
WITH q AS (
  SELECT vec_id AS id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS (
  SELECT id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
),
contrib AS (
  SELECT id, p.p AS p,
         SUM(ivec[d] * ({_md5_long_sql("CONCAT(p.p, '_', d - 1)", 48)} % 2001 - 1000)) AS dot
  FROM q, UNNEST(GENERATE_SERIES(1, LEN(ivec))) AS g(d), (SELECT UNNEST(GENERATE_SERIES(0, 47)) AS p) p
  GROUP BY id, p.p
),
buckets AS (
  SELECT id, CAST(p // 3 AS INT) AS tbl,
         CAST(SUM(CASE WHEN dot > 0 THEN (1::BIGINT << CAST(p % 3 AS INT)) ELSE 0 END) AS BIGINT) AS bucket
  FROM contrib GROUP BY id, p // 3
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM buckets a JOIN buckets b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.id < b.id
)
SELECT id_a AS a_id, id_b AS b_id,
       CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
            i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
         / (SQRT(a.norm2) * SQRT(b.norm2)) AS cosine
FROM cand JOIN normed a ON a.id = id_a JOIN normed b ON b.id = id_b
WHERE CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
           i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
        / (SQRT(a.norm2) * SQRT(b.norm2)) >= 0.35
"""


def d_embed_neardup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-pairs exactness oracle for near-dup (a<b triangle, O(n²)) — kept
    as the recall baseline next to the LSH default above."""
    emb = read_table(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, "vec_id", "embedding", threshold=0.35, candidates="all_pairs"
    )


D_EMBED_NEARDUP_EXACT_SQL = """
WITH q AS (
  SELECT vec_id AS id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS (
  SELECT id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
)
SELECT a.id AS a_id, b.id AS b_id,
       CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
            i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
         / (SQRT(a.norm2) * SQRT(b.norm2)) AS cosine
FROM normed a JOIN normed b ON a.id < b.id
WHERE CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
           i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
        / (SQRT(a.norm2) * SQRT(b.norm2)) >= 0.35
"""


# --- multimodal metadata -------------------------------------------------------------

def mm_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Treat document text payloads as opaque binary media and compute the
    codec-free metadata contract; aggregate per source."""
    docs = read_table(spark, sf_dir, "documents").withColumn(
        "payload", F.col("text").cast("binary")
    )
    meta = attach_media_metadata(docs, "payload", "text/plain")
    return meta.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("media_meta.byte_len")).alias("total_bytes"),
        F.countDistinct(F.col("media_meta.digest")).alias("n_distinct_payloads"),
    )


MM_META_SQL = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(OCTET_LENGTH(CAST(text AS BLOB))) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT md5(text)) AS n_distinct_payloads
FROM documents GROUP BY source
"""


# --- multimodal image dimensions (real header parse) ---------------------------------

def mm_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG/JPEG dimension extraction, no codec library.

    Synthesizes a deterministic image payload per document (even doc_id →
    PNG, odd → JPEG with a JFIF APP0 plus an APP1 segment whose PAYLOAD
    contains an embedded 0xFFC0 — the byte pattern that defeats naive
    hex-regex scans), then parses width/height back out of the binary with
    the native-expression parsers in operators.multimodal. The oracle
    recomputes the planted dimensions arithmetically, so any parse slip
    (offset, endianness, segment-walk bug) hash-mismatches.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    w = (F.col("doc_id") % 1000 + 1).cast("long")
    h = ((F.col("doc_id") * 7) % 800 + 1).cast("long")
    be32 = lambda c: F.lpad(F.hex(c), 8, "0")  # noqa: E731
    be16 = lambda c: F.lpad(F.hex(c), 4, "0")  # noqa: E731
    png_hex = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),  # sig + IHDR len/tag
        be32(w),
        be32(h),
        F.lit("0806000000"),  # bit depth 8, RGBA, deflate, adaptive, no interlace
    )
    jpeg_hex = F.concat(
        F.lit(
            "FFD8"  # SOI
            "FFE000104A46494600010100004800480000"  # APP0 JFIF, len 16
            "FFE1000845FFC0006600"  # APP1, len 8: payload embeds FF C0 (regex trap)
            "FFC00011" "08"  # SOF0, len 17, precision 8
        ),
        be16(h),
        be16(w),
        F.lit("03011100021101031101" + "FFD9"),  # 3 components + EOI
    )
    payload = F.unhex(F.when(F.col("doc_id") % 2 == 0, png_hex).otherwise(jpeg_hex))
    meta = attach_media_metadata(docs.withColumn("payload", payload), "payload", "image")
    return meta.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("png")).otherwise(F.lit("jpeg")).alias("fmt"),
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )


MM_IMAGE_DIMS_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       CAST(doc_id % 1000 + 1 AS INTEGER) AS width,
       CAST((doc_id * 7) % 800 + 1 AS INTEGER) AS height
FROM documents
"""


# --- multimodal audio/video metadata (real WAV/GIF walks) ----------------------------

def mm_av_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real WAV sample-rate/frame-count and animated-GIF frame-count
    extraction, no codec library.

    Synthesizes a deterministic payload per document (even doc_id → PCM WAV
    with a planted sample rate / frame count, odd → animated GIF with a
    planted number of image descriptors), then parses the metadata back out
    of the binary with the native RIFF-chunk / GIF-block walks in
    operators.multimodal (attach_media_metadata's media_meta struct). The
    oracle recomputes the planted values arithmetically, so any walk slip
    (chunk offset, little-endian field, sub-block skip) hash-mismatches.
    """
    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    le16 = lambda c: F.concat_ws(  # noqa: E731
        "", F.lpad(F.hex(c % 256), 2, "0"), F.lpad(F.hex((c / 256).cast("long") % 256), 2, "0")
    )
    le32 = lambda c: F.concat_ws(  # noqa: E731
        "",
        F.lpad(F.hex(c % 256), 2, "0"),
        F.lpad(F.hex((c / 256).cast("long") % 256), 2, "0"),
        F.lpad(F.hex((c / 65536).cast("long") % 256), 2, "0"),
        F.lpad(F.hex((c / 16777216).cast("long") % 256), 2, "0"),
    )
    # WAV plant: rate 8000..36000, mono/stereo 16-bit, 100..149 sample frames.
    rate = (F.lit(8000) + (F.col("doc_id") % 8) * 4000).cast("long")
    channels = (F.lit(1) + F.col("doc_id") % 2).cast("long")
    block_align = (channels * 2).cast("long")
    n_samples = (F.lit(100) + F.col("doc_id") % 50).cast("long")
    data_len = (n_samples * block_align).cast("long")
    wav_hex = F.concat(
        F.lit("52494646"), le32(F.lit(36).cast("long") + data_len), F.lit("57415645"),
        F.lit("666D7420"), le32(F.lit(16).cast("long")), F.lit("0100"), le16(channels),
        le32(rate), le32(rate * block_align), le16(block_align), F.lit("1000"),
        F.lit("64617461"), le32(data_len), F.repeat(F.lit("00"), data_len.cast("int")),
    )
    # GIF plant: 1..7 frames, each a 2x2 frame with a 1-byte LZW sub-block,
    # plus a graphic-control extension per frame (exercises the 0x21 path).
    n_frames = (F.lit(1) + F.col("doc_id") % 7).cast("long")
    frame_hex = F.lit(
        "21F9040400000000"  # graphic control ext: 0x21 0xF9 size=4 ... terminator 0
        "2C" + "0000" + "0000" + "0200" + "0200" + "00"  # image desc 2x2, no LCT
        "02" + "0101" + "00"  # lzw min code 2; one 1-byte sub-block; terminator
    )
    gif_hex = F.concat(
        F.lit("474946383961" + "0200" + "0200" + "00" + "00" + "00"),  # header+LSD
        F.repeat(frame_hex, n_frames.cast("int")),
        F.lit("3B"),
    )
    payload = F.unhex(F.when(F.col("doc_id") % 2 == 0, wav_hex).otherwise(gif_hex))
    meta = attach_media_metadata(docs.withColumn("payload", payload), "payload", "av")
    return meta.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("wav")).otherwise(F.lit("gif")).alias("fmt"),
        F.col("media_meta.n_frames").alias("n_frames"),
        F.col("media_meta.sample_rate").alias("sample_rate"),
    )


MM_AV_META_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'wav' ELSE 'gif' END AS fmt,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 100 + doc_id % 50
                 ELSE 1 + doc_id % 7 END AS INTEGER) AS n_frames,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 8000 + (doc_id % 8) * 4000
                 ELSE NULL END AS INTEGER) AS sample_rate
FROM documents
"""


# --- corpus word rarity (frequency-join quality signal) ------------------------------

def t_word_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass corpus-frequency scoring: build the corpus word-frequency
    table, join it back to each document's words, and score documents by the
    mean corpus count of their words (low mean ⇒ rare/unusual vocabulary —
    the cheap stand-in for LM-perplexity quality filters; no log so the
    arithmetic stays engine-exact: integer sums / counts).

    Scale shape: the frequency table is vocabulary-sized (≪ corpus) and
    broadcastable; the per-doc pass is one explode + equi-join + hash agg.
    """
    from cehrbert_data_spark.operators.text import words

    docs = read_table(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(words(F.col("text"))).alias("word")
    )
    freq = doc_words.groupBy("word").agg(F.count(F.lit(1)).alias("wf"))
    return (
        doc_words.join(F.broadcast(freq), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("wf").alias("sum_wf"),
            (F.sum("wf").cast("double") / F.count(F.lit(1))).alias("mean_wf"),
            F.min("wf").alias("rarest_wf"),
        )
    )


T_WORD_RARITY_SQL = """
WITH dw AS (
  SELECT doc_id, w.word AS word
  FROM (SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS ws FROM documents),
       UNNEST(ws) AS w(word)
),
freq AS (SELECT word, COUNT(*) AS wf FROM dw GROUP BY word)
SELECT doc_id, COUNT(*) AS n_words,
       CAST(SUM(wf) AS BIGINT) AS sum_wf,
       CAST(CAST(SUM(wf) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_wf,
       MIN(wf) AS rarest_wf
FROM dw JOIN freq USING (word)
GROUP BY doc_id
"""


# --- text cleaning -------------------------------------------------------------------

def t_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scrubbed corpus + removal accounting per source: cleaned length and a
    digest of the cleaned text (proves byte-identical cleaning across
    engines), aggregated so the result is compact at any SF."""
    from cehrbert_data_spark.operators.text import clean_text

    docs = read_table(spark, sf_dir, "documents")
    cleaned = docs.select(
        "source",
        F.length("text").alias("len_raw"),
        F.length(clean_text(F.col("text"))).alias("len_clean"),
        F.md5(clean_text(F.col("text"))).alias("digest"),
    )
    return cleaned.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("len_raw").alias("total_raw"),
        F.sum("len_clean").alias("total_clean"),
        F.countDistinct("digest").alias("n_distinct_clean"),
    )


T_CLEAN_SQL = """
WITH c AS (
  SELECT source, LENGTH(text) AS len_raw,
         TRIM(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(text,
              'https?://[^\\s]+', ' ', 'g'),
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', ' ', 'g'),
              '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]', ' ', 'g'),
              '\\s+', ' ', 'g')) AS cleaned
  FROM documents
)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(len_raw) AS BIGINT) AS total_raw,
       CAST(SUM(LENGTH(cleaned)) AS BIGINT) AS total_clean,
       COUNT(DISTINCT md5(cleaned)) AS n_distinct_clean
FROM c GROUP BY source
"""


# --- sequence packing + stratified sampling ------------------------------------------

def t_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining sequence packing, chunked form: concatenate each source's
    documents in doc_id order and cut every ``max_tokens`` tokens (documents
    may straddle chunk boundaries — the standard packing for causal LM
    pretraining with cross-document attention masking). Emits each doc's
    first chunk and offset within it.

    Scale shape: one window partitioned BY SOURCE (shards are per-source;
    the engine refuses global windows) — a single shuffle, running sums
    inside. Token counts are the whitespace+regex tokenizer's, exact in both
    engines."""
    from cehrbert_data_spark.operators.text import regex_tokens

    max_tokens = 2048
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(regex_tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum("n_tokens").over(w)
    start = (running - F.col("n_tokens")).cast("long")
    return docs.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.floor(start / max_tokens).cast("long").alias("chunk_id"),
        (start % max_tokens).cast("long").alias("chunk_offset"),
    )


T_PACK_SQL = """
WITH t AS (
  SELECT doc_id, source,
         LEN(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, source, n_tokens,
         SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(FLOOR(start / 2048) AS BIGINT) AS chunk_id,
       CAST(start % 2048 AS BIGINT) AS chunk_offset
FROM r
"""


def t_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep ~20% of each source's
    documents by an md5-derived uniform hash of doc_id — reproducible across
    engines, runs and cluster layouts (unlike rand()-based sampling), which
    is what makes dataset mixes auditable. Returns kept docs with their
    stratum and the hash used for the cut."""
    from cehrbert_data_spark.operators.text import md5_long

    u = md5_long(F.col("doc_id").cast("string"), bits=40) % 1000
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", "source", u.alias("bucket"))
        .where(F.col("bucket") < 200)
    )


T_STRATIFIED_SQL = """
SELECT doc_id, source,
       CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT) % 1000 AS bucket
FROM documents
WHERE CAST(('0x' || SUBSTRING(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT) % 1000 < 200
"""


def t_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted Bernoulli sample: P(keep) = min(1, 0.4 * n_chars /
    max(n_chars)) — sampling docs proportional to size approximates a
    uniform sample over the corpus's CONTENT (chars/tokens) rather than
    its document count. Membership is the operator's integer md5
    inequality: exact, engine-portable, reshuffle-invariant."""
    from cehrbert_data_spark.operators.sampling import weighted_sample

    docs = read_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", 2, 5, seed="ws").select(
        "doc_id", "source", "n_chars"
    )


# Mirrors the operator bit-for-bit: u = first 15 hex digits of
# md5('ws:' || id) in [0, 2^60); keep iff u*maxw*5 < 2^60*n_chars*2,
# evaluated in HUGEINT (DuckDB's int128 — the dual of Spark's
# DECIMAL(38,0) path).
T_WEIGHTED_SQL = f"""
WITH mw AS (SELECT MAX(n_chars) AS maxw FROM documents)
SELECT doc_id, source, n_chars
FROM documents, mw
WHERE CAST({_md5_long_sql("'ws:' || CAST(doc_id AS VARCHAR)")} AS HUGEINT) * maxw * 5
      < CAST(1152921504606846976 AS HUGEINT) * n_chars * 2
"""


# --- embedding column analytics ------------------------------------------------------

def e_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension stats over the embedding corpus (the sanity pass any
    vector pipeline runs before indexing: dead dims, scale drift). posexplode
    keeps dims with their positions; sums run on the quantized-int values
    (order-independent — exact across partitionings and engines), min/max on
    the raw values (no arithmetic, so float→double renders identically)."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select(F.posexplode("embedding").alias("dim", "x"))
    q = F.round(F.col("x").cast("double") * 1000).cast("long")
    return (
        ex.groupBy("dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(q).alias("sum_q"),
            (F.sum(q).cast("double") / F.count(F.lit(1))).alias("mean_q"),
            F.min(F.col("x").cast("double")).alias("min_x"),
            F.max(F.col("x").cast("double")).alias("max_x"),
        )
    )


E_DIM_STATS_SQL = """
WITH e AS (
  SELECT i - 1 AS dim, embedding[i] AS x
  FROM embeddings, UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(i)
),
q AS (SELECT dim, x, CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT) AS xq FROM e)
SELECT dim, COUNT(*) AS n, CAST(SUM(xq) AS BIGINT) AS sum_q,
       CAST(CAST(SUM(xq) AS BIGINT) AS DOUBLE) / COUNT(*) AS mean_q,
       MIN(CAST(x AS DOUBLE)) AS min_x, MAX(CAST(x AS DOUBLE)) AS max_x
FROM q GROUP BY dim
"""


# --- skew mitigation (exact results, salted physical distribution) -------------------

def k_salted_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted count over a low-cardinality hot key (every
    event_type is a hot group at scale). Results are EXACT — salting only
    respreads the physical key distribution — which is what makes this
    oracle-checkable unlike sketch-based skew workarounds."""
    from cehrbert_data_spark.operators.skew import salted_count

    ev = read_table(spark, sf_dir, "events")
    return salted_count(ev, ["event_type"]).select(
        "event_type", F.col("count").alias("n_rows")
    )


K_SALTED_COUNT_SQL = """
SELECT event_type, COUNT(*) AS n_rows FROM events GROUP BY event_type
"""


# --- incremental dedup (new batch vs corpus) -----------------------------------------

def d_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-vs-corpus near-dup candidates (operators/dedup.py
    minhash_dedup_against): odd doc_ids act as the incoming increment, even
    doc_ids as the persisted corpus — the production ingest shape where
    only the new side's signatures are computed per run."""
    from cehrbert_data_spark.operators.dedup import minhash_dedup_against

    docs = read_table(spark, sf_dir, "documents")
    new = docs.where(F.col("doc_id") % 2 == 1)
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    return minhash_dedup_against(
        new, corpus, "doc_id", "text", k=3, num_hashes=16, band_size=2
    )


def _minhash_incremental_sql() -> str:
    from cehrbert_data_spark.operators.dedup import (
        MINHASH_P,
        minhash_coefficients,
    )

    coeffs = minhash_coefficients(16)
    mins = ",\n         ".join(
        f"MIN(({a} * x + {b}) % {MINHASH_P}) AS mh_{h}"
        for h, (a, b) in enumerate(coeffs)
    )
    band_cases = " ".join(
        f"WHEN {b} THEN CAST(mh_{2 * b} AS VARCHAR) || ',' || CAST(mh_{2 * b + 1} AS VARCHAR)"
        for b in range(8)
    )
    return f"""
WITH w AS (
  SELECT doc_id AS id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT DISTINCT id, ARRAY_TO_STRING(words[i:i+2], ' ') AS shingle
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 2
),
hashed AS (
  SELECT id, {_md5_long_sql('shingle')} % {MINHASH_P} AS x FROM sh
),
sig AS (
  SELECT id,
         {mins}
  FROM hashed GROUP BY id
),
banded AS (
  SELECT id, b.band AS band,
         CASE b.band {band_cases} END AS band_key
  FROM sig, (SELECT UNNEST(GENERATE_SERIES(0, 7)) AS band) b
)
SELECT n.id AS new_id, c.id AS corpus_id, COUNT(*) AS n_bands
FROM banded n JOIN banded c
  ON n.band = c.band AND n.band_key = c.band_key
WHERE n.id % 2 = 1 AND c.id % 2 = 0
GROUP BY n.id, c.id
"""


D_INCREMENTAL_SQL = _minhash_incremental_sql()


# --- semantic dedup (SemDeDup-style, embedding clusters) -----------------------------

def d_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup over embeddings (operators/dedup.py
    semantic_dedup): deterministic IVF clustering, then within-list
    cosine >= threshold marks duplicates anchored to the smallest id."""
    from cehrbert_data_spark.operators.dedup import semantic_dedup

    vecs = read_table(spark, sf_dir, "embeddings")
    return semantic_dedup(vecs, "vec_id", "embedding", threshold=0.35, centroid_mod=64)


D_SEMANTIC_SQL = """
WITH q AS (
  SELECT vec_id AS id, LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
normed AS (
  SELECT id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM q
),
centroids AS (
  SELECT id AS cid, ivec AS cvec, norm2 AS cnorm2 FROM normed WHERE id % 64 = 0
),
assigned AS (
  SELECT id, cid FROM (
    SELECT n.id, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY n.id
             ORDER BY CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(n.ivec)),
                           i -> n.ivec[i] * c.cvec[i])) AS DOUBLE)
                      / (SQRT(n.norm2) * SQRT(c.cnorm2)) DESC,
                      c.cid ASC
           ) AS probe_rank
    FROM normed n CROSS JOIN centroids c
  ) WHERE probe_rank = 1
),
members AS (
  SELECT a.id, a.cid, n.ivec, n.norm2
  FROM assigned a JOIN normed n ON a.id = n.id
),
anchors AS (
  SELECT b.id, MIN(a.id) AS dup_of
  FROM members a JOIN members b ON a.cid = b.cid AND a.id < b.id
  WHERE CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(a.ivec)),
             i -> a.ivec[i] * b.ivec[i])) AS DOUBLE)
          / (SQRT(a.norm2) * SQRT(b.norm2)) >= 0.35
  GROUP BY b.id
)
SELECT m.id, m.cid, an.dup_of, an.dup_of IS NOT NULL AS is_dup
FROM members m LEFT JOIN anchors an ON m.id = an.id
"""


# --- PII detection + scrubbing -------------------------------------------------------

def t_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection and scrubbing (operators/text.py pii_counts /
    scrub_pii): plants deterministic doc_id-derived PII (email / phone /
    SSN / IPv4) into each document, counts matches with native
    ``regexp_count`` and scrubs with chained ``regexp_replace`` — all
    codegen, no Python. The oracle rebuilds the same augmented text and
    applies the same RE2/Java-compatible patterns, so any count or
    replacement divergence (pattern dialect, scrub order, global-flag
    slip) hash-mismatches on the scrubbed digest."""
    from cehrbert_data_spark.operators.text import pii_counts, scrub_pii

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(d % 3 == 0, F.format_string(" user%d@example.com", d)).otherwise(F.lit("")),
        F.when(d % 4 == 0, F.format_string(
            " %03d-%03d-%04d", d % 700 + 200, d % 900 + 100, d % 9000 + 1000
        )).otherwise(F.lit("")),
        F.when(d % 5 == 0, F.format_string(
            " %03d-%02d-%04d", d % 900 + 100, d % 90 + 10, d % 9000 + 1000
        )).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.format_string(
            " 10.%d.%d.%d", d % 256, (d * 3) % 256, (d * 7) % 256
        )).otherwise(F.lit("")),
    )
    counts = pii_counts(aug)
    return docs.select(
        "doc_id",
        counts["email"].alias("n_email"),
        counts["phone"].alias("n_phone"),
        counts["ssn"].alias("n_ssn"),
        counts["ipv4"].alias("n_ipv4"),
        F.md5(scrub_pii(aug)).alias("scrub_digest"),
    )


T_PII_SQL = r"""
WITH aug AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN printf(' user%d@example.com', doc_id) ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN printf(' %03d-%03d-%04d', doc_id % 700 + 200,
                             doc_id % 900 + 100, doc_id % 9000 + 1000) ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN printf(' %03d-%02d-%04d', doc_id % 900 + 100,
                             doc_id % 90 + 10, doc_id % 9000 + 1000) ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN printf(' 10.%d.%d.%d', doc_id % 256,
                             (doc_id * 3) % 256, (doc_id * 7) % 256) ELSE '' END
           AS t
  FROM documents
)
SELECT doc_id,
       CAST(LEN(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
       CAST(LEN(regexp_extract_all(t, '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS INTEGER) AS n_phone,
       CAST(LEN(regexp_extract_all(t, '\b\d{3}-\d{2}-\d{4}\b')) AS INTEGER) AS n_ssn,
       CAST(LEN(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INTEGER) AS n_ipv4,
       md5(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
             '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IPV4>', 'g')
       ) AS scrub_digest
FROM aug
"""


# --- repetition quality signals (Gopher-style) ---------------------------------------

def t_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals (top-2-gram fraction, duplicate-
    2-gram fraction) — the quality gate corpus pipelines apply before
    training; computed in the explode + two-keyed-shuffles form that
    survives arbitrarily long documents (operators/text.py
    repetition_features)."""
    from cehrbert_data_spark.operators.text import repetition_features

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_features(docs, "doc_id", "text", k=2)


T_REPETITION_SQL = """
WITH w AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
grams AS (
  SELECT doc_id, ARRAY_TO_STRING(words[i:i+1], ' ') AS gram
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 1
),
per_gram AS (
  SELECT doc_id, gram, COUNT(*) AS n FROM grams GROUP BY doc_id, gram
)
SELECT doc_id,
       CAST(MAX(n) AS DOUBLE) / SUM(n) AS rep_top_ngram_frac,
       CAST(SUM(CASE WHEN n > 1 THEN n ELSE 0 END) AS DOUBLE) / SUM(n)
         AS rep_dup_ngram_frac,
       CAST(SUM(n) AS BIGINT) AS rep_n_ngrams
FROM per_gram GROUP BY doc_id
"""


# --- multimodal full decode (real codecs through the mapInPandas seam) ---------------

def mm_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full media DECODE — not just header metadata: synthesizes a
    deterministic 24-bit BMP (even doc_id) or PCM-WAV (odd) payload per
    document with planted pixel/sample values, then runs it through
    :func:`operators.multimodal.decode_media` — the Arrow-batched
    ``mapInPandas`` seam — with the real pure-numpy codecs
    (operators/codecs.py decode_bmp/decode_wav). The oracle recomputes the
    planted statistics arithmetically, so any decode slip (stride, BGR
    order, bottom-up rows, int16 framing) hash-mismatches. Constant
    pixel/sample values keep mean and RMS IEEE-exact in both engines
    (n·v/n and sqrt(v²) round-trip exactly when v is representable).
    """
    from cehrbert_data_spark.operators.codecs import stats_media_decoder
    from cehrbert_data_spark.operators.multimodal import decode_media
    from pyspark.sql import types as T

    docs = read_table(spark, sf_dir, "documents").select("doc_id")
    hex2 = lambda c: F.lpad(F.hex(c % 256), 2, "0")  # noqa: E731
    le16 = lambda c: F.concat(hex2(c), hex2((c / 256).cast("long")))  # noqa: E731
    le32 = lambda c: F.concat(  # noqa: E731
        hex2(c),
        hex2((c / 256).cast("long")),
        hex2((c / 65536).cast("long")),
        hex2((c / 16777216).cast("long")),
    )
    # BMP plant: 4xH, all three channels = v everywhere -> mean_pixel = v.
    # Width 4 makes the row stride exactly 12 bytes (no padding ambiguity).
    v = (F.col("doc_id") % 251).cast("long")
    bmp_h = (F.lit(1) + F.col("doc_id") % 8).cast("long")
    bmp_pix_len = (bmp_h * 12).cast("long")
    bmp_hex = F.concat(
        F.lit("424D"), le32(F.lit(54).cast("long") + bmp_pix_len),  # BM + file size
        F.lit("00000000"), le32(F.lit(54).cast("long")),  # reserved + pixel offset
        le32(F.lit(40).cast("long")), le32(F.lit(4).cast("long")), le32(bmp_h),
        F.lit("0100"), F.lit("1800"),  # planes 1, bpp 24
        le32(F.lit(0).cast("long")), le32(bmp_pix_len),  # BI_RGB, image size
        F.lit("00000000" * 4),  # ppm x/y, colors, important
        F.repeat(hex2(v), bmp_pix_len.cast("int")),
    )
    # WAV plant: mono 16-bit, constant sample s -> rms = s exactly.
    rate = (F.lit(8000) + (F.col("doc_id") % 8) * 1000).cast("long")
    n_samp = (F.lit(100) + F.col("doc_id") % 50).cast("long")
    s = (F.col("doc_id") % 1000).cast("long")
    data_len = (n_samp * 2).cast("long")
    wav_hex = F.concat(
        F.lit("52494646"), le32(F.lit(36).cast("long") + data_len), F.lit("57415645"),
        F.lit("666D7420"), le32(F.lit(16).cast("long")), F.lit("0100"), F.lit("0100"),
        le32(rate), le32(rate * 2), F.lit("0200"), F.lit("1000"),
        F.lit("64617461"), le32(data_len), F.repeat(le16(s), n_samp.cast("int")),
    )
    payload = F.unhex(F.when(F.col("doc_id") % 2 == 0, bmp_hex).otherwise(wav_hex))
    with_payload = docs.withColumn("payload", payload)
    out_schema = T.StructType(
        list(with_payload.schema.fields)
        + [
            T.StructField("decoded_width", T.IntegerType(), True),
            T.StructField("decoded_height", T.IntegerType(), True),
            T.StructField("mean_pixel", T.DoubleType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("sample_rate", T.LongType(), True),
            T.StructField("rms", T.DoubleType(), True),
        ]
    )
    decoded = decode_media(
        with_payload, "payload", decoder=stats_media_decoder, out_schema=out_schema
    )
    return decoded.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("bmp")).otherwise(F.lit("wav")).alias("fmt"),
        "decoded_width", "decoded_height", "mean_pixel",
        "n_samples", "sample_rate", "rms",
    )


MM_MEDIA_DECODE_SQL = """
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'bmp' ELSE 'wav' END AS fmt,
       CASE WHEN doc_id % 2 = 0 THEN 4 END AS decoded_width,
       CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 8 AS INTEGER) END AS decoded_height,
       CASE WHEN doc_id % 2 = 0 THEN CAST(doc_id % 251 AS DOUBLE) END AS mean_pixel,
       CASE WHEN doc_id % 2 = 1 THEN CAST(100 + doc_id % 50 AS BIGINT) END AS n_samples,
       CASE WHEN doc_id % 2 = 1 THEN CAST(8000 + (doc_id % 8) * 1000 AS BIGINT) END AS sample_rate,
       CASE WHEN doc_id % 2 = 1 THEN CAST(doc_id % 1000 AS DOUBLE) END AS rms
FROM documents
"""


def t_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: score every non-eval document's 3-gram
    containment against the src0 'benchmark' slice (GPT-3/PaLM-style n-gram
    leak check — asymmetric containment, NOT pairwise Jaccard)."""
    from cehrbert_data_spark.operators.dedup import contamination_scores

    docs = read_table(spark, sf_dir, "documents")
    eval_df = docs.where(F.col("source") == "src0")
    train_df = docs.where(F.col("source") != "src0")
    return contamination_scores(
        train_df, eval_df, "doc_id", "text", k=3, threshold=0.5
    ).withColumnRenamed("id", "doc_id")


T_CONTAMINATION_SQL = f"""
WITH w AS (
  SELECT doc_id AS id, source, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT DISTINCT id, source, ARRAY_TO_STRING(words[i:i+2], ' ') AS shingle
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 2
),
eval_set AS (
  SELECT DISTINCT {_md5_long_sql('shingle')} AS digest FROM sh WHERE source = 'src0'
),
train AS (
  SELECT id, {_md5_long_sql('shingle')} AS digest FROM sh WHERE source != 'src0'
),
scored AS (
  SELECT t.id, COUNT(*) AS n_ngrams,
         CAST(SUM(CASE WHEN e.digest IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
  FROM train t LEFT JOIN eval_set e ON t.digest = e.digest
  GROUP BY t.id
)
SELECT id AS doc_id, n_ngrams, n_hits,
       CAST(n_hits AS DOUBLE) / n_ngrams AS contam_ratio,
       CAST(n_hits AS DOUBLE) / n_ngrams >= 0.5 AS flagged
FROM scored
"""


def d_dup_ngram_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level duplicated-n-gram fraction per document (Lee et al.
    dedup signal): two hash-aggs + one digest equi-join, never n² pairs."""
    from cehrbert_data_spark.operators.dedup import dup_ngram_rates

    docs = read_table(spark, sf_dir, "documents")
    return dup_ngram_rates(docs, "doc_id", "text", k=3).withColumnRenamed(
        "id", "doc_id"
    )


D_DUP_NGRAM_SQL = f"""
WITH w AS (
  SELECT doc_id AS id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
sh AS (
  SELECT DISTINCT id, ARRAY_TO_STRING(words[i:i+2], ' ') AS shingle
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 2
),
hashed AS (SELECT id, {_md5_long_sql('shingle')} AS digest FROM sh),
docfreq AS (SELECT digest, COUNT(*) AS df FROM hashed GROUP BY digest)
SELECT h.id AS doc_id, COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
       CAST(SUM(CASE WHEN f.df >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_rate,
       MAX(f.df) AS max_df
FROM hashed h JOIN docfreq f ON h.digest = f.digest
GROUP BY h.id
"""


def d_remove_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup (Lee et al. EXACTSUBSTR re-expressed
    relationally, operators/dedup.py:remove_duplicated_ngrams): strip every
    token covered by a 5-gram occurring >= 2 times corpus-wide; returns the
    rewritten text plus before/after token accounting. Composes with doc-
    level near-dup removal — this cleans boilerplate INSIDE unique docs."""
    from cehrbert_data_spark.operators.dedup import remove_duplicated_ngrams

    docs = read_table(spark, sf_dir, "documents")
    out = remove_duplicated_ngrams(
        docs.select("doc_id", "text"), "doc_id", "text", n=5, min_count=2,
        out_col="text_out",
    )
    return out.select("doc_id", "n_tokens", "n_kept", "text_out")


D_REMOVE_DUP_SQL = f"""
WITH w AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
tok AS (
  SELECT doc_id, i AS pos, words[i] AS word
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
),
grams AS (
  SELECT doc_id, i AS pos,
         {_md5_long_sql("ARRAY_TO_STRING(words[i:i+4], ' ')")} AS digest
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(words))) AS g(i)
  WHERE i <= LEN(words) - 4
),
dups AS (SELECT digest FROM grams GROUP BY digest HAVING COUNT(*) >= 2),
spans AS (SELECT g.doc_id, g.pos FROM grams g JOIN dups USING (digest)),
covered AS (
  SELECT DISTINCT s.doc_id, c.p AS pos
  FROM spans s, UNNEST(GENERATE_SERIES(s.pos, s.pos + 4)) AS c(p)
),
kept AS (
  SELECT t.doc_id, t.pos, t.word
  FROM tok t LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.pos = c.pos
  WHERE c.pos IS NULL
),
rebuilt AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         STRING_AGG(word, ' ' ORDER BY pos) AS text_out
  FROM kept GROUP BY doc_id
)
SELECT w.doc_id, CAST(LEN(w.words) AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(r.text_out, '') AS text_out
FROM w LEFT JOIN rebuilt r USING (doc_id)
"""


def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memory-compressed ANN: product-quantization codes (4 subspaces,
    deterministic codebook) scored by asymmetric distance — all-BIGINT."""
    from cehrbert_data_spark.operators.similarity import pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return pq_topk(
        emb, queries, "vec_id", "embedding", k=5, num_subspaces=4, centroid_mod=64
    )


SIM_PQ_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS id,
         LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
subvecs AS (
  SELECT id, m.m AS m, ivec[(LEN(ivec) // 4) * m.m + 1 : (LEN(ivec) // 4) * (m.m + 1)] AS sv
  FROM q, (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS m) m
),
centroids AS (
  SELECT id AS cid, m AS cm, sv AS cv FROM subvecs WHERE id % 64 = 0
),
assigned AS (
  SELECT id, m, cid AS code FROM (
    SELECT s.id, s.m, c.cid,
           ROW_NUMBER() OVER (
             PARTITION BY s.id, s.m
             ORDER BY LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(s.sv)),
                      i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) ASC, c.cid ASC
           ) AS rn
    FROM subvecs s JOIN centroids c ON s.m = c.cm
  ) WHERE rn = 1
),
lut AS (
  SELECT s.id AS q_id, s.m, c.cid AS code,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(s.sv)),
              i -> (s.sv[i] - c.cv[i]) * (s.sv[i] - c.cv[i]))) AS BIGINT) AS qd2
  FROM subvecs s JOIN centroids c ON s.m = c.cm
  WHERE s.id < 5
),
scored AS (
  SELECT l.q_id, a.id AS n_id, CAST(SUM(l.qd2) AS BIGINT) AS adist2
  FROM assigned a JOIN lut l ON a.m = l.m AND a.code = l.code
  WHERE a.id != l.q_id
  GROUP BY l.q_id, a.id
)
SELECT q_id, n_id, adist2, rank FROM (
  SELECT q_id, n_id, adist2,
         ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist2 ASC, n_id ASC) AS rank
  FROM scored
) WHERE rank <= 5
"""


# --- dataset composition: domain mixing + vocabulary coverage ------------------------

def t_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic resampling of four sources to a 4:3:2:1 target mix —
    the largest corpus achievable without oversampling any domain, each
    domain keeping its md5-smallest documents (auditable, engine-portable).
    Integer quota arithmetic end-to-end; see operators/sampling.py."""
    from cehrbert_data_spark.operators.sampling import domain_mix_sample

    docs = read_table(spark, sf_dir, "documents")
    kept = domain_mix_sample(
        docs, "doc_id", "source", {"src0": 4, "src1": 3, "src2": 2, "src3": 1}
    )
    return kept.select(
        F.col("id").alias("doc_id"), F.col("domain").alias("source"), "rk", "quota"
    )


T_DOMAIN_MIX_SQL = """
WITH w(source, wt) AS (VALUES ('src0', 4), ('src1', 3), ('src2', 2), ('src3', 1)),
c AS (
  SELECT d.source, w.wt, COUNT(*) AS n
  FROM documents d JOIN w ON d.source = w.source
  GROUP BY d.source, w.wt
),
t AS (SELECT MIN((n * 10) // wt) AS cap FROM c),
q AS (SELECT source, (wt * cap) // 10 AS quota FROM c, t),
r AS (
  SELECT d.doc_id, d.source,
         ROW_NUMBER() OVER (
           PARTITION BY d.source
           ORDER BY CAST(('0x' || SUBSTRING(md5(CAST(d.doc_id AS VARCHAR)), 1, 10)) AS BIGINT),
                    d.doc_id
         ) AS rk
  FROM documents d JOIN w ON d.source = w.source
)
SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk, CAST(q.quota AS BIGINT) AS quota
FROM r JOIN q ON r.source = q.source
WHERE r.rk <= q.quota
"""


def t_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokenizer vocabulary with cumulative corpus coverage (the
    curve a vocab size is chosen from). Global top-k via TakeOrdered, rank +
    cumulative sums via a broadcast triangular self-join on the 20-row
    result — no global window. Coverage is one BIGINT/BIGINT division."""
    from cehrbert_data_spark.operators.sampling import vocab_top_coverage

    docs = read_table(spark, sf_dir, "documents")
    return vocab_top_coverage(docs, "text", k=20)


T_VOCAB_COVERAGE_SQL = """
WITH tok AS (
  SELECT UNNEST(regexp_extract_all(text, '[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS token
  FROM documents
),
f AS (SELECT token, COUNT(*) AS freq FROM tok GROUP BY token),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS total_tokens FROM f),
topk AS (SELECT token, freq FROM f ORDER BY freq DESC, token ASC LIMIT 20)
SELECT a.token, CAST(a.freq AS BIGINT) AS freq,
       CAST(COUNT(*) AS BIGINT) AS rank,
       CAST(SUM(b.freq) AS BIGINT) AS cum_freq,
       tot.total_tokens,
       CAST(CAST(SUM(b.freq) AS BIGINT) AS DOUBLE) / tot.total_tokens AS coverage
FROM topk a
JOIN topk b ON (b.freq > a.freq) OR (b.freq = a.freq AND b.token <= a.token)
CROSS JOIN tot
GROUP BY a.token, a.freq, tot.total_tokens
"""


def sim_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval: MMR greedy re-rank of the exact top-20 cosine
    pool per query (vec_id < 5), k=5, lam/mu = 0.7/0.3. The greedy chain is
    sequential per query, so it runs in applyInPandas over the bounded
    candidate pool; the oracle unrolls the same 5 argmax steps in SQL (the
    int-dot/sqrt arithmetic is IEEE-identical on both sides)."""
    from cehrbert_data_spark.operators.similarity import mmr_rerank

    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return mmr_rerank(emb, queries, "vec_id", "embedding", k=5, pool=20)


SIM_MMR_SQL = """
WITH normed AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding, x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS ivec
  FROM embeddings
),
n2 AS (
  SELECT vec_id, ivec,
         LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(ivec)), i -> ivec[i] * ivec[i])) AS norm2
  FROM normed
),
pairs AS (
  SELECT qv.vec_id AS q_id, nv.vec_id AS n_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(qv.ivec)),
              i -> qv.ivec[i] * nv.ivec[i])) AS DOUBLE)
           / (SQRT(qv.norm2) * SQRT(nv.norm2)) AS rel
  FROM n2 qv, n2 nv
  WHERE qv.vec_id < 5 AND nv.vec_id != qv.vec_id
),
cand AS (
  SELECT q_id, n_id, rel FROM (
    SELECT q_id, n_id, rel,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY rel DESC, n_id) AS rk
    FROM pairs) WHERE rk <= 20
),
sims AS (
  SELECT a.q_id, a.n_id AS a_id, b.n_id AS b_id,
         CAST(LIST_SUM(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(na.ivec)),
              i -> na.ivec[i] * nb.ivec[i])) AS DOUBLE)
           / (SQRT(na.norm2) * SQRT(nb.norm2)) AS sim
  FROM cand a
  JOIN cand b ON a.q_id = b.q_id AND a.n_id != b.n_id
  JOIN n2 na ON na.vec_id = a.n_id
  JOIN n2 nb ON nb.vec_id = b.n_id
),
s1 AS (
  SELECT q_id, n_id, rel, 0.7 * rel - 0.3 * 0.0 AS score FROM (
    SELECT q_id, n_id, rel,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY 0.7 * rel - 0.3 * 0.0 DESC, n_id) AS rk
    FROM cand) WHERE rk = 1
),
m2 AS (
  SELECT c.q_id, c.n_id, c.rel, 0.7 * c.rel - 0.3 * MAX(s.sim) AS score
  FROM cand c
  JOIN sims s ON s.q_id = c.q_id AND s.a_id = c.n_id
  JOIN s1 p ON p.q_id = s.q_id AND p.n_id = s.b_id
  WHERE NOT EXISTS (SELECT 1 FROM s1 x WHERE x.q_id = c.q_id AND x.n_id = c.n_id)
  GROUP BY c.q_id, c.n_id, c.rel
),
s2 AS (
  SELECT q_id, n_id, rel, score FROM (
    SELECT q_id, n_id, rel, score,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
    FROM m2) WHERE rk = 1
),
p3 AS (SELECT q_id, n_id FROM s1 UNION ALL SELECT q_id, n_id FROM s2),
m3 AS (
  SELECT c.q_id, c.n_id, c.rel, 0.7 * c.rel - 0.3 * MAX(s.sim) AS score
  FROM cand c
  JOIN sims s ON s.q_id = c.q_id AND s.a_id = c.n_id
  JOIN p3 p ON p.q_id = s.q_id AND p.n_id = s.b_id
  WHERE NOT EXISTS (SELECT 1 FROM p3 x WHERE x.q_id = c.q_id AND x.n_id = c.n_id)
  GROUP BY c.q_id, c.n_id, c.rel
),
s3 AS (
  SELECT q_id, n_id, rel, score FROM (
    SELECT q_id, n_id, rel, score,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
    FROM m3) WHERE rk = 1
),
p4 AS (SELECT q_id, n_id FROM p3 UNION ALL SELECT q_id, n_id FROM s3),
m4 AS (
  SELECT c.q_id, c.n_id, c.rel, 0.7 * c.rel - 0.3 * MAX(s.sim) AS score
  FROM cand c
  JOIN sims s ON s.q_id = c.q_id AND s.a_id = c.n_id
  JOIN p4 p ON p.q_id = s.q_id AND p.n_id = s.b_id
  WHERE NOT EXISTS (SELECT 1 FROM p4 x WHERE x.q_id = c.q_id AND x.n_id = c.n_id)
  GROUP BY c.q_id, c.n_id, c.rel
),
s4 AS (
  SELECT q_id, n_id, rel, score FROM (
    SELECT q_id, n_id, rel, score,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
    FROM m4) WHERE rk = 1
),
p5 AS (SELECT q_id, n_id FROM p4 UNION ALL SELECT q_id, n_id FROM s4),
m5 AS (
  SELECT c.q_id, c.n_id, c.rel, 0.7 * c.rel - 0.3 * MAX(s.sim) AS score
  FROM cand c
  JOIN sims s ON s.q_id = c.q_id AND s.a_id = c.n_id
  JOIN p5 p ON p.q_id = s.q_id AND p.n_id = s.b_id
  WHERE NOT EXISTS (SELECT 1 FROM p5 x WHERE x.q_id = c.q_id AND x.n_id = c.n_id)
  GROUP BY c.q_id, c.n_id, c.rel
),
s5 AS (
  SELECT q_id, n_id, rel, score FROM (
    SELECT q_id, n_id, rel, score,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY score DESC, n_id) AS rk
    FROM m5) WHERE rk = 1
)
SELECT q_id, n_id, CAST(1 AS BIGINT) AS mmr_rank, rel AS relevance, score AS mmr_score FROM s1
UNION ALL
SELECT q_id, n_id, CAST(2 AS BIGINT), rel, score FROM s2
UNION ALL
SELECT q_id, n_id, CAST(3 AS BIGINT), rel, score FROM s3
UNION ALL
SELECT q_id, n_id, CAST(4 AS BIGINT), rel, score FROM s4
UNION ALL
SELECT q_id, n_id, CAST(5 AS BIGINT), rel, score FROM s5
"""


def t_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling: pick the 100 non-English documents whose
    hashed-unigram distribution looks most like the English target set.
    Integer bit-length log quantization keeps the score engine-exact
    (operators/sampling.py:dsir_select)."""
    from cehrbert_data_spark.operators.sampling import dsir_select

    docs = read_table(spark, sf_dir, "documents")
    return dsir_select(
        docs, "doc_id", "text", F.col("lang") == "en", k=100, n_buckets=4096
    )


T_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang = 'en' AS tgt,
         UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS token
  FROM documents
),
b AS (
  SELECT doc_id, tgt, {_md5_long_sql('token', 40)} % 4096 AS bucket FROM toks
),
c AS (
  SELECT bucket,
         SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS cnt_t,
         SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS cnt_b
  FROM b GROUP BY bucket
),
w AS (
  SELECT bucket,
         (LENGTH(bin(cnt_t + 1)) - 1) - (LENGTH(bin(cnt_b + 1)) - 1) AS w_bits
  FROM c
)
SELECT b.doc_id AS id, CAST(SUM(w.w_bits) AS BIGINT) AS score_bits,
       CAST(COUNT(*) AS BIGINT) AS n_toks
FROM b JOIN w USING (bucket)
WHERE NOT b.tgt
GROUP BY b.doc_id
ORDER BY score_bits DESC, id
LIMIT 100
"""


def t_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by exact-integer TF-IDF
    (operators/text.py:tfidf_topk)."""
    from cehrbert_data_spark.operators.text import tfidf_topk

    docs = read_table(spark, sf_dir, "documents")
    return tfidf_topk(docs, "doc_id", "text", k=3, idf_scale=1024)


T_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id,
         UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
dfreq AS (SELECT term, COUNT(*) AS df_docs FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         CAST(dfreq.df_docs AS BIGINT) AS df_docs,
         CAST(tf.tf * (LENGTH(bin((n.n_docs * 1024) // dfreq.df_docs)) - 1) AS BIGINT)
           AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
)
SELECT doc_id, term, tf, df_docs, score, rk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term) AS BIGINT) AS rk
  FROM scored
) WHERE rk <= 3
"""


def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 documents for the query {spark, hash, merge, window} by
    exact-integer BM25 (operators/text.py:bm25_topk) — the retrieval
    scorer topic-targeted training-data selection runs over a corpus."""
    from cehrbert_data_spark.operators.text import bm25_topk

    docs = read_table(spark, sf_dir, "documents")
    return bm25_topk(
        docs, "doc_id", "text", ["spark", "hash", "merge", "window"], k=10
    )


T_BM25_SQL = """
WITH base AS (
  SELECT doc_id,
         STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents
),
dls AS (SELECT doc_id, CAST(LEN(toks) AS BIGINT) AS dl, toks FROM base),
totals AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS total_len FROM dls),
tf AS (
  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, dl, UNNEST(toks) AS term FROM dls)
  WHERE term IN ('spark', 'hash', 'merge', 'window')
  GROUP BY doc_id, dl, term
),
wdf AS (
  SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df_t FROM tf
),
scored AS (
  SELECT doc_id, dl,
         (LENGTH(bin((t.n_docs * 1024) // df_t)) - 1)
           * ((tf * 11 * 4 * t.total_len * 1024)
              // (5 * 4 * t.total_len * tf + 6 * 1 * t.total_len
                  + 6 * 3 * dl * t.n_docs)) AS term_score
  FROM wdf CROSS JOIN totals t
)
SELECT doc_id, dl, CAST(SUM(term_score) AS BIGINT) AS score_scaled,
       CAST(COUNT(*) AS BIGINT) AS n_hit_terms
FROM scored
GROUP BY doc_id, dl
ORDER BY score_scaled DESC, doc_id
LIMIT 10
"""


def t_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self-trained bigram surprisal per document
    (operators/text.py:lm_surprisal) — the CCNet-style perplexity filter
    signal, in engine-exact integer bits."""
    from cehrbert_data_spark.operators.text import lm_surprisal

    docs = read_table(spark, sf_dir, "documents")
    return lm_surprisal(docs, "doc_id", "text", scale=1024)


T_LM_SURPRISAL_SQL = """
WITH w AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) AS g(i)
  WHERE LEN(toks) >= 2
),
db AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
wc AS (
  SELECT doc_id, bg, c,
         SUM(c) OVER (PARTITION BY bg) AS c_big,
         SUM(c) OVER (PARTITION BY SPLIT_PART(bg, ' ', 1)) AS c_pre
  FROM db
)
SELECT doc_id,
       CAST(SUM(c * (LENGTH(bin((c_pre * 1024) // c_big)) - 1)) AS BIGINT) AS bits_sum,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(CAST(SUM(c * (LENGTH(bin((c_pre * 1024) // c_big)) - 1)) AS BIGINT) AS DOUBLE)
         / CAST(SUM(c) AS BIGINT) AS bits_per_gram
FROM wc GROUP BY doc_id
"""


# --- CCNet-style head/middle/tail bucketing by LM surprisal ------------------

def t_ccnet_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition the corpus into head/middle/tail terciles of bigram-LM
    surprisal — CCNet's (Wenzek et al. 2020) quality stratification, which
    trains on 'head' (fluent) text first. Per-doc surprisal comes from
    operators/text.py:lm_surprisal in exact integer milli-bits-per-gram
    (``(bits_sum*1000) div n_bigrams``); tercile thresholds are exact order
    statistics read off an integer histogram (smallest mb with
    ``3·cum ≥ total`` / ``3·cum ≥ 2·total``) so no float quantile can
    diverge between engines.

    Scale: the per-doc stats table (doc_id + two BIGINTs) feeds two
    consumers — the threshold histogram and the labeling pass — so it is
    materialized once behind checkpoint_barrier (16 bytes/doc; the
    barrier-appropriate small shared table, NOT the corpus text) instead
    of re-running the surprisal windows per consumer. The histogram is
    vocabulary-bounded (≤ ~15k distinct mb values at 10-bit quantization);
    its map-side-combined agg collapses doc grain first, and the tercile
    scan is a ONE-ROW aggregate over the sorted bin array (the blessed
    Exchange-SinglePartition scalar-agg shape — never a global window over
    data-grain rows). The thresholds broadcast back as one row.
    """
    from cehrbert_data_spark.operators.text import lm_surprisal
    from cehrbert_data_spark.sources.writers import checkpoint_barrier

    docs = read_table(spark, sf_dir, "documents")
    s = lm_surprisal(docs, "doc_id", "text", scale=1024)
    per = checkpoint_barrier(
        s.select(
            "doc_id",
            "n_bigrams",
            F.expr("(bits_sum * 1000) div n_bigrams").alias("mb"),
        )
    )
    hist = per.groupBy("mb").agg(F.count(F.lit(1)).alias("cnt"))
    # bounded bin table → one sorted array; running-sum threshold scan as a
    # codegen'd F.aggregate over it (smallest mb with 3·cum ≥ k·total)
    packed = hist.agg(
        F.sort_array(F.collect_list(F.struct("mb", "cnt"))).alias("bins"),
        F.sum("cnt").alias("total"),
    )
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("long").alias("t33"),
        F.lit(None).cast("long").alias("t66"),
    )

    def _scan(a, x):
        cum = a["cum"] + x["cnt"]
        return F.struct(
            cum.alias("cum"),
            F.when(a["t33"].isNull() & (cum * 3 >= F.col("total")), x["mb"])
            .otherwise(a["t33"])
            .alias("t33"),
            F.when(a["t66"].isNull() & (cum * 3 >= F.col("total") * 2), x["mb"])
            .otherwise(a["t66"])
            .alias("t66"),
        )

    thresholds = packed.select(
        F.aggregate("bins", zero, _scan).alias("s")
    ).select(F.col("s.t33").alias("t33"), F.col("s.t66").alias("t66"))
    bucket = (
        F.when(F.col("mb") <= F.col("t33"), F.lit("head"))
        .when(F.col("mb") <= F.col("t66"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    labeled = per.crossJoin(F.broadcast(thresholds)).select(
        "n_bigrams", "mb", bucket.alias("bucket")
    )
    return labeled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").cast("long").alias("total_bigrams"),
        F.min("mb").cast("long").alias("min_mb"),
        F.max("mb").cast("long").alias("max_mb"),
    )


T_CCNET_SQL = """
WITH w AS (
  SELECT doc_id, STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bg
  FROM w, UNNEST(GENERATE_SERIES(1, LEN(toks) - 1)) AS g(i)
  WHERE LEN(toks) >= 2
),
db AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
wc AS (
  SELECT doc_id, bg, c,
         SUM(c) OVER (PARTITION BY bg) AS c_big,
         SUM(c) OVER (PARTITION BY SPLIT_PART(bg, ' ', 1)) AS c_pre
  FROM db
),
per AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         (CAST(SUM(c * (LENGTH(bin((c_pre * 1024) // c_big)) - 1)) AS BIGINT)
          * 1000) // CAST(SUM(c) AS BIGINT) AS mb
  FROM wc GROUP BY doc_id
),
hist AS (SELECT mb, COUNT(*) AS cnt FROM per GROUP BY mb),
h AS (
  SELECT mb, SUM(cnt) OVER (ORDER BY mb ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS total
  FROM hist
),
t AS (
  SELECT MIN(CASE WHEN cum * 3 >= total THEN mb END) AS t33,
         MIN(CASE WHEN cum * 3 >= total * 2 THEN mb END) AS t66
  FROM h
),
lab AS (
  SELECT per.n_bigrams, per.mb,
         CASE WHEN per.mb <= t.t33 THEN 'head'
              WHEN per.mb <= t.t66 THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM per, t
)
SELECT bucket, COUNT(*) AS n_docs,
       CAST(SUM(n_bigrams) AS BIGINT) AS total_bigrams,
       CAST(MIN(mb) AS BIGINT) AS min_mb,
       CAST(MAX(mb) AS BIGINT) AS max_mb
FROM lab GROUP BY bucket
"""


# --- dedup observability: per-source before/after summary --------------------

def d_dedup_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dedup impact report: docs/words before vs after,
    duplicate counts, dup ratio — the dashboard numbers a dedup stage must
    emit so corpus shrinkage is attributable (pairs with t_quality_funnel's
    per-rule attribution).

    Scale: digests (md5) shuffle, never text; one (source, digest) hash agg
    with map-side combine collapses copies first, then a per-source rollup.
    Word counts ride along as integers (copies × n_words is exact)."""
    from cehrbert_data_spark.operators.text import words

    docs = read_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.md5("text").alias("digest"),
        F.size(words(F.col("text"))).alias("n_words"),
    )
    per_digest = per.groupBy("source", "digest").agg(
        F.count(F.lit(1)).alias("copies"),
        F.min("n_words").alias("n_words"),
    )
    agg = per_digest.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_docs"),
        F.count(F.lit(1)).alias("n_unique"),
        F.sum(F.col("copies") * F.col("n_words")).cast("long").alias(
            "total_words"
        ),
        F.sum("n_words").cast("long").alias("unique_words"),
    )
    return agg.select(
        "source",
        "n_docs",
        "n_unique",
        (F.col("n_docs") - F.col("n_unique")).alias("n_dup"),
        "total_words",
        "unique_words",
        (
            (F.col("n_docs") - F.col("n_unique")).cast("double")
            / F.col("n_docs")
        ).alias("dup_ratio"),
    )


D_DEDUP_SUMMARY_SQL = """
WITH per AS (
  SELECT source, md5(text) AS digest,
         LEN(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS n_words
  FROM documents
),
pd AS (
  SELECT source, digest, COUNT(*) AS copies, MIN(n_words) AS n_words
  FROM per GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(copies) AS BIGINT) AS n_docs,
       COUNT(*) AS n_unique,
       CAST(SUM(copies) - COUNT(*) AS BIGINT) AS n_dup,
       CAST(SUM(copies * n_words) AS BIGINT) AS total_words,
       CAST(SUM(n_words) AS BIGINT) AS unique_words,
       CAST(CAST(SUM(copies) - COUNT(*) AS BIGINT) AS DOUBLE)
         / CAST(SUM(copies) AS BIGINT) AS dup_ratio
FROM pd GROUP BY source
"""


# --- word-entropy quality signal ----------------------------------------------

def t_word_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram word entropy in exact integer bits — the
    lexical-diversity signal between the funnel's crude distinct-ratio and
    the bigram LM's fluency score: low entropy = repetitive/template text,
    high = diverse vocabulary. Quantized as
    ``Σ c_w · ilog2((n·1024) div c_w)`` (bit-length log2, engine-exact;
    log2(1024) = 10-bit fixed point above the true value), normalized to
    bits-per-word by exact-int division as doubles.

    Scale: same window-over-same-shuffle shape as lm_surprisal — one
    explode, one (doc, word) hash agg (map-side combined), one doc-
    partitioned window for n, one final per-doc agg; no join, no broadcast,
    nothing corpus-sized held anywhere."""
    from pyspark.sql import Window

    from cehrbert_data_spark.operators.sketches import ilog2
    from cehrbert_data_spark.operators.text import words

    docs = read_table(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "doc_id", F.explode(words(F.lower(F.col("text")))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wd = Window.partitionBy("doc_id")
    scored = wc.withColumn("n", F.sum("c").over(wd)).withColumn(
        "bits", F.col("c") * ilog2(F.expr("(n * 1024) div c"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("bits").cast("long").alias("bits_sum"),
            F.max("n").cast("long").alias("n_words"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            "bits_sum",
            (F.col("bits_sum").cast("double") / F.col("n_words")).alias(
                "bits_per_word"
            ),
        )
    )


T_ENTROPY_SQL = """
WITH w AS (
  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(LOWER(text)), '\\s+')) AS w
  FROM documents
),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM w GROUP BY 1, 2),
s AS (
  SELECT doc_id, c, SUM(c) OVER (PARTITION BY doc_id) AS n
  FROM wc
)
SELECT doc_id,
       CAST(MAX(n) AS BIGINT) AS n_words,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(c * (LENGTH(bin((n * 1024) // c)) - 1)) AS BIGINT) AS bits_sum,
       CAST(CAST(SUM(c * (LENGTH(bin((n * 1024) // c)) - 1)) AS BIGINT) AS DOUBLE)
         / CAST(MAX(n) AS BIGINT) AS bits_per_word
FROM s GROUP BY doc_id
"""


# --- hashed linear classifier scoring (model-based quality filter) -----------

def t_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality-filter scoring
    (operators/text.py:hashed_classifier_score): fasttext/VW-style hashing
    trick — tokens hash into 4096 buckets, a broadcast weight table scores
    each doc as the length-normalized mean feature weight. The weight table
    here is a DETERMINISTIC stand-in (affine-derived from the bucket id,
    reproduced verbatim in the oracle CTE) — production feeds trained
    weights through the same operator; the hash → broadcast-join →
    map-side-combine path under test is identical. Returns logit (exact
    integer sums + IEEE divisions), not prob — exp() is not
    correctly-rounded across engines."""
    from cehrbert_data_spark.operators.text import hashed_classifier_score

    docs = read_table(spark, sf_dir, "documents")
    n_buckets = 4096
    weights = spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (((F.col("id") * F.lit(2654435761)) % F.lit(2147483647)) % F.lit(2001)
         - F.lit(1000)).cast("long").alias("w_milli"),
    )
    return hashed_classifier_score(
        docs, "doc_id", "text", weights, n_buckets=n_buckets
    ).select("doc_id", "n_tokens", "score_milli", "logit")


T_CLASSIFIER_SQL = f"""
WITH w AS (
  SELECT r.range AS bucket,
         ((r.range * 2654435761) % 2147483647) % 2001 - 1000 AS w_milli
  FROM RANGE(4096) r
),
tok AS (
  SELECT doc_id, UNNEST(STRING_SPLIT_REGEX(TRIM(text), '\\s+')) AS t
  FROM documents
),
b AS (
  SELECT doc_id, {_md5_long_sql('t')} % 4096 AS bucket FROM tok
),
s AS (
  SELECT doc_id, COUNT(*) AS n_tokens,
         SUM(COALESCE(w.w_milli, 0)) AS score_milli
  FROM b LEFT JOIN w USING (bucket) GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(score_milli AS BIGINT) AS score_milli,
       (0.0 + CAST(score_milli AS DOUBLE) / n_tokens) / 1000.0 AS logit
FROM s
"""


# --- quality funnel: first-failing-rule attribution --------------------------

def t_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source filter-funnel report: which rule removes how many docs
    (operators/text.py:quality_funnel). Rules mirror C4/Gopher-style cuts —
    length bounds, lexical diversity, stopword density — with every ratio
    compared by integer cross-multiplication (``100·distinct < 35·words``)
    so no float threshold can diverge between engines. The rules come from
    ``operators.text.default_funnel_rules``, the SAME list the
    curate_corpus app applies, so report and pipeline cannot drift."""
    from cehrbert_data_spark.operators.text import (
        default_funnel_rules,
        quality_funnel,
        words,
    )

    docs = read_table(spark, sf_dir, "documents")
    w = words(F.col("text"))
    sw = F.array(*[F.lit(s) for s in ["the", "a", "of", "and", "to", "in", "is", "it"]])
    stats = docs.select(
        "source",
        F.size(w).alias("n_words"),
        F.size(F.array_distinct(w)).alias("n_distinct"),
        F.size(F.filter(w, lambda x: F.array_contains(sw, x))).alias("n_stop"),
    )
    labeled = quality_funnel(
        stats,
        default_funnel_rules(
            F.col("n_words"), F.col("n_distinct"), F.col("n_stop")
        ),
    )
    return labeled.groupBy("source", "verdict").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").cast("long").alias("total_words"),
    )


T_FUNNEL_SQL = """
WITH w AS (
  SELECT source, STRING_SPLIT_REGEX(TRIM(text), '\\s+') AS words FROM documents
),
s AS (
  SELECT source, LEN(words) AS n_words,
         LEN(LIST_DISTINCT(words)) AS n_distinct,
         LEN(LIST_FILTER(words, x -> x IN ('the','a','of','and','to','in','is','it'))) AS n_stop
  FROM w
),
v AS (
  SELECT source, n_words,
         CASE WHEN n_words < 25 THEN 'too_short'
              WHEN n_words > 90 THEN 'too_long'
              WHEN n_distinct * 100 < n_words * 35 THEN 'low_diversity'
              WHEN n_stop * 100 > n_words * 9 THEN 'high_stopword'
              ELSE 'pass' END AS verdict
  FROM s
)
SELECT source, verdict, COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS total_words
FROM v GROUP BY 1, 2
"""


QUERIES = {
    "t_quality": (t_quality, T_QUALITY_SQL),
    "t_classifier_score": (t_classifier_score, T_CLASSIFIER_SQL),
    "t_language": (t_language, T_LANGUAGE_SQL),
    "t_fingerprint": (t_fingerprint, T_FINGERPRINT_SQL),
    "t_tokens": (t_tokens, T_TOKENS_SQL),
    "d_exact_dedup": (d_exact_dedup, D_EXACT_SQL),
    "d_embed_neardup": (d_embed_neardup, D_EMBED_NEARDUP_SQL),
    "d_embed_neardup_exact": (d_embed_neardup_exact, D_EMBED_NEARDUP_EXACT_SQL),
    "d_ngram_jaccard": (d_ngram_jaccard, D_JACCARD_SQL),
    "d_minhash_lsh": (d_minhash_lsh, D_MINHASH_SQL),
    "d_minhash_capped": (d_minhash_capped, D_MINHASH_CAPPED_SQL),
    "st_minhash_batch": (st_minhash_batch, ST_MINHASH_SQL),
    "d_dedup_groups": (d_dedup_groups, D_DEDUP_GROUPS_SQL),
    "d_minhash_verified": (d_minhash_verified, D_MINHASH_VERIFIED_SQL),
    "d_simhash": (d_simhash, D_SIMHASH_SQL),
    "sim_cosine_topk": (sim_cosine_topk, SIM_TOPK_SQL),
    "sim_lsh_buckets": (sim_lsh_buckets, SIM_LSH_SQL),
    "sim_lsh_topk": (sim_lsh_topk, SIM_LSH_TOPK_SQL),
    "sim_ivf_topk": (sim_ivf_topk, SIM_IVF_TOPK_SQL),
    "ml_kmeans": (ml_kmeans, ML_KMEANS_SQL),
    "mm_media_meta": (mm_media_meta, MM_META_SQL),
    "mm_image_dims": (mm_image_dims, MM_IMAGE_DIMS_SQL),
    "mm_av_meta": (mm_av_meta, MM_AV_META_SQL),
    "mm_media_decode": (mm_media_decode, MM_MEDIA_DECODE_SQL),
    "t_repetition": (t_repetition, T_REPETITION_SQL),
    "t_pii_scrub": (t_pii_scrub, T_PII_SQL),
    "d_incremental_dedup": (d_incremental_dedup, D_INCREMENTAL_SQL),
    "d_semantic_dedup": (d_semantic_dedup, D_SEMANTIC_SQL),
    "k_salted_count": (k_salted_count, K_SALTED_COUNT_SQL),
    "e_dim_stats": (e_dim_stats, E_DIM_STATS_SQL),
    "t_pack_chunks": (t_pack_chunks, T_PACK_SQL),
    "t_stratified_sample": (t_stratified_sample, T_STRATIFIED_SQL),
    "t_weighted_sample": (t_weighted_sample, T_WEIGHTED_SQL),
    "t_clean_text": (t_clean_text, T_CLEAN_SQL),
    "t_word_rarity": (t_word_rarity, T_WORD_RARITY_SQL),
    "t_contamination": (t_contamination, T_CONTAMINATION_SQL),
    "d_dup_ngram_rate": (d_dup_ngram_rate, D_DUP_NGRAM_SQL),
    "d_remove_dup_ngrams": (d_remove_dup_ngrams, D_REMOVE_DUP_SQL),
    "sim_pq_topk": (sim_pq_topk, SIM_PQ_TOPK_SQL),
    "t_domain_mix": (t_domain_mix, T_DOMAIN_MIX_SQL),
    "t_vocab_coverage": (t_vocab_coverage, T_VOCAB_COVERAGE_SQL),
    "sim_mmr_rerank": (sim_mmr_rerank, SIM_MMR_SQL),
    "t_dsir_sample": (t_dsir_sample, T_DSIR_SQL),
    "t_tfidf_topk": (t_tfidf_topk, T_TFIDF_SQL),
    "t_bm25_topk": (t_bm25_topk, T_BM25_SQL),
    "t_lm_surprisal": (t_lm_surprisal, T_LM_SURPRISAL_SQL),
    "t_quality_funnel": (t_quality_funnel, T_FUNNEL_SQL),
    "t_ccnet_bucket": (t_ccnet_bucket, T_CCNET_SQL),
    "d_dedup_summary": (d_dedup_summary, D_DEDUP_SUMMARY_SQL),
    "t_word_entropy": (t_word_entropy, T_ENTROPY_SQL),
}
