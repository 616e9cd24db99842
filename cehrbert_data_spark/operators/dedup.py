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

from cehrbert_data_spark.operators.text import md5_long, shingles, words


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact duplicate groups: md5(text) → (digest, n_docs, keep_id) where
    ``keep_id`` is the smallest id (the canonical representative)."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col).alias("id"))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("id").alias("keep_id"))
    )


def doc_shingles(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Distinct (id, shingle) pairs — shared base for Jaccard and MinHash."""
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(shingles(words(F.col(text_col)), k)).alias("shingle"),
        )
        .distinct()
    )


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
    """
    sh = doc_shingles(df, id_col, text_col, k)
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
    """(id, h, minhash): ``num_hashes`` seed-prefixed md5 min-hashes per doc."""
    sh = doc_shingles(df, id_col, text_col, k)
    seeds = df.sparkSession.range(num_hashes).select(F.col("id").alias("h"))
    return (
        sh.crossJoin(F.broadcast(seeds))
        .select(
            "id",
            "h",
            md5_long(F.concat_ws("|", F.col("h"), F.col("shingle"))).alias("mh"),
        )
        .groupBy("id", "h")
        .agg(F.min("mh").alias("minhash"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 16,
    band_size: int = 2,
) -> DataFrame:
    """LSH candidate pairs: band the signature, bucket-join on
    (band, band_key), emit distinct (id_a < id_b) pairs with the number of
    colliding bands (collision probability ≈ 1-(1-s^band_size)^bands)."""
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    banded = (
        sig.withColumn("band", (F.col("h") / band_size).cast("int"))
        .groupBy("id", "band")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("h"), F.col("minhash")))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
            ).alias("band_key")
        )
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 48) -> DataFrame:
    """SimHash fingerprint: sign of the per-bit weighted sum of word hashes.

    Words are weighted by their occurrence count; two documents with small
    Hamming distance between fingerprints are near-duplicates. Pure integer
    bit arithmetic (portable across engines).
    """
    word_counts = (
        df.select(
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
