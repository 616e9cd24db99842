"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside. The
Spark-side contract — schema, Arrow batch shape, partition sizing — is real
and tested; the actual codec step is stubbed (`decoder=None` raises
NotImplementedError; image/audio libraries are not available in this
environment) or injected as a deterministic fake in tests.

Scale notes: media rows are large — ``mapInPandas`` keeps them in Arrow
batches (no per-row pickling), and ``media_repartition`` sizes partitions by
payload bytes, not row count, so a 100 TB corpus of 1 MB images doesn't
produce 10 GB tasks.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Metadata contract for a decoded media column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),
        T.StructField("byte_len", T.LongType(), False),
        T.StructField("digest", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
    ]
)


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Cheap, codec-free metadata: byte length + md5 digest (native exprs)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(F.col(binary_col)).cast("long").alias("byte_len"),
            F.md5(F.col(binary_col)).alias("digest"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit(None).cast("int").alias("sample_rate"),
        ),
    )


def media_repartition(df: DataFrame, binary_col: str, target_bytes: int = 128 * 1024 * 1024) -> DataFrame:
    """Partition by payload volume: estimates total bytes from a 1% sample
    and repartitions so each task carries ~target_bytes of media.

    ONE driver action: the sampled scan yields total-row and sampled-byte
    counts together (count + sum over a conditional), so sizing costs a
    single pass instead of a sample pass plus a full count."""
    row = (
        df.select(
            F.when(F.rand(seed=42) < 0.01, F.length(binary_col).cast("long")).alias(
                "__sampled_b"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.avg("__sampled_b").alias("avg_b"),
        )
        .collect()[0]
    )
    avg_b = row["avg_b"] or 1.0
    n_parts = max(1, int(row["n_rows"] * avg_b / target_bytes))
    return df.repartition(n_parts)


def decode_media(
    df: DataFrame,
    binary_col: str,
    decoder: Optional[Callable[[bytes], dict]] = None,
    out_schema: T.StructType | None = None,
) -> DataFrame:
    """Decode/feature-extract media via ``mapInPandas`` (Arrow batches).

    ``decoder(payload: bytes) -> dict`` fills the decoded fields. With no
    decoder this raises NotImplementedError at plan-build time — the codec
    libraries (PIL/ffmpeg/etc.) are intentionally not assumed present; tests
    inject a deterministic fake to exercise the full Arrow path.
    """
    if decoder is None:
        raise NotImplementedError(
            "no media decoder available in this environment; inject a "
            "decoder(bytes)->dict (e.g. PIL/soundfile-backed) to decode"
        )
    schema = out_schema or T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("decoded_width", T.IntegerType(), True),
            T.StructField("decoded_height", T.IntegerType(), True),
            T.StructField("decoded_summary", T.StringType(), True),
        ]
    )
    extra_fields = [f.name for f in schema.fields if f.name not in df.columns]

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf[binary_col].map(lambda b: decoder(bytes(b)) if b is not None else {})
            for name in extra_fields:
                pdf[name] = decoded.map(lambda d: d.get(name))
            yield pdf

    return df.mapInPandas(_decode, schema)


def frame_sample_plan(df: DataFrame, binary_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: emits one row per sampled frame index
    using the (stubbed) frame count from media_meta — downstream decode
    attaches pixels. Pure relational explode; no codec required."""
    n_frames = F.coalesce(F.col("media_meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_index", F.explode(idx))


def resize_media(
    df: DataFrame,
    binary_col: str,
    width: int,
    height: int,
    resizer: Optional[Callable[[bytes, int, int], bytes]] = None,
) -> DataFrame:
    """Resize media payloads via ``mapInPandas`` (Arrow batches; no per-row
    pickling). ``resizer(payload, width, height) -> bytes`` performs the
    pixel work; with no resizer this raises NotImplementedError at
    plan-build time (the codec libraries are intentionally not assumed
    present — tests inject a deterministic fake to exercise the Arrow
    path and schema contract)."""
    if resizer is None:
        raise NotImplementedError(
            "no media resizer available in this environment; inject a "
            "resizer(bytes, w, h)->bytes (e.g. PIL-backed) to resize"
        )
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("resized", T.BinaryType(), True)]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf["resized"] = pdf[binary_col].map(
                lambda b: resizer(bytes(b), width, height) if b is not None else None
            )
            yield pdf

    return df.mapInPandas(_resize, schema)
