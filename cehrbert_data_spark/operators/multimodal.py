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


def _be_int(col: F.Column, pos, n: int) -> F.Column:
    """Big-endian unsigned int from ``n`` bytes at 1-indexed ``pos`` — pure
    native exprs (substr→hex→conv), stays in whole-stage codegen."""
    pos_col = F.lit(pos) if isinstance(pos, int) else pos
    return F.conv(F.hex(col.substr(pos_col, F.lit(n))), 16, 10).cast("long")


def is_png(col: F.Column) -> F.Column:
    """PNG magic: the fixed 8-byte signature + the IHDR chunk tag at 13-16
    (PNG spec §5.2/§11.2.2 — IHDR is required to be the first chunk)."""
    return (F.hex(col.substr(F.lit(1), F.lit(8))) == "89504E470D0A1A0A") & (
        F.hex(col.substr(F.lit(13), F.lit(4))) == "49484452"
    )


def is_jpeg(col: F.Column) -> F.Column:
    """JPEG magic: SOI marker FFD8."""
    return F.hex(col.substr(F.lit(1), F.lit(2))) == "FFD8"


def png_width(col: F.Column) -> F.Column:
    """IHDR width: big-endian uint32 at bytes 17-20 (1-indexed)."""
    return _be_int(col, 17, 4)


def png_height(col: F.Column) -> F.Column:
    """IHDR height: big-endian uint32 at bytes 21-24 (1-indexed)."""
    return _be_int(col, 21, 4)


def jpeg_sof_offset(col: F.Column, max_segments: int = 64) -> F.Column:
    """1-indexed byte offset of the SOF0/SOF1/SOF2 marker, or NULL.

    A JPEG header is a chain of FF-marker segments each carrying its own
    2-byte length; the frame dimensions live in the SOF segment, so finding
    them requires walking the chain (a hex-regex would false-positive on
    FFC0 bytes inside EXIF payloads). The walk is a single higher-order
    ``F.aggregate`` over a runtime sequence — evaluated iteratively per row
    (NOT an unrolled expression tree), JVM-side, no Python worker. Walks at
    most ``max_segments`` segments and bails to NULL on anything malformed
    (non-FF byte where a marker belongs, SOS/EOI before any SOF, truncated
    payload), so arbitrary binary garbage can never mis-parse.
    """
    init = F.struct(
        F.lit(3).cast("long").alias("pos"), F.lit(0).cast("long").alias("sof")
    )

    def step(acc, _):
        b0 = _be_int(col, acc.pos, 1)  # must be 0xFF
        marker = _be_int(col, acc.pos + 1, 1)
        seg_len = _be_int(col, acc.pos + 2, 2)
        done = (acc.sof > 0) | acc.pos.isNull()
        bad = (
            b0.isNull()
            | (b0 != 0xFF)
            | marker.isNull()
            | marker.isin(0xD9, 0xDA)  # EOI / SOS: header region over
            | seg_len.isNull()
            | (seg_len < 2)
        )
        found = marker.isin(0xC0, 0xC1, 0xC2) & ~bad
        new_sof = F.when(done, acc.sof).when(found, acc.pos).otherwise(F.lit(0))
        new_pos = (
            F.when(done | found, acc.pos)
            .when(bad, F.lit(None).cast("long"))
            .otherwise(acc.pos + 2 + seg_len)
        )
        return F.struct(new_pos.alias("pos"), new_sof.alias("sof"))

    state = F.aggregate(F.sequence(F.lit(1), F.lit(max_segments)), init, step)
    return F.when(state.sof > 0, state.sof)


def jpeg_width(col: F.Column) -> F.Column:
    """SOF frame width: big-endian uint16 at SOF+7 (FF C? LL LL PP HH HH WW WW)."""
    return _be_int(col, jpeg_sof_offset(col) + 7, 2)


def jpeg_height(col: F.Column) -> F.Column:
    """SOF frame height: big-endian uint16 at SOF+5."""
    return _be_int(col, jpeg_sof_offset(col) + 5, 2)


def _le_int(col: F.Column, pos: int, n: int) -> F.Column:
    """Little-endian unsigned int from ``n`` bytes at 1-indexed ``pos``."""
    out = _be_int(col, pos, 1)
    for i in range(1, n):
        out = out + _be_int(col, pos + i, 1) * (256 ** i)
    return out


def is_gif(col: F.Column) -> F.Column:
    """Full 6-byte GIF87a / GIF89a magic (a 4-byte 'GIF8' prefix check
    false-positives on text beginning with those characters)."""
    return F.hex(col.substr(F.lit(1), F.lit(6))).isin("474946383761", "474946383961")


def is_bmp(col: F.Column) -> F.Column:
    """BMP 'BM' magic + plausible BITMAPINFOHEADER size field (40/108/124)."""
    return (F.hex(col.substr(F.lit(1), F.lit(2))) == "424D") & _le_int(col, 15, 4).isin(
        40, 108, 124
    )


def gif_width(col: F.Column) -> F.Column:
    """Logical-screen width: uint16 LE at bytes 7-8."""
    return _le_int(col, 7, 2)


def gif_height(col: F.Column) -> F.Column:
    """Logical-screen height: uint16 LE at bytes 9-10."""
    return _le_int(col, 9, 2)


def bmp_width(col: F.Column) -> F.Column:
    """BITMAPINFOHEADER biWidth: int32 LE at bytes 19-22."""
    return _le_int(col, 19, 4)


def bmp_height(col: F.Column) -> F.Column:
    """biHeight: int32 LE at bytes 23-26 (absolute value — negative encodes
    top-down row order, same pixel dimensions)."""
    h = _le_int(col, 23, 4)
    # two's-complement int32: interpret then abs
    signed = F.when(h >= F.lit(2**31), h - F.lit(2**32)).otherwise(h)
    return F.abs(signed)


def image_dimensions(col: F.Column) -> tuple[F.Column, F.Column]:
    """(width, height) for PNG / JPEG / GIF / BMP payloads, NULL otherwise.

    Real header parses with native expressions — no codec library needed
    (PNG IHDR fixed offsets; JPEG SOF segment walk; GIF logical screen;
    BMP info header). CASE branches evaluate lazily per row, so non-image
    payloads never pay the JPEG walk.
    """
    w = (
        F.when(is_png(col), png_width(col))
        .when(is_jpeg(col), jpeg_width(col))
        .when(is_gif(col), gif_width(col))
        .when(is_bmp(col), bmp_width(col))
    )
    h = (
        F.when(is_png(col), png_height(col))
        .when(is_jpeg(col), jpeg_height(col))
        .when(is_gif(col), gif_height(col))
        .when(is_bmp(col), bmp_height(col))
    )
    return w.cast("int"), h.cast("int")


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Codec-free metadata: byte length + md5 digest (native exprs), plus
    REAL width/height parsed from PNG/JPEG headers when the payload's magic
    bytes match (NULL otherwise — audio/video framing still needs an
    injected decoder, see :func:`decode_media`)."""
    payload = F.col(binary_col)
    width, height = image_dimensions(payload)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(payload).alias("digest"),
            width.alias("width"),
            height.alias("height"),
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
