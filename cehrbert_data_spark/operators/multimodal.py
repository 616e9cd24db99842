"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` columns with typed metadata alongside. The
Spark-side contract — schema, Arrow batch shape, partition sizing — is real
and tested, and so is the default codec step: ``operators.codecs`` decodes
PNG/BMP/PCM-WAV with nothing beyond zlib/wave/numpy (no codec libraries in
this environment), with an injection seam (``decoder=`` / ``resizer=``)
for library-backed codecs covering the formats stdlib can't (JPEG pixels,
video frames).

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


def jpeg_dims(col: F.Column, max_segments: int = 64) -> F.Column:
    """struct(width, height) from ONE SOF segment walk.

    ``jpeg_width``/``jpeg_height`` each embed their own walk, so using both
    runs the (interpreted, ``max_segments``-step) ``F.aggregate`` twice per
    row — the dominant per-row cost on large multimodal scans. Here the walk
    runs once and its ``finish`` lambda reads both uint16s from the found
    offset."""
    init = F.struct(
        F.lit(3).cast("long").alias("pos"), F.lit(0).cast("long").alias("sof")
    )

    def step(acc, _):
        b0 = _be_int(col, acc.pos, 1)
        marker = _be_int(col, acc.pos + 1, 1)
        seg_len = _be_int(col, acc.pos + 2, 2)
        done = (acc.sof > 0) | acc.pos.isNull()
        bad = (
            b0.isNull()
            | (b0 != 0xFF)
            | marker.isNull()
            | marker.isin(0xD9, 0xDA)
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

    def finish(acc):
        ok = acc.sof > 0
        return F.struct(
            F.when(ok, _be_int(col, acc.sof + 7, 2)).cast("int").alias("width"),
            F.when(ok, _be_int(col, acc.sof + 5, 2)).cast("int").alias("height"),
        )

    return F.aggregate(F.sequence(F.lit(1), F.lit(max_segments)), init, step, finish)


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


def is_wav(col: F.Column) -> F.Column:
    """RIFF/WAVE magic: 'RIFF' at 1-4 and 'WAVE' at 9-12."""
    return (F.hex(col.substr(F.lit(1), F.lit(4))) == "52494646") & (
        F.hex(col.substr(F.lit(9), F.lit(4))) == "57415645"
    )


def wav_meta(col: F.Column, max_chunks: int = 16) -> F.Column:
    """struct(n_frames, sample_rate) from a RIFF chunk walk — no codec.

    Walks the RIFF chunk chain (id[4] size[4LE] data[size] pad-to-even) from
    byte 13, capturing sample_rate + block_align from the 'fmt ' chunk
    (data offsets 4 and 12 — WAVEFORMAT layout) and the 'data' chunk's byte
    length; n_frames = data bytes / block align (sample frames). One
    ``F.aggregate`` walk, same technique as the JPEG SOF scan: JVM-side,
    bails to NULL fields on malformed/truncated chains, never mis-parses
    arbitrary binary."""
    total = F.length(col)
    init = F.struct(
        F.lit(13).cast("long").alias("pos"),
        F.lit(None).cast("long").alias("rate"),
        F.lit(None).cast("long").alias("align"),
        F.lit(None).cast("long").alias("dlen"),
    )

    def step(acc, _):
        done = acc.pos.isNull() | (acc.pos + 7 > total)
        cid = F.hex(col.substr(acc.pos, F.lit(4)))
        size = _le_int(col, acc.pos + 4, 4)
        is_fmt = cid == "666D7420"  # 'fmt '
        is_data = cid == "64617461"  # 'data'
        new_rate = F.when(~done & is_fmt, _le_int(col, acc.pos + 12, 4)).otherwise(acc.rate)
        new_align = F.when(~done & is_fmt, _le_int(col, acc.pos + 20, 2)).otherwise(acc.align)
        new_dlen = F.when(~done & is_data, size).otherwise(acc.dlen)
        new_pos = F.when(done, acc.pos).otherwise(acc.pos + 8 + size + (size % 2))
        return F.struct(
            new_pos.alias("pos"), new_rate.alias("rate"),
            new_align.alias("align"), new_dlen.alias("dlen"),
        )

    def finish(acc):
        frames = F.when(
            acc.dlen.isNotNull() & acc.align.isNotNull() & (acc.align > 0),
            (acc.dlen / acc.align).cast("int"),
        )
        return F.struct(
            frames.alias("n_frames"), acc.rate.cast("int").alias("sample_rate")
        )

    return F.aggregate(F.sequence(F.lit(1), F.lit(max_chunks)), init, step, finish)


def gif_frame_count(col: F.Column, max_blocks: int = 512) -> F.Column:
    """Frame count of a (possibly animated) GIF — a real block walk.

    GIF data is a chain of extension blocks (0x21, sub-block lists) and
    image descriptors (0x2C — one per frame, each with an optional local
    color table and LZW sub-block list) ending at the 0x3B trailer. The walk
    is one ``F.aggregate`` state machine (mode 0: expect block introducer;
    mode 1: skip a sub-block chain), each step consuming one structural
    element or one sub-block. Exact for payloads with ≤ ``max_blocks``
    elements (every fixture/thumbnail-sized GIF); larger or malformed
    payloads yield NULL rather than a wrong count — at 100 TB a NULL routed
    to the decoder beats a silently wrong frame count."""
    total = F.length(col)
    # GCT: packed byte 11; present iff bit7, 3 * 2^((packed&7)+1) bytes.
    packed = _be_int(col, 11, 1)
    gct = F.when(
        packed.bitwiseAND(F.lit(0x80)) > 0,
        F.lit(3) * F.pow(F.lit(2), (packed.bitwiseAND(F.lit(7)) + 1)).cast("long"),
    ).otherwise(F.lit(0).cast("long"))
    init = F.struct(
        (F.lit(14) + gct).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("frames"),
        F.lit(0).cast("long").alias("mode"),  # 0=introducer, 1=sub-blocks, 2=done
    )

    def step(acc, _):
        done = (acc.mode == 2) | acc.pos.isNull()
        trunc = acc.pos > total
        b = _be_int(col, acc.pos, 1)
        # mode 0 transitions
        m0_trailer = b == 0x3B
        m0_ext = b == 0x21
        m0_img = b == 0x2C
        img_packed = _be_int(col, acc.pos + 9, 1)
        lct = F.when(
            img_packed.bitwiseAND(F.lit(0x80)) > 0,
            F.lit(3) * F.pow(F.lit(2), (img_packed.bitwiseAND(F.lit(7)) + 1)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
        # mode 1: one sub-block per step
        sb = b
        new_pos = (
            F.when(done, acc.pos)
            .when(trunc, F.lit(None).cast("long"))
            .when(acc.mode == 1, F.when(sb == 0, acc.pos + 1).otherwise(acc.pos + 1 + sb))
            .when(m0_trailer, acc.pos)
            .when(m0_ext, acc.pos + 2)
            .when(m0_img, acc.pos + 11 + lct)  # introducer+9 desc+lzw-min-code
            .otherwise(F.lit(None).cast("long"))  # malformed
        )
        new_frames = F.when(~done & ~trunc & (acc.mode == 0) & m0_img, acc.frames + 1).otherwise(
            acc.frames
        )
        new_mode = (
            F.when(done | trunc, F.lit(2))
            .when(acc.mode == 1, F.when(sb == 0, F.lit(0)).otherwise(F.lit(1)))
            .when(m0_trailer, F.lit(2))
            .when(m0_ext | m0_img, F.lit(1))
            .otherwise(F.lit(2))
        ).cast("long")
        return F.struct(new_pos.alias("pos"), new_frames.alias("frames"), new_mode.alias("mode"))

    def finish(acc):
        # Only trust the count if the walk reached the trailer cleanly.
        ok = (acc.mode == 2) & acc.pos.isNotNull() & (_be_int(col, acc.pos, 1) == 0x3B)
        return F.when(ok, acc.frames.cast("int"))

    return F.aggregate(F.sequence(F.lit(1), F.lit(max_blocks)), init, step, finish)


def av_meta(col: F.Column) -> F.Column:
    """struct(n_frames, sample_rate) for WAV / GIF payloads, NULL fields
    otherwise. Single struct-valued CASE (same single-evaluation discipline
    as :func:`image_dims`)."""
    return (
        F.when(is_wav(col), wav_meta(col))
        .when(
            is_gif(col),
            F.struct(
                gif_frame_count(col).alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            ),
        )
        .otherwise(
            F.struct(
                F.lit(None).cast("int").alias("n_frames"),
                F.lit(None).cast("int").alias("sample_rate"),
            )
        )
    )


def image_dims(col: F.Column) -> F.Column:
    """struct(width, height) for PNG / JPEG / GIF / BMP payloads, NULL fields
    otherwise.

    Real header parses with native expressions — no codec library needed
    (PNG IHDR fixed offsets; JPEG SOF segment walk; GIF logical screen;
    BMP info header). Single struct-valued CASE so the expensive JPEG walk
    appears exactly ONCE in the expression tree (``jpeg_dims`` reads both
    uint16s from one walk); branches evaluate lazily per row, so non-image
    payloads never pay it.
    """
    return (
        F.when(
            is_png(col),
            F.struct(
                png_width(col).cast("int").alias("width"),
                png_height(col).cast("int").alias("height"),
            ),
        )
        .when(is_jpeg(col), jpeg_dims(col))
        .when(
            is_gif(col),
            F.struct(
                gif_width(col).cast("int").alias("width"),
                gif_height(col).cast("int").alias("height"),
            ),
        )
        .when(
            is_bmp(col),
            F.struct(
                bmp_width(col).cast("int").alias("width"),
                bmp_height(col).cast("int").alias("height"),
            ),
        )
        .otherwise(
            F.struct(
                F.lit(None).cast("int").alias("width"),
                F.lit(None).cast("int").alias("height"),
            )
        )
    )


def image_dimensions(col: F.Column) -> tuple[F.Column, F.Column]:
    """Back-compat tuple view of :func:`image_dims`. NOTE: referencing both
    returned columns in one projection duplicates the underlying CASE —
    pipelines should materialize :func:`image_dims` into a column once (the
    pattern ``attach_media_metadata`` uses) instead."""
    d = image_dims(col)
    return d["width"], d["height"]


def attach_media_metadata(df: DataFrame, binary_col: str, media_type: str) -> DataFrame:
    """Codec-free metadata: byte length + md5 digest (native exprs), plus
    REAL width/height parsed from PNG/JPEG/GIF/BMP headers, WAV sample-rate/
    frame-count from the RIFF chunk walk, and animated-GIF frame counts from
    the block walk — all native expressions, NULL where the magic doesn't
    match (pixel/sample DECODE still needs an injected codec, see
    :func:`decode_media`).

    The dims struct lands in its own projection before the meta struct is
    assembled: Catalyst's CollapseProject declines to inline a non-cheap
    expression referenced twice, so the JPEG segment walk runs once per row
    even though width and height are both read from it."""
    payload = F.col(binary_col)
    dims_col, av_col = "__image_dims", "__av_meta"
    return (
        df.withColumn(dims_col, image_dims(payload))
        .withColumn(av_col, av_meta(payload))
        .withColumn(
            "media_meta",
            F.struct(
                F.lit(media_type).alias("media_type"),
                F.length(payload).cast("long").alias("byte_len"),
                F.md5(payload).alias("digest"),
                F.col(f"{dims_col}.width").alias("width"),
                F.col(f"{dims_col}.height").alias("height"),
                F.col(f"{av_col}.n_frames").cast("int").alias("n_frames"),
                F.col(f"{av_col}.sample_rate").cast("int").alias("sample_rate"),
            ),
        )
        .drop(dims_col, av_col)
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

    ``decoder(payload: bytes) -> dict`` fills the decoded fields. The
    default is :func:`operators.codecs.default_media_decoder` — a real,
    pure-stdlib/numpy decode of PNG (8-bit non-interlaced), BMP (24-bit)
    and PCM WAV; unknown formats yield NULL fields. Inject a
    codec-library-backed decoder through the same seam for the formats the
    reference stack would hand to PIL/ffmpeg (JPEG, video).
    """
    if decoder is None:
        from cehrbert_data_spark.operators.codecs import default_media_decoder

        decoder = default_media_decoder
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
    pixel work; the default is
    :func:`operators.codecs.default_media_resizer` — decode (PNG/BMP) →
    nearest-neighbor resample → re-encode as 24-bit BMP, undecodable
    payloads resizing to NULL. Inject a codec-library-backed resizer for
    richer formats/filters."""
    if resizer is None:
        from cehrbert_data_spark.operators.codecs import default_media_resizer

        resizer = default_media_resizer
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
