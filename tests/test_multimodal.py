"""Multimodal plumbing tests: metadata, Arrow decode/resize paths with
injected fake codecs, frame sampling, payload-sized partitioning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.multimodal import (
    attach_media_metadata,
    decode_media,
    frame_sample_plan,
    media_repartition,
    resize_media,
)


def _media(spark):
    rows = [(1, b"\x89PNG-fake-1"), (2, b"\x89PNG-fake-22"), (3, None)]
    return spark.createDataFrame(rows, "media_id: long, payload: binary")


def test_attach_media_metadata(spark):
    out = attach_media_metadata(_media(spark), "payload", "image")
    rows = {r["media_id"]: r["media_meta"] for r in out.collect()}
    assert rows[1]["media_type"] == "image"
    assert rows[1]["byte_len"] == 11 and rows[2]["byte_len"] == 12
    assert rows[1]["digest"] != rows[2]["digest"]


def test_decode_media_default_decoder_handles_unknown(spark):
    # default decoder: unknown formats yield NULL fields, not failures
    out = decode_media(_media(spark), "payload")
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["decoded_width"] is None
    assert rows[3]["decoded_summary"] is None


def test_decode_media_fake_decoder_arrow_path(spark):
    def fake_decoder(b: bytes) -> dict:
        return {
            "decoded_width": len(b),
            "decoded_height": len(b) * 2,
            "decoded_summary": f"img:{len(b)}",
        }

    out = decode_media(_media(spark), "payload", decoder=fake_decoder)
    rows = {r["media_id"]: r for r in out.collect()}
    assert rows[1]["decoded_width"] == 11 and rows[1]["decoded_height"] == 22
    assert rows[3]["decoded_summary"] is None  # null payload passes through


def test_resize_media_fake_resizer(spark):
    def fake_resizer(b: bytes, w: int, h: int) -> bytes:
        return b[: w]  # deterministic truncation stands in for pixel work

    out = resize_media(_media(spark), "payload", 8, 8, resizer=fake_resizer)
    rows = {r["media_id"]: r["resized"] for r in out.collect()}
    assert rows[1] == b"\x89PNG-fak" and rows[3] is None


def test_frame_sample_plan(spark):
    df = attach_media_metadata(_media(spark), "payload", "video").withColumn(
        "media_meta",
        F.col("media_meta").withField("n_frames", F.lit(90)),
    )
    out = frame_sample_plan(df, "payload", every_n=30)
    frames = sorted(
        r["frame_index"] for r in out.where("media_id = 1").collect()
    )
    assert frames == [0, 30, 60]


def _png_bytes(w: int, h: int) -> bytes:
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _jpeg_bytes(w: int, h: int, exif_trap: bool = True) -> bytes:
    """Minimal well-formed JPEG header chain. With ``exif_trap``, an APP1
    segment whose PAYLOAD contains 0xFFC0 precedes the real SOF0 — the case
    that defeats a naive first-FFC0 scan."""
    import struct

    out = b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
    if exif_trap:
        payload = b"Ex\xff\xc0if"  # embedded fake SOF marker bytes
        out += b"\xff\xe1" + struct.pack(">H", 2 + len(payload)) + payload
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    return out + b"\xff\xd9"


def test_image_dimensions_real_headers(spark):
    rows = [
        (1, _png_bytes(640, 480)),
        (2, _jpeg_bytes(1024, 768, exif_trap=True)),
        (3, _jpeg_bytes(33, 7, exif_trap=False)),
        (4, b"not an image at all"),
        (5, b"\xff\xd8\xff\xe0\x00"),  # truncated JPEG: must yield NULL, not garbage
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = attach_media_metadata(df, "payload", "image")
    got = {
        r["media_id"]: (r["media_meta"]["width"], r["media_meta"]["height"])
        for r in out.collect()
        if r["media_meta"] is not None
    }
    assert got[1] == (640, 480)
    assert got[2] == (1024, 768)  # survives the embedded-FFC0 APP1 trap
    assert got[3] == (33, 7)
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_image_dimensions_gif_bmp(spark):
    import struct

    def gif(w, h):
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00"

    def bmp(w, h):
        # 14-byte file header + BITMAPINFOHEADER(40) with signed height
        return (
            b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
            + struct.pack("<IiiHH", 40, w, h, 1, 24) + b"\x00" * 24
        )

    rows = [
        (1, gif(320, 200)),
        (2, bmp(640, 480)),
        (3, bmp(100, -50)),  # top-down BMP: negative height, |h| pixels
        (4, b"GIF8 not really"),
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = attach_media_metadata(df, "payload", "image")
    got = {
        r["media_id"]: (r["media_meta"]["width"], r["media_meta"]["height"])
        for r in out.collect()
    }
    assert got[1] == (320, 200)
    assert got[2] == (640, 480)
    assert got[3] == (100, 50)
    assert got[4] == (None, None)


def test_image_dimensions_fuzz(spark):
    """Seeded fuzz in ONE DataFrame pass: random extra APPn segments before
    SOF must not confuse the walk; random garbage must yield NULL, never a
    crash or a phantom dimension."""
    import random
    import struct

    rng = random.Random(20260813)
    rows, expected = [], {}
    mid = 0
    for _ in range(25):
        w, h = rng.randint(1, 65535), rng.randint(1, 65535)
        out = b"\xff\xd8"
        for _ in range(rng.randint(0, 5)):  # random APPn/COM segments
            marker = bytes([0xFF, rng.choice([0xE0 + rng.randint(0, 15), 0xFE])])
            payload = bytes(rng.randrange(256) for _ in range(rng.randint(0, 40)))
            out += marker + struct.pack(">H", 2 + len(payload)) + payload
        sof = rng.choice([0xC0, 0xC1, 0xC2])
        out += bytes([0xFF, sof]) + struct.pack(">H", 17) + b"\x08"
        out += struct.pack(">HH", h, w)
        out += b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01\xff\xd9"
        rows.append((mid, out))
        expected[mid] = (w, h)
        mid += 1
    for _ in range(25):  # garbage: arbitrary bytes, some FFD8-prefixed
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(0, 200)))
        if rng.random() < 0.5:
            blob = b"\xff\xd8" + blob
        rows.append((mid, blob))
        expected[mid] = None  # overwhelmingly likely; checked loosely below
        mid += 1
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    out = attach_media_metadata(df, "payload", "image")
    got = {
        r["media_id"]: (r["media_meta"]["width"], r["media_meta"]["height"])
        for r in out.collect()
    }
    for i in range(25):
        assert got[i] == expected[i], f"well-formed #{i}: {got[i]} != {expected[i]}"
    for i in range(25, 50):
        w, h = got[i]
        # random bytes may by chance form a valid chain, but must never
        # produce a half-parsed result: both NULL or both in uint16 range
        assert (w is None and h is None) or (0 <= w <= 65535 and 0 <= h <= 65535)


def test_media_repartition_by_payload(spark):
    df = _media(spark)
    out = media_repartition(df, "payload", target_bytes=16)
    assert out.count() == 3  # data preserved; partitioning is a plan property


def _wav_bytes(rate, channels, n_samples, extra_chunk=False, bits=16):
    """Assemble a PCM WAV with optional odd-sized pre-fmt chunk (pad rule)."""
    import struct as _s

    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    chunks = b""
    if extra_chunk:  # odd-length LIST chunk before fmt: exercises word padding
        payload = b"INFOx"  # 5 bytes -> pad byte required
        chunks += b"LIST" + _s.pack("<I", len(payload)) + payload + b"\x00"
    chunks += (
        b"fmt " + _s.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits)
    )
    chunks += b"data" + _s.pack("<I", len(data)) + data
    return b"RIFF" + _s.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _gif_bytes(n_frames, gct=False, lct=False):
    """Animated GIF: optional global/local color tables, per-frame GCE."""
    import struct as _s

    packed = 0x80 | 0x00 if gct else 0  # GCT flag, size bits 0 -> 2 entries
    out = b"GIF89a" + _s.pack("<HH", 2, 2) + bytes([packed, 0, 0])
    if gct:
        out += b"\x00" * 6  # 3 * 2^(0+1) = 6 bytes
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x04\x00\x00\x00\x00"  # graphic control ext
        ipacked = 0x80 if lct else 0
        out += b"\x2c" + _s.pack("<HHHH", 0, 0, 2, 2) + bytes([ipacked])
        if lct:
            out += b"\x00" * 6
        out += b"\x02\x01\x01\x00"  # lzw min code, one sub-block, terminator
    return out + b"\x3b"


def test_wav_gif_av_metadata(spark):
    from cehrbert_data_spark.operators.multimodal import attach_media_metadata

    rows = [
        (0, _wav_bytes(44100, 2, 1234)),
        (1, _wav_bytes(8000, 1, 55, extra_chunk=True)),  # fmt not first + pad
        (2, _gif_bytes(1)),
        (3, _gif_bytes(5, gct=True)),
        (4, _gif_bytes(3, gct=True, lct=True)),
        (5, _wav_bytes(16000, 1, 10)[:20]),  # truncated WAV -> NULLs
        (6, _gif_bytes(4)[:-1]),  # GIF missing trailer -> NULL count
        (7, b"RIFFxxxxWAVE"),  # RIFF/WAVE magic but no chunks
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {
        r["media_id"]: (r["media_meta"]["n_frames"], r["media_meta"]["sample_rate"])
        for r in attach_media_metadata(df, "payload", "av").collect()
    }
    assert got[0] == (1234, 44100)
    assert got[1] == (55, 8000)
    assert got[2] == (1, None)
    assert got[3] == (5, None)
    assert got[4] == (3, None)
    assert got[5] == (None, None)
    assert got[6] == (None, None)
    assert got[7] == (None, None)
