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


def test_decode_media_requires_decoder(spark):
    with pytest.raises(NotImplementedError, match="decoder"):
        decode_media(_media(spark), "payload")


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
    with pytest.raises(NotImplementedError, match="resizer"):
        resize_media(_media(spark), "payload", 8, 8)

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
