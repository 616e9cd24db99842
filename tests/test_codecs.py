"""Real-codec tests: BMP/PNG/WAV decode, PNG filters, resize, Spark paths.

All payloads are constructed in-test from known pixel/sample arrays, so
every decode is checked against ground truth — including PNG scanline
filters 1-4, which our encoder never emits and are therefore hand-built.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest

from cehrbert_data_spark.operators.codecs import (
    PNG_MAGIC,
    decode_bmp,
    decode_png,
    decode_wav,
    default_media_decoder,
    default_media_resizer,
    encode_bmp,
    encode_png,
    resize_nearest,
)


def _rng_image(h, w, c, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


def test_bmp_round_trip_including_stride_padding():
    # width 3 -> 9-byte rows padded to 12: exercises the 4-byte stride
    img = _rng_image(5, 3, 3)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_png_round_trip_gray_rgb_rgba():
    for c in (1, 3, 4):
        img = _rng_image(6, 4, c, seed=c)
        assert np.array_equal(decode_png(encode_png(img)), img)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Build a PNG whose scanlines use the given filter types."""
    h, w, ch = img.shape
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y, ftype in zip(range(h), filters):
        cur = img[y].reshape(-1).astype(np.int32)
        enc = np.empty_like(cur)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            enc[x] = (cur[x] - pred) % 256
        raw.append(ftype)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = cur

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ctype = {1: 0, 3: 2, 4: 6}[ch]
    return (
        PNG_MAGIC
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_decode_exactly():
    img = _rng_image(5, 4, 3, seed=11)
    payload = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert np.array_equal(decode_png(payload), img)


def test_png_unsupported_flavors_raise():
    img = _rng_image(2, 2, 3)
    payload = bytearray(encode_png(img))
    payload[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(bytes(payload))


def _wav(frames: np.ndarray, rate: int = 16000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(frames.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(frames.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_stereo():
    frames = (np.arange(40, dtype=np.int16) - 20).reshape(-1, 2)
    pcm, rate = decode_wav(_wav(frames, 22050))
    assert rate == 22050
    assert np.array_equal(pcm, frames)


def test_resize_nearest_identity_and_downscale():
    img = _rng_image(8, 8, 3)
    assert np.array_equal(resize_nearest(img, 8, 8), img)
    small = resize_nearest(img, 4, 2)
    assert small.shape == (2, 4, 3)
    assert np.array_equal(small[0, 0], img[0, 0])  # corner pixel preserved


def test_default_decoder_routes_by_magic():
    img = _rng_image(3, 5, 3)
    d = default_media_decoder(encode_png(img))
    assert (d["decoded_width"], d["decoded_height"]) == (5, 3)
    d = default_media_decoder(encode_bmp(img))
    assert (d["decoded_width"], d["decoded_height"]) == (5, 3)
    frames = np.zeros((10, 1), np.int16)
    d = default_media_decoder(_wav(frames))
    assert d["decoded_summary"] == "frames=10 rate=16000 rms=0.000"
    assert default_media_decoder(b"\x00garbage") == {}
    assert default_media_decoder(PNG_MAGIC + b"\x00trunc") == {}


def test_default_resizer_round_trips_through_bmp():
    img = _rng_image(6, 6, 4, seed=3)  # RGBA: alpha dropped
    out = default_media_resizer(encode_png(img), 3, 3)
    decoded = decode_bmp(out)
    assert decoded.shape == (3, 3, 3)
    assert np.array_equal(decoded, resize_nearest(img[:, :, :3], 3, 3))
    assert default_media_resizer(b"not-an-image", 3, 3) is None


def test_spark_decode_and_resize_real_payloads(spark):
    img_a = _rng_image(4, 6, 3, seed=1)
    img_b = _rng_image(10, 2, 1, seed=2)
    wav = _wav((np.ones((30, 1)) * 1000).astype(np.int16), 8000)
    rows = [
        (1, bytearray(encode_png(img_a))),
        (2, bytearray(encode_bmp(img_a))),
        (3, bytearray(encode_png(img_b))),
        (4, bytearray(wav)),
        (5, bytearray(b"unknown-format")),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")

    from cehrbert_data_spark.operators.multimodal import decode_media, resize_media

    decoded = {r["media_id"]: r for r in decode_media(df, "payload").collect()}
    assert decoded[1]["decoded_width"] == 6 and decoded[1]["decoded_height"] == 4
    assert decoded[2]["decoded_width"] == 6  # BMP agrees with PNG of same image
    assert decoded[1]["decoded_summary"] == decoded[2]["decoded_summary"]
    assert decoded[3]["decoded_height"] == 10
    assert decoded[4]["decoded_summary"] == "frames=30 rate=8000 rms=1000.000"
    assert decoded[5]["decoded_width"] is None
    assert decoded[6]["decoded_summary"] is None

    resized = {r["media_id"]: r["resized"] for r in resize_media(df, "payload", 3, 2).collect()}
    out = decode_bmp(bytes(resized[1]))
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out, resize_nearest(img_a, 3, 2))
    assert resized[5] is None and resized[6] is None


def test_stats_media_decoder_numeric_fields():
    from cehrbert_data_spark.operators.codecs import (
        encode_bmp,
        encode_png,
        stats_media_decoder,
    )

    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(4, 6, 3)
    for payload in (encode_bmp(img), encode_png(img)):
        d = stats_media_decoder(payload)
        assert d["decoded_width"] == 6 and d["decoded_height"] == 4
        assert d["mean_pixel"] == float(img.mean())
        assert "n_samples" not in d

    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(np.full(30, 250, np.int16).tobytes())
    d = stats_media_decoder(buf.getvalue())
    assert d == {"n_samples": 30, "sample_rate": 16000, "rms": 250.0}

    assert stats_media_decoder(b"\x00garbage") == {}
