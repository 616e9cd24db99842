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


def test_media_repartition_by_payload(spark):
    df = _media(spark)
    out = media_repartition(df, "payload", target_bytes=16)
    assert out.count() == 3  # data preserved; partitioning is a plan property
