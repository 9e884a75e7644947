"""Multimodal binary-column plumbing: real header parsing, stubbed decode."""

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from dr_source_spark.training.multimodal import (
    decode_media,
    extract_media_metadata,
    frame_sample_plan,
    sniff_header,
    synth_media_corpus,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synth_media_corpus(docs).cache()


def test_sniff_header_png_jpeg_wav_gif():
    png = b"\x89PNG\r\n\x1a\n" + struct.pack(">II", 13, 0) + struct.pack(">II", 640, 480)
    assert sniff_header(png) == {"format": "png", "width": 640, "height": 480, "sample_rate": None}
    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    assert sniff_header(gif)["format"] == "gif" and sniff_header(gif)["width"] == 320
    # minimal JPEG with an SOF0 segment
    jpeg = b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00" + b"\xff\xc0" + struct.pack(">H", 8) + b"\x08" + struct.pack(">HH", 100, 200) + b"\x01"
    info = sniff_header(jpeg)
    assert info["format"] == "jpeg" and (info["width"], info["height"]) == (200, 100)
    assert sniff_header(b"garbage")["format"] is None
    assert sniff_header(None)["format"] is None


def test_metadata_extraction_roundtrip(spark, media):
    meta = extract_media_metadata(media)
    rows = {r.media_id: r for r in meta.collect()}
    assert rows
    for mid, r in rows.items():
        if mid % 3 == 0:
            assert r.format == "png" and r.width == 16 + mid % 64
        elif mid % 3 == 1:
            assert r.format == "gif"
        else:
            assert r.format == "wav" and r.sample_rate == 8000 + (mid % 5) * 4000
        assert r.n_bytes > 0 and len(r.payload_sha256) == 64


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(NotImplementedError):
        decode_media(media)


def test_decode_fake_is_deterministic(spark, media):
    a = {r.media_id: tuple(r.feature) for r in decode_media(media.limit(20), fake=True).collect()}
    b = {r.media_id: tuple(r.feature) for r in decode_media(media.limit(20), fake=True).collect()}
    assert a == b
    assert all(len(v) == 32 and all(0 <= x <= 1 for x in v) for v in a.values())
    # surrogate matches sha256 of payload
    row = media.limit(1).collect()[0]
    digest = hashlib.sha256(bytes(row.payload)).digest()
    assert a[row.media_id][0] == pytest.approx(digest[0] / 255.0)


def test_frame_sample_plan_shape(spark, media):
    video = media.withColumn("kind", F.lit("video"))
    plan = frame_sample_plan(video, every_n=1)
    rows = plan.collect()
    assert rows and all(r.frame_idx >= 0 for r in rows)
    assert plan.columns == ["media_id", "frame_idx", "n_bytes"]


def test_audio_chunk_plan_integer_chunking(spark):
    from dr_source_spark.training.multimodal import audio_chunk_plan, synth_media_corpus

    docs = spark.createDataFrame(
        [(2, "x" * 300), (5, "short")], "doc_id long, text string"
    )
    plan = audio_chunk_plan(synth_media_corpus(docs)).collect()
    by_media = {}
    for r in plan:
        by_media.setdefault(r.media_id, []).append(r)
    # doc 2: wav, sample_rate 8000+2*4000=16000, n_bytes=28+256=284
    # chunks = 284 // 32000 + 1 = 1
    assert len(by_media[2]) == 1 and by_media[2][0].start_sample == 0
    # doc 5: rate 8000, n_bytes 28+5=33 -> 1 chunk
    assert len(by_media[5]) == 1
    assert all(r.start_sample == r.chunk_idx * r.sample_rate for r in plan)
