"""Multimodal plumbing tests: schema, Arrow batch shape, decode stub
determinism, resize meta update, frame sampling."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from imperio_patitas_etl_spark.operators.multimodal import (
    DECODED_SCHEMA,
    FEATURE_SCHEMA,
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    resize_media,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, n=30, partitions=3).cache()


def test_media_schema(media):
    assert media.schema == MEDIA_SCHEMA
    assert media.rdd.getNumPartitions() == 3


def test_decode_media(media):
    out = decode_media(media)
    assert out.schema == DECODED_SCHEMA
    rows = {r["asset_id"]: r for r in out.collect()}
    assert len(rows) == 30
    # decode parses the header the generator wrote
    for i in (0, 7, 29):
        assert rows[i]["width"] == 16 + (i % 8) * 4
        assert rows[i]["height"] == 16 + (i % 5) * 4
        assert rows[i]["n_bytes"] > 8
        assert 0.0 <= rows[i]["mean_byte"] <= 255.0


def test_decode_unknown_format_raises(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"JUNKDATA"), None)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="stubbed"):
        decode_media(bad).collect()


def test_resize_media(media):
    out = resize_media(media, 8, 8)
    assert out.schema == MEDIA_SCHEMA
    rows = out.collect()
    assert len(rows) == 30
    for r in rows[:5]:
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 8
        # re-decode the resized content: header must agree with meta
    redecoded = {r["asset_id"]: r for r in decode_media(out).collect()}
    assert all(v["width"] == 8 and v["height"] == 8 for v in redecoded.values())


def test_extract_features(media):
    out = extract_features(media, dim=8)
    assert out.schema == FEATURE_SCHEMA
    rows = {r["asset_id"]: r["features"] for r in out.collect()}
    assert len(rows) == 30
    for feats in rows.values():
        assert len(feats) == 8
        # L1-normalized histogram
        assert abs(sum(feats) - 1.0) < 1e-9
        assert all(f >= 0.0 for f in feats)
    # deterministic: same input → same vector
    again = {r["asset_id"]: r["features"] for r in extract_features(media, dim=8).collect()}
    assert rows == again


def test_sample_frames(media):
    out = sample_frames(media, every_n=10)
    rows = out.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    # 30 frames per video, every 10th → indices 0,10,20
    assert len(rows) == n_videos * 3
    assert {r["frame_idx"] for r in rows} == {0, 10, 20}
    assert all(r["frame_ref"] == f"{r['asset_id']}:{r['frame_idx']}" for r in rows)
