"""Multimodal plumbing: real Spark shapes, stubbed codec."""

import pytest
from pyspark.sql import Row

from time_series_databse_engine_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        Row(media_id=1, kind="image", payload=b"\x00\x01img",
            meta=Row(width=4, height=4, sample_rate=None, duration_ms=None)),
        Row(media_id=2, kind="audio", payload=b"aud",
            meta=Row(width=None, height=None, sample_rate=16000, duration_ms=2000)),
        Row(media_id=3, kind="video", payload=b"vid",
            meta=Row(width=8, height=8, sample_rate=None, duration_ms=3000)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_fake_features_deterministic(spark):
    df = _media(spark)
    a = {r.media_id: r.features for r in extract_features(df, fake=True).collect()}
    b = {r.media_id: r.features for r in extract_features(df, fake=True).collect()}
    assert a == b
    assert all(len(v) == FEATURE_DIM for v in a.values())
    assert a[1] != a[2]


def test_real_decode_is_stubbed(spark):
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        extract_features(_media(spark), fake=False).collect()


def test_frame_sample_plan(spark):
    out = frame_sample_plan(_media(spark), every_ms=1000).collect()
    assert [r.frame_ms for r in out] == [0, 1000, 2000, 3000]
