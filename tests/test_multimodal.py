"""Multimodal plumbing tests: schema, Arrow batching, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mldag_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    extract_features,
    frame_sample_plan,
    media_stats,
    synthesize_media,
)
from mldag_spark.queries.tables import load


@pytest.fixture()
def media(spark, sf_dir):
    return synthesize_media(
        load(spark, sf_dir, "documents").limit(50), "doc_id", "text"
    )


def test_media_schema_and_payload(spark, media):
    row = media.first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["mime"] == "image/png"
    assert row["width"] >= 32 and row["height"] >= 32


def test_extract_features_shape_and_determinism(spark, media):
    out = extract_features(media, dim=8)
    assert out.schema == FEATURE_SCHEMA
    rows1 = {r["media_id"]: r["features"] for r in out.collect()}
    rows2 = {r["media_id"]: r["features"] for r in out.collect()}
    assert rows1 == rows2                       # deterministic kernel
    assert all(len(v) == 8 for v in rows1.values())
    # byte counts match the payload
    n = {r["media_id"]: r["n_bytes"] for r in out.collect()}
    src = {r["media_id"]: len(r["payload"]) for r in media.collect()}
    assert n == src


def test_extract_features_stub_raises_without_fake(spark, media):
    out = extract_features(media, dim=4, deterministic_fake=False)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        out.collect()


def test_frame_sample_plan(spark, sf_dir):
    media = synthesize_media(
        load(spark, sf_dir, "documents").limit(10),
        "doc_id",
        "text",
        mime="video/mp4",
    )
    out = frame_sample_plan(media, every_ms=1000)
    per = (
        out.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_ts_ms").alias("last"))
        .join(media.select("media_id", "duration_ms"), "media_id")
        .collect()
    )
    for r in per:
        assert r["n"] == r["duration_ms"] // 1000 + 1
        assert r["last"] <= r["duration_ms"]


def test_media_stats_metadata_only(spark, media):
    stats = media_stats(media).collect()
    assert len(stats) == 1
    assert stats[0]["n_items"] == 50
