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


def test_resize_media_dims_and_truncation(spark, media):
    from mldag_spark.operators.multimodal import resize_media

    out = resize_media(media, max_px=64)
    rows = {r["media_id"]: r for r in out.collect()}
    for r in media.collect():
        got = rows[r["media_id"]]
        longest = max(r["width"], r["height"])
        if longest > 64:
            assert got["width"] == r["width"] * 64 // longest
            assert got["height"] == r["height"] * 64 // longest
            assert len(got["payload"]) == (
                len(r["payload"]) * 4096 // (longest * longest)
            )
            # truncation, not mangling: output is a prefix of the input
            assert bytes(r["payload"]).startswith(bytes(got["payload"]))
        else:
            assert (got["width"], got["height"]) == (r["width"], r["height"])
            assert bytes(got["payload"]) == bytes(r["payload"])
        assert max(got["width"], got["height"]) <= max(longest, 64)


def test_resize_media_stub_raises_without_fake(spark, media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    from mldag_spark.operators.multimodal import resize_media

    with pytest.raises((PythonException, Py4JJavaError)):
        resize_media(media, max_px=64, deterministic_fake=False).collect()
