"""Multimodal plumbing: schemas, determinism, batch shape, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineer_development_spark.operators import multimodal as M
from data_engineer_development_spark.operators.similarity import cosine_topk
from data_engineer_development_spark.sources import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    return M.attach_media(
        docs.select("doc_id", F.encode("text", "utf-8").alias("blob")),
        "media_id" if "media_id" in docs.columns else "doc_id",
        "blob",
        "application/octet-stream",
    )


def test_attach_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id", "payload", "mime", "meta",
    ]
    assert media.count() == 20


def test_extract_features_deterministic(media):
    a = M.extract_features(media, dims=16)
    b = M.extract_features(media, dims=16)
    ra = {r["media_id"]: list(r["embedding"]) for r in a.collect()}
    rb = {r["media_id"]: list(r["embedding"]) for r in b.collect()}
    assert ra == rb
    assert all(len(v) == 16 for v in ra.values())


def test_features_feed_similarity_ops(media):
    feats = M.extract_features(media, dims=16).select(
        F.col("media_id").alias("vec_id"), F.col("embedding")
    )
    ids = [r["vec_id"] for r in feats.limit(2).collect()]
    topk = cosine_topk(feats, ids, k=3).collect()
    assert len(topk) == 2 * 3


def test_resize_and_frame_sample_shapes(media):
    resized = M.resize_images(media, width=8, height=8)
    rows = resized.collect()
    assert all(len(r["payload"]) == 64 for r in rows)

    frames = M.sample_frames(media, interval_ms=1000, duration_ms=3000)
    per_media = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 3 for r in per_media)
    one = frames.filter(F.col("frame_idx") == 1).first()
    assert one["ts_ms"] == 1000
    assert len(one["frame"]) == 16


def test_real_codec_path_is_gated(media):
    with pytest.raises(Exception) as ei:
        M.extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )
