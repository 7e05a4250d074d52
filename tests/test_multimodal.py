"""Multimodal plumbing: binary columns, stubbed decode, frame fan-out."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from space_launch_telemetry_analyzer_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x89PNG\r\n" + b"x" * 5000),
        (2, b"\xff\xd8\xff\xe0" + b"y" * 9000),
        (3, b"plain bytes payload"),
        (4, None),
        (5, b""),
    ]
    return spark.createDataFrame(rows, "media_id long, payload binary")


def test_media_metadata(media):
    out = {r["media_id"]: r for r in M.media_metadata(media, "media_id", "payload").collect()}
    assert out[1]["magic"] == "png" and out[1]["n_bytes"] == 5006
    assert out[2]["magic"] == "jpeg"
    assert out[3]["magic"] == "unknown"
    assert out[4]["magic"] == "empty" and out[5]["magic"] == "empty"
    assert out[3]["sha256"] == hashlib.sha256(b"plain bytes payload").hexdigest()


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x89PNG", fake=False)


def test_image_features_fake_decoder(media):
    out = {r["media_id"]: r for r in M.image_features(media, "media_id", "payload").collect()}
    ok = out[1]
    assert ok["error"] is None and 64 <= ok["width"] < 256 and len(ok["feature"]) == 16
    # deterministic: same payload -> same features
    again = {r["media_id"]: r for r in M.image_features(media, "media_id", "payload").collect()}
    assert again[1]["feature"] == ok["feature"]
    # null payload -> error row, not task failure
    assert out[4]["error"] is not None and out[4]["width"] is None


def test_sample_frames_fanout(media):
    out = M.sample_frames(media, "media_id", "payload", every_n_bytes=1024, max_frames=4)
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert sorted(by_id[1]) == [0, 1, 2, 3]  # 5006 bytes -> capped at 4 frames
    assert by_id[3] == [0]  # small payload -> 1 frame
    assert 4 not in by_id  # null payload skipped
