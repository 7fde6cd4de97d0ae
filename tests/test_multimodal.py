from __future__ import annotations

import pytest

from kgpipe.multimodal import (
    FEATURE_DIM,
    decode_fn,
    extract_features,
    frame_sample_plan,
)


def _media(spark):
    rows = [
        ("m1", "image", bytearray(b"\x89PNG fake bytes"), {"w": "64", "h": "64"}),
        ("m2", "audio", bytearray(b"RIFF fake"), {"sr": "16000"}),
        ("m3", "video", None, {"n_frames": "25"}),
    ]
    return spark.createDataFrame(
        rows,
        "media_id string, modality string, payload binary, meta map<string,string>",
    )


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_fn(b"x", "image", fake=False)


def test_extract_features_fake_deterministic(spark):
    out = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert len(out["m1"].feature) == FEATURE_DIM
    assert out["m1"].n_bytes == 15
    # deterministic: same payload → same feature
    again = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert out["m1"].feature == again["m1"].feature
    assert out["m3"].n_bytes == 0


def test_extract_features_stub_quarantines(spark):
    out = extract_features(_media(spark), fake=False).collect()
    assert all(r.feature is None and "NotImplemented" not in (r.error or "x")
               and "decoding requires" in r.error for r in out)


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_media(spark), every_n=10).collect()
    assert {(r.media_id, r.frame_idx) for r in frames} == {
        ("m3", 0), ("m3", 10), ("m3", 20)
    }
