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


def test_decode_dispatch_without_fake():
    # images and audio decode for real now: bad bytes are a decode ERROR
    with pytest.raises(ValueError):
        decode_fn(b"\x89PNG not supported", "image", fake=False)
    with pytest.raises(ValueError):
        decode_fn(b"RIFF", "audio", fake=False)
    # video decoder genuinely absent: still the declared stub
    with pytest.raises(NotImplementedError):
        decode_fn(b"x", "video", fake=False)


def _ppm_p6(arr):
    import numpy as np

    h, w, _ = arr.shape
    return (f"P6 {w} {h} 255\n".encode()
            + np.asarray(arr, dtype=np.uint8).tobytes())


def _bmp24(arr):
    """Minimal bottom-up 24-bit BMP from an (h, w, 3) RGB array."""
    import struct

    import numpy as np

    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = b""
    for y in range(h - 1, -1, -1):
        row = bytes(
            int(v) for x in range(w)
            for v in (arr[y, x, 2], arr[y, x, 1], arr[y, x, 0])  # BGR
        )
        rows += row + b"\x00" * (stride - len(row))
    pixel_off = 14 + 40
    file_size = pixel_off + len(rows)
    return (b"BM" + struct.pack("<IHHI", file_size, 0, 0, pixel_off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows),
                          2835, 2835, 0, 0) + rows)


def test_decode_image_real_formats():
    import numpy as np

    from kgpipe.multimodal import decode_image, grid_features

    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    luma = (rgb @ np.array([0.299, 0.587, 0.114])) / 255.0

    for payload in (_ppm_p6(rgb), _bmp24(rgb)):
        lum = decode_image(payload)
        assert lum.shape == (8, 8)
        assert np.allclose(lum, luma, atol=1.5 / 255)
        feats = grid_features(lum)
        assert len(feats) == FEATURE_DIM
        # 4x4 pooling over 8x8 = mean of each 2x2 block
        want = luma.reshape(4, 2, 4, 2).mean(axis=(1, 3)).ravel()
        assert np.allclose(feats, want, atol=1.5 / 255)

    # grayscale P5 + ASCII P2 with comments
    gray = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    p5 = f"P5 5 4 255\n".encode() + gray.tobytes()
    p2 = ("P2\n# comment\n5 4\n255\n"
          + " ".join(str(v) for v in gray.ravel())).encode()
    assert np.allclose(decode_image(p5), gray / 255.0)
    assert np.allclose(decode_image(p2), gray / 255.0)

    with pytest.raises(ValueError):
        decode_image(b"P6 4 4 255\nshort")  # truncated pixel data
    with pytest.raises(ValueError):
        decode_image(b"")


def _wav(samples, sr=8000, bits=16, channels=1, audio_format=1):
    """Minimal RIFF/WAVE writer from a float array in [-1, 1]."""
    import struct

    import numpy as np

    x = np.asarray(samples, dtype=np.float64)
    if channels > 1:
        x = np.repeat(x[:, None], channels, axis=1).ravel()
    if audio_format == 3:
        data = x.astype("<f4").tobytes()
    elif bits == 8:
        data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        data = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = (np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes()
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", audio_format, channels, sr, sr * block,
                      block, bits)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_decode_wav_real_formats():
    import numpy as np

    from kgpipe.multimodal import audio_features, decode_wav

    t = np.arange(800) / 8000.0
    sine = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    for kw in ({"bits": 16}, {"bits": 8}, {"bits": 32},
               {"audio_format": 3, "bits": 32}, {"bits": 16, "channels": 2}):
        mono, sr = decode_wav(_wav(sine, **kw))
        assert sr == 8000
        tol = 0.02 if kw.get("bits") == 8 else 1e-3
        assert np.allclose(mono, sine, atol=tol)
    feats = audio_features(decode_wav(_wav(sine))[0])
    assert len(feats) == FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in feats)
    # constant-amplitude sine: every temporal RMS segment ≈ 0.5/sqrt(2)
    for v in feats[:8]:
        assert abs(v - 0.5 / np.sqrt(2)) < 0.02
    # 440 Hz at sr 8000 lands in the lowest of 8 rfft bands
    assert feats[8] > 0.9 and sum(feats[8:]) == pytest.approx(1.0, abs=1e-9)

    with pytest.raises(ValueError):
        decode_wav(b"RIFX" + b"\x00" * 20)
    with pytest.raises(ValueError):
        decode_wav(_wav(sine)[:20])  # fmt/data chunks cut off
    with pytest.raises(ValueError):
        decode_wav(b"")


def test_extract_features_real_audio_end_to_end(spark):
    import numpy as np

    t = np.arange(1600) / 8000.0
    payload = _wav(0.25 * np.sin(2 * np.pi * 220.0 * t))
    media = spark.createDataFrame(
        [("wav1", "audio", bytearray(payload), None)],
        "media_id string, modality string, payload binary,"
        " meta map<string,string>",
    )
    r = extract_features(media, fake=False).first()
    assert r.error is None and len(r.feature) == FEATURE_DIM
    assert r.n_bytes == len(payload)
    assert abs(r.feature[0] - 0.25 / np.sqrt(2)) < 0.02


def test_extract_features_real_image_end_to_end(spark):
    import numpy as np

    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[:, 4:, :] = 255  # left half black, right half white
    rows = [("img1", "image", bytearray(_ppm_p6(rgb)), None),
            ("bad", "image", bytearray(b"not an image"), None),
            ("aud", "audio", bytearray(b"RIFF"), None)]
    media = spark.createDataFrame(
        rows,
        "media_id string, modality string, payload binary,"
        " meta map<string,string>",
    )
    out = {r.media_id: r for r in
           extract_features(media, fake=False).collect()}
    f = out["img1"].feature
    assert out["img1"].error is None and len(f) == FEATURE_DIM
    # row-major 4x4 grid: columns 0-1 black, 2-3 white in every row
    for i in range(0, 16, 4):
        assert f[i] < 0.01 and f[i + 1] < 0.01
        assert f[i + 2] > 0.99 and f[i + 3] > 0.99
    assert out["bad"].feature is None and "unsupported" in out["bad"].error
    assert out["aud"].feature is None and "truncated" in out["aud"].error


def test_extract_features_fake_deterministic(spark):
    out = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert len(out["m1"].feature) == FEATURE_DIM
    assert out["m1"].n_bytes == 15
    # deterministic: same payload → same feature
    again = {r.media_id: r for r in extract_features(_media(spark)).collect()}
    assert out["m1"].feature == again["m1"].feature
    assert out["m3"].n_bytes == 0


def test_extract_features_quarantines_per_row(spark):
    out = {r.media_id: r for r in
           extract_features(_media(spark), fake=False).collect()}
    assert all(r.feature is None for r in out.values())
    # image with non-image bytes: real decode error, quarantined
    assert "unsupported image format" in out["m1"].error
    # audio with truncated bytes: real decode error, quarantined
    assert "truncated" in out["m2"].error
    # video: the remaining declared stub, quarantined
    assert "decoding requires" in out["m3"].error


def test_frame_sample_plan(spark):
    frames = frame_sample_plan(_media(spark), every_n=10).collect()
    assert {(r.media_id, r.frame_idx) for r in frames} == {
        ("m3", 0), ("m3", 10), ("m3", 20)
    }


def _avi(width, height, n_frames, usec_per_frame=40000):
    """Minimal RIFF/AVI with just the avih main header."""
    import struct

    avih = struct.pack("<14I", usec_per_frame, 0, 0, 0, n_frames, 0, 1, 0,
                       width, height, 0, 0, 0, 0)
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def test_probe_payload_formats():
    import numpy as np

    from kgpipe.multimodal import probe_payload

    rgb = np.zeros((6, 9, 3), dtype=np.uint8)
    p = probe_payload(_ppm_p6(rgb))
    assert (p["format"], p["width"], p["height"]) == ("pnm", 9, 6)
    p = probe_payload(_bmp24(rgb))
    assert (p["format"], p["width"], p["height"]) == ("bmp", 9, 6)
    wav = _wav(np.zeros(1600), sr=16000, bits=16, channels=2)
    p = probe_payload(wav)
    assert (p["format"], p["sample_rate"], p["n_channels"],
            p["n_frames"]) == ("wav", 16000, 2, 1600)
    p = probe_payload(_avi(320, 240, 25))
    assert (p["format"], p["width"], p["height"], p["n_frames"]) == (
        "avi", 320, 240, 25)

    import pytest

    with pytest.raises(ValueError):
        probe_payload(b"\x00" * 32)
    with pytest.raises(ValueError):
        probe_payload(b"RIFF\x00\x00\x00\x00AVI x")  # no avih


def test_probe_media_feeds_frame_sample_plan(spark):
    """probe → meta → frame_sample_plan: the prober supplies the
    n_frames that the sampling plan explodes, end-to-end on Spark."""
    from pyspark.sql import functions as F

    from kgpipe.multimodal import frame_sample_plan, probe_media

    rows = [("v1", "video", bytearray(_avi(64, 48, 25)), None),
            ("bad", "video", bytearray(b"RIFFxxxxAVI "), None)]
    media = spark.createDataFrame(
        rows,
        "media_id string, modality string, payload binary,"
        " meta map<string,string>",
    )
    probed = {r.media_id: r for r in probe_media(media).collect()}
    assert probed["v1"].error is None and probed["v1"].n_frames == 25
    assert probed["bad"].error is not None
    enriched = media.drop("meta").join(
        probe_media(media).select(
            "media_id",
            F.create_map(F.lit("n_frames"),
                         F.col("n_frames").cast("string")).alias("meta"),
        ),
        "media_id",
    )
    got = {(r.media_id, r.frame_idx)
           for r in frame_sample_plan(enriched, every_n=10).collect()}
    assert got == {("v1", 0), ("v1", 10), ("v1", 20), ("bad", 0)}
