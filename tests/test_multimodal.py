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
    # all three modalities decode for real now: bad bytes are a decode ERROR
    with pytest.raises(ValueError):
        decode_fn(b"\x89PNG not supported", "image", fake=False)
    with pytest.raises(ValueError):
        decode_fn(b"RIFF", "audio", fake=False)
    with pytest.raises(ValueError):
        decode_fn(b"x", "video", fake=False)  # not a RIFF/AVI container
    with pytest.raises(ValueError):
        decode_fn(b"mp4 would need pyav", "video", fake=False)


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
    # video with no payload: real container-parse error, quarantined
    assert "not a RIFF/AVI payload" in out["m3"].error


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


def _avi_dib(frames, bpp=24, compression=0, extra_movi=b""):
    """Full RIFF/AVI with an uncompressed-DIB vids stream: hdrl (avih +
    strl(strh 'vids'/'DIB ' + strf BITMAPINFOHEADER)) + movi with one
    ``00db`` chunk per (h, w, 3) uint8 RGB frame (bottom-up BGR rows,
    4-byte-aligned stride)."""
    import struct

    import numpy as np

    h, w, _ = np.asarray(frames[0]).shape

    def chunk(cid, body):
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    avih = struct.pack("<14I", 40000, 0, 0, 0, len(frames), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = b"vids" + b"DIB " + struct.pack("<12I", *([0] * 12))
    strf = struct.pack("<IiiHHI", 40, w, h, 1, bpp, compression) + b"\x00" * 16
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    stride = (w * (bpp // 8) + 3) // 4 * 4
    movi_body = extra_movi
    for fr in frames:
        fr = np.asarray(fr, dtype=np.uint8)
        rows = []
        for y in range(h - 1, -1, -1):  # bottom-up
            row = bytearray()
            for x in range(w):
                row += bytes((int(fr[y, x, 2]), int(fr[y, x, 1]),
                              int(fr[y, x, 0])))
                if bpp == 32:
                    row += b"\xff"
            row += b"\x00" * (stride - len(row))
            rows.append(bytes(row))
        movi_body += chunk(b"00db", b"".join(rows))
    body = b"AVI " + hdrl + lst(b"movi", movi_body)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_avi_frames_real():
    import numpy as np

    from kgpipe.multimodal import decode_avi_frames, decode_fn, grid_features

    rng = np.random.default_rng(11)
    frames = [rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
              for _ in range(3)]
    payload = _avi_dib(frames)

    decoded = decode_avi_frames(payload)
    assert [i for i, _ in decoded] == [0, 1, 2]
    for (_, lum), fr in zip(decoded, frames):
        want = (fr @ np.array([0.299, 0.587, 0.114])) / 255.0
        assert lum.shape == (6, 5)
        assert np.allclose(lum, want, atol=1.5 / 255)

    # selected frame indices decode in the order given (the
    # frame_sample_plan wiring)
    sel = decode_avi_frames(payload, [2, 0])
    assert [i for i, _ in sel] == [2, 0]
    assert np.allclose(sel[0][1], decoded[2][1])

    # real video feature = per-frame grid features averaged
    feats = decode_fn(payload, "video", fake=False)
    want = np.mean([grid_features(lum) for _, lum in decoded], axis=0)
    assert len(feats) == FEATURE_DIM and np.allclose(feats, want)

    # 32-bit DIB frames decode too
    f32 = decode_avi_frames(_avi_dib(frames, bpp=32))
    assert np.allclose(f32[0][1], decoded[0][1], atol=1.5 / 255)

    # compressed codec: honest quarantine, not a wrong decode
    with pytest.raises(ValueError, match="unsupported AVI codec"):
        decode_avi_frames(_avi_dib(frames, compression=1))
    # out-of-range sample index
    with pytest.raises(ValueError, match="out of range"):
        decode_avi_frames(payload, [3])
    # truncated final frame: clamped chunk -> truncated DIB error
    with pytest.raises(ValueError, match="truncated DIB"):
        decode_avi_frames(payload[:-20], [2])


def test_extract_features_real_video_end_to_end(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
              for _ in range(2)]
    rows = [("v1", "video", bytearray(_avi_dib(frames)), None),
            ("v2", "video", bytearray(_avi_dib(frames, compression=1)), None)]
    media = spark.createDataFrame(
        rows,
        "media_id string, modality string, payload binary,"
        " meta map<string,string>",
    )
    out = {r.media_id: r for r in extract_features(media, fake=False).collect()}
    assert out["v1"].error is None and len(out["v1"].feature) == FEATURE_DIM
    assert out["v2"].feature is None  # compressed: quarantined row
    assert "unsupported AVI codec" in out["v2"].error


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


def test_probe_wav_truncated_clamps_n_frames():
    """ADVICE r4: a truncated WAV must not advertise frames that are not
    present — n_frames derives from the clamped data-chunk bytes."""
    import numpy as np

    from kgpipe.multimodal import probe_payload

    wav = _wav(np.zeros(1000), sr=8000, bits=16, channels=2)
    full = probe_payload(wav)
    assert full["n_frames"] == 1000
    # cut half the data chunk (declared size stays 4000 bytes)
    cut = wav[: len(wav) - 2000]
    p = probe_payload(cut)
    assert p["n_frames"] == 500  # bytes actually present / block_align


def test_probe_avi_ignores_stray_avih_in_chunk_data():
    """ADVICE r4: the AVI probe walks RIFF structure — a stray 'avih' byte
    pattern inside unrelated chunk DATA must not be parsed as the header."""
    import struct

    import numpy as np

    from kgpipe.multimodal import probe_payload

    frames = [np.zeros((4, 4, 3), dtype=np.uint8)]
    # a junk movi chunk whose data embeds 'avih' + bogus dwords BEFORE the
    # real frames; the real avih (4x4, 1 frame) sits in hdrl
    junk = (b"99tx" + struct.pack("<I", 48)
            + b"avih" + struct.pack("<11I", *([7] * 11)))
    p = probe_payload(_avi_dib(frames, extra_movi=junk))
    assert (p["width"], p["height"], p["n_frames"]) == (4, 4, 1)


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
