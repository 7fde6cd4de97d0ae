"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

ALL THREE decode steps are REAL and dependency-free:

- image: a pure-numpy parser for the netpbm family (P2/P3 ASCII, P5/P6
  binary) and uncompressed 24/32-bit BMP decodes pixels to a luminance
  plane; the feature vector is a 4×4 grid of mean luminances (16 floats
  in [0, 1]).
- audio: a pure-numpy RIFF/WAVE parser (PCM 8/16/32-bit and IEEE
  float32, any channel count, downmixed to mono); the feature vector is
  8 per-segment RMS levels + 8 spectral-band energy fractions (16
  floats in [0, 1]).
- video: a pure-numpy RIFF/AVI parser for uncompressed-DIB streams
  (``00db``/``00dw`` frames reusing the BMP pixel path), frame-index
  selectable so ``frame_sample_plan``'s indices drive the decode; the
  feature vector is the per-frame 4×4 grid averaged over the decoded
  frames.  Genuinely COMPRESSED codecs (MJPG/H.264/mp4 containers…)
  would need pyav, absent in this container — those payloads quarantine
  as per-row ``ValueError`` rows through the same seam a pyav-backed
  decoder would plug into.
"""

from __future__ import annotations

import hashlib
import re
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),
        # LongType: a single blob may exceed 2 GiB at media scale
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)

FEATURE_DIM = 16
_GRID = 4  # FEATURE_DIM == _GRID * _GRID

# Rec. 601 luma weights
_LUMA = np.array([0.299, 0.587, 0.114])

_PNM_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*(\S+)")


def _pnm_tokens(buf: bytes, n: int, pos: int) -> tuple[list[bytes], int]:
    """Read *n* whitespace/comment-separated header tokens from *pos*."""
    out = []
    for _ in range(n):
        m = _PNM_TOKEN.match(buf, pos)
        if not m:
            raise ValueError("truncated netpbm header")
        out.append(m.group(1))
        pos = m.end()
    return out, pos


def decode_image(payload: bytes) -> np.ndarray:
    """Decode a netpbm (P2/P3/P5/P6) or uncompressed 24/32-bit BMP payload
    to a float32 luminance plane in [0, 1].  Pure numpy — no image libs.
    Raises ``ValueError`` on anything else (corrupt or unsupported)."""
    if payload is None or len(payload) < 2:
        raise ValueError("empty image payload")
    magic = payload[:2]
    if magic in (b"P2", b"P3", b"P5", b"P6"):
        return _decode_pnm(payload, magic)
    if magic == b"BM":
        return _decode_bmp(payload)
    raise ValueError(f"unsupported image format (magic {magic!r})")


def _decode_pnm(buf: bytes, magic: bytes) -> np.ndarray:
    gray = magic in (b"P2", b"P5")
    ascii_fmt = magic in (b"P2", b"P3")
    (w_b, h_b, mx_b), pos = _pnm_tokens(buf, 3, 2)
    w, h, maxval = int(w_b), int(h_b), int(mx_b)
    if w <= 0 or h <= 0 or maxval <= 0 or maxval > 65535:
        raise ValueError("bad netpbm dimensions")
    n_samples = w * h * (1 if gray else 3)
    if ascii_fmt:
        toks = buf[pos:].split()
        if len(toks) < n_samples:
            raise ValueError("truncated netpbm pixel data")
        vals = np.array(toks[:n_samples], dtype=np.int64)
    else:
        pos += 1  # exactly one whitespace byte after maxval (spec)
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
        need = n_samples * dtype.itemsize
        raw = buf[pos:pos + need]
        if len(raw) < need:
            raise ValueError("truncated netpbm pixel data")
        vals = np.frombuffer(raw, dtype=dtype).astype(np.int64)
    if vals.size != n_samples:
        raise ValueError("truncated netpbm pixel data")
    arr = vals.reshape((h, w) if gray else (h, w, 3)).astype(np.float32)
    arr /= float(maxval)
    if gray:
        return arr
    return arr @ _LUMA.astype(np.float32)


def _decode_bmp(buf: bytes) -> np.ndarray:
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack_from("<ii", buf, 18)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    compression = struct.unpack_from("<I", buf, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    if w <= 0 or h == 0:
        raise ValueError("bad BMP dimensions")
    bottom_up = h > 0
    return _dib_luma(buf, data_off, w, abs(h), bpp, bottom_up)


def _dib_luma(buf: bytes, offset: int, w: int, h: int, bpp: int,
              bottom_up: bool) -> np.ndarray:
    """Device-independent-bitmap pixel rows (4-byte-aligned stride,
    BGR(A), bottom-up unless negative height) → luminance plane in
    [0, 1].  Shared by the BMP decoder and the AVI ``00db`` frame
    decoder — an uncompressed AVI frame IS a DIB without the file
    header."""
    bytes_pp = bpp // 8
    stride = (w * bytes_pp + 3) // 4 * 4
    need = stride * h
    if len(buf) - offset < need:
        raise ValueError("truncated DIB pixel data")
    rows = np.frombuffer(buf, dtype=np.uint8, count=need,
                         offset=offset).reshape(h, stride)
    px = rows[:, : w * bytes_pp].reshape(h, w, bytes_pp).astype(np.float32)
    if bottom_up:
        px = px[::-1]
    # DIBs store BGR(A)
    lum = px[:, :, 2] * _LUMA[0] + px[:, :, 1] * _LUMA[1] + px[:, :, 0] * _LUMA[2]
    return (lum / 255.0).astype(np.float32)


def _riff_chunks(buf: bytes, pos: int, end: int):
    """Walk the RIFF chunk sequence in ``buf[pos:end]``, yielding
    ``(chunk_id, body_start, body_size, list_type)`` — ``body_size`` is
    CLAMPED to the bytes actually present (a truncated payload yields a
    short final chunk instead of phantom bytes), and ``list_type`` is the
    4-byte list kind for ``LIST``/``RIFF`` chunks (None otherwise).
    Structure-aware: stray fourcc byte patterns inside chunk DATA are
    never misread as chunks."""
    while pos + 8 <= end:
        cid = buf[pos:pos + 4]
        csize = struct.unpack_from("<I", buf, pos + 4)[0]
        body = pos + 8
        avail = min(csize, max(0, end - body))
        ltype = buf[body:body + 4] if cid in (b"LIST", b"RIFF") else None
        yield cid, body, avail, ltype
        # chunks are word-aligned: odd sizes carry one pad byte
        pos = body + csize + (csize & 1)


def _parse_avi(payload: bytes) -> tuple[tuple, tuple, list[tuple[int, int]]]:
    """Parse a RIFF/AVI container: returns ``(avih, vids_strf, frames)``
    where ``avih`` is the 10-dword main header, ``vids_strf`` the first
    video stream's BITMAPINFOHEADER fields (or None), and ``frames`` the
    ``(offset, size)`` list of ``##db``/``##dw`` movi chunks in stream
    order.  Raises ``ValueError`` if the container or main header is
    missing/truncated."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    end = min(len(payload), 8 + riff_size)
    avih = None
    strf = None
    frames: list[tuple[int, int]] = []
    last_stream_type = None

    def walk(pos: int, stop: int, in_movi: bool) -> None:
        nonlocal avih, strf, last_stream_type
        for cid, body, size, ltype in _riff_chunks(payload, pos, stop):
            if cid == b"LIST":
                walk(body + 4, body + size,
                     in_movi or ltype in (b"movi", b"rec "))
            elif cid == b"avih" and size >= 40 and avih is None:
                avih = struct.unpack_from("<10I", payload, body)
            elif cid == b"strh" and size >= 4:
                last_stream_type = payload[body:body + 4]
            elif cid == b"strf" and size >= 24 and strf is None \
                    and last_stream_type == b"vids":
                # biSize, biWidth, biHeight, biPlanes, biBitCount,
                # biCompression
                strf = struct.unpack_from("<IiiHHI", payload, body)
            elif in_movi and len(cid) == 4 and cid[2:] in (b"db", b"dw"):
                frames.append((body, size))

    walk(12, end, False)
    if avih is None:
        raise ValueError("AVI missing avih header")
    return avih, strf, frames


def decode_avi_frames(
    payload: bytes, frame_indices=None
) -> list[tuple[int, np.ndarray]]:
    """Decode selected frames of an uncompressed-DIB AVI to luminance
    planes: ``[(frame_idx, lum)]``.  ``frame_indices=None`` decodes every
    frame; pass ``frame_sample_plan``'s indices to decode only the
    sampled ones (the 100 TB path: header walk + per-selected-frame
    slices, never the whole stream).  Raises ``ValueError`` for
    compressed codecs (biCompression != 0 — pyav territory) and
    truncated/missing frames."""
    _avih, strf, frames = _parse_avi(payload)
    if strf is None:
        raise ValueError("AVI has no video (vids) stream header")
    _, w, h, _planes, bpp, compression = strf
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported AVI codec (bpp={bpp}, compression={compression});"
            " only uncompressed DIB streams decode without video libs"
        )
    if w <= 0 or h == 0:
        raise ValueError("bad AVI frame dimensions")
    bottom_up = h > 0
    h = abs(h)
    if frame_indices is None:
        frame_indices = range(len(frames))
    out: list[tuple[int, np.ndarray]] = []
    for idx in frame_indices:
        idx = int(idx)
        if not 0 <= idx < len(frames):
            raise ValueError(
                f"frame index {idx} out of range (AVI has {len(frames)}"
                " movi frames)"
            )
        off, size = frames[idx]
        lum = _dib_luma(payload[:off + size], off, w, h, bpp, bottom_up)
        out.append((idx, lum))
    return out


def grid_features(lum: np.ndarray, grid: int = _GRID) -> list[float]:
    """``grid × grid`` mean-luminance pooling → fixed-dim feature vector
    (row-major).  Cells cover the image via integer edge splits, so any
    image ≥ 1×1 produces exactly ``grid*grid`` floats."""
    h, w = lum.shape
    ys = np.linspace(0, h, grid + 1, dtype=np.int64)
    xs = np.linspace(0, w, grid + 1, dtype=np.int64)
    out: list[float] = []
    for i in range(grid):
        for j in range(grid):
            cell = lum[ys[i]:ys[i + 1], xs[j]:xs[j + 1]]
            # images smaller than the grid repeat whole-image pooling in
            # the degenerate cells (still exactly grid*grid outputs)
            if cell.size == 0:
                cell = lum
            out.append(float(cell.mean()))
    return out


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE payload to a mono float32 signal in [-1, 1] plus
    its sample rate.  Pure numpy — supports PCM 8-bit unsigned, 16/32-bit
    signed little-endian, and IEEE float32, any channel count (downmixed
    by mean).  Raises ``ValueError`` on anything else."""
    if payload is None or len(payload) < 12:
        raise ValueError("empty or truncated WAV payload")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(payload)
    fmt = None
    data = None
    while pos + 8 <= n:
        cid = payload[pos:pos + 4]
        csize = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8:pos + 8 + csize]
        if cid == b"fmt " and len(body) >= 16:
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        # chunks are word-aligned: odd sizes carry one pad byte
        pos += 8 + csize + (csize & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if n_channels < 1 or sample_rate < 1:
        raise ValueError("bad WAV fmt chunk")
    if audio_format == 1 and bits == 8:
        x = np.frombuffer(data, dtype=np.uint8).astype(np.float32)
        x = (x - 128.0) / 128.0
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(
            data[: len(data) - (len(data) % 2)], dtype="<i2"
        ).astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(
            data[: len(data) - (len(data) % 4)], dtype="<i4"
        ).astype(np.float32) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(
            data[: len(data) - (len(data) % 4)], dtype="<f4"
        ).astype(np.float32)
    else:
        raise ValueError(
            f"unsupported WAV (format={audio_format}, bits={bits})"
        )
    if x.size == 0:
        raise ValueError("WAV data chunk has no samples")
    n_frames = x.size // n_channels
    if n_frames == 0:
        raise ValueError("WAV data shorter than one frame")
    mono = x[: n_frames * n_channels].reshape(n_frames, n_channels).mean(axis=1)
    return np.clip(mono, -1.0, 1.0), sample_rate


def audio_features(mono: np.ndarray, segments: int = 8) -> list[float]:
    """Fixed-dim audio features: ``segments`` per-segment RMS levels over
    equal time slices (temporal envelope) + ``segments`` spectral-band
    energy fractions of the magnitude spectrum (equal-width rfft bands,
    normalized to sum 1) — ``2 * segments`` = FEATURE_DIM floats, all in
    [0, 1].  Deterministic, no windows/overlap: this is a fingerprint for
    dedup/quality pipelines, not a perceptual embedding."""
    n = mono.size
    edges = np.linspace(0, n, segments + 1, dtype=np.int64)
    rms: list[float] = []
    for i in range(segments):
        seg = mono[edges[i]:edges[i + 1]]
        if seg.size == 0:
            seg = mono
        rms.append(float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))))
    spec = np.abs(np.fft.rfft(mono.astype(np.float64))) ** 2
    total = float(spec.sum())
    bedges = np.linspace(0, spec.size, segments + 1, dtype=np.int64)
    bands: list[float] = []
    for i in range(segments):
        b = spec[bedges[i]:bedges[i + 1]]
        bands.append(float(b.sum() / total) if total > 0 else 0.0)
    return [min(1.0, v) for v in rms] + bands


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 16 floats derived from the
    sha256 of the payload.  Replaces (not approximates) pixel decoding —
    clearly marked fake (kept as the DuckDB-reconstructible oracle path)."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_fn(payload: bytes, modality: str, fake: bool = False) -> list[float]:
    """The pluggable decode step.  Images (netpbm/BMP via ``decode_image``
    + ``grid_features``), audio (RIFF/WAVE via ``decode_wav`` +
    ``audio_features``) and video (uncompressed-DIB AVI via
    ``decode_avi_frames``; feature = per-frame grid features averaged
    over all frames) decode for real.  Compressed video codecs raise
    ``ValueError`` (quarantined per row by ``extract_features``) — a
    pyav-backed decoder would extend this same dispatch."""
    if fake:
        return _fake_decode_features(payload)
    if modality == "image":
        return grid_features(decode_image(payload))
    if modality == "audio":
        mono, _ = decode_wav(payload)
        return audio_features(mono)
    if modality == "video":
        decoded = decode_avi_frames(payload)
        if not decoded:
            raise ValueError("AVI contains no movi frames")
        feats = np.mean([grid_features(lum) for _, lum in decoded], axis=0)
        return [float(v) for v in feats]
    raise ValueError(f"unknown modality {modality!r}")


def extract_features(media: DataFrame, fake: bool = True,
                     batch_limit: int = 256) -> DataFrame:
    """media(binary payload) → fixed-dim feature vectors via mapInPandas.

    Real plumbing: Arrow batches in, one pandas call per batch, per-row
    error quarantine (corrupt payloads and stubbed modalities become
    ``error`` rows, not failed tasks — the reference's per-document error
    logging, ``RunCatalogAE.java:107-112``), bounded batch size for large
    payloads (set ``spark.sql.execution.arrow.maxRecordsPerBatch`` down
    when payloads are MB-scale — the same pattern the trie detector uses
    for text)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "modality": [], "n_bytes": [],
                   "feature": [], "error": []}
            for mid, mod, payload in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                out["media_id"].append(mid)
                out["modality"].append(mod)
                out["n_bytes"].append(len(payload) if payload is not None else 0)
                try:
                    out["feature"].append(decode_fn(payload, mod, fake=fake))
                    out["error"].append(None)
                except (NotImplementedError, ValueError) as exc:
                    out["feature"].append(None)
                    out["error"].append(str(exc))
            yield pd.DataFrame(out)

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
    )


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        # LongType: >2 GiB blobs / >2^31 audio frames are plausible at
        # media scale
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def probe_payload(payload: bytes) -> dict:
    """Typed metadata from a payload's HEADER only — no pixel/sample
    decode: netpbm (dims), BMP (dims), RIFF/WAVE (rate, channels, frame
    count), RIFF/AVI (dims, frame count via the ``avih`` main header).
    The cheap first pass a media pipeline runs over 100 TB of blobs to
    decide what to decode at all (and the producer of ``n_frames`` that
    ``frame_sample_plan`` consumes).  Raises ``ValueError`` on unknown
    or truncated headers."""
    if payload is None or len(payload) < 12:
        raise ValueError("payload too short to probe")
    out = {"format": None, "width": None, "height": None, "n_frames": None,
           "sample_rate": None, "n_channels": None}
    magic = payload[:2]
    if magic in (b"P2", b"P3", b"P5", b"P6"):
        (w_b, h_b, _), _ = _pnm_tokens(payload, 3, 2)
        out.update(format="pnm", width=int(w_b), height=int(h_b))
        return out
    if magic == b"BM":
        if len(payload) < 26:
            raise ValueError("truncated BMP header")
        w, h = struct.unpack_from("<ii", payload, 18)
        out.update(format="bmp", width=int(w), height=abs(int(h)))
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        block_align = data_size = 0
        n = len(payload)
        for cid, body, size, _ in _riff_chunks(payload, 12, n):
            if cid == b"fmt " and size >= 16:
                _, ch, rate, _, block_align, _ = struct.unpack_from(
                    "<HHIIHH", payload, body)
                out.update(sample_rate=int(rate), n_channels=int(ch))
            elif cid == b"data":
                # _riff_chunks clamps size to the bytes actually present,
                # so a truncated payload never advertises frames (and
                # frame/sample plans built on n_frames never reference
                # samples) that don't exist
                data_size = size
        if out["sample_rate"] is None:
            raise ValueError("WAV missing fmt chunk")
        out["format"] = "wav"
        if data_size and block_align:
            # audio "frames" = samples per channel in the data chunk
            out["n_frames"] = int(data_size // block_align)
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        # structure-aware header walk (never matches stray 'avih' byte
        # patterns inside unrelated chunk data)
        avih, _strf, _frames = _parse_avi(payload)
        out.update(format="avi", n_frames=int(avih[4]),
                   width=int(avih[8]), height=int(avih[9]))
        return out
    raise ValueError(f"unknown media container (magic {payload[:4]!r})")


def probe_media(media: DataFrame) -> DataFrame:
    """Header-only metadata extraction over binary media columns —
    same Arrow-batch + per-row-quarantine plumbing as
    ``extract_features``, but reads only container headers (bytes, not
    pixels/samples), so it is scan-bound at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["format", "width", "height", "n_frames", "sample_rate",
                "n_channels"]
        for pdf in batches:
            out = {k: [] for k in ["media_id", *cols, "n_bytes", "error"]}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                out["media_id"].append(mid)
                out["n_bytes"].append(
                    len(payload) if payload is not None else 0)
                try:
                    info = probe_payload(payload)
                    for k in cols:
                        out[k].append(info.get(k))
                    out["error"].append(None)
                except ValueError as exc:
                    for k in cols:
                        out[k].append(None)
                    out["error"].append(str(exc))
            yield pd.DataFrame(out)

    return media.select("media_id", "payload").mapInPandas(
        run, schema=PROBE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: explodes per-media frame indices from
    metadata (``meta['n_frames']``) without decoding — the shuffle-free
    prelude to a decode stage; the decode itself is the stub above."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
