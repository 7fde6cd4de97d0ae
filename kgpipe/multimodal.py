"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches.

The decode step is STUBBED (no image/audio libraries in this container) —
``decode_fn`` below raises ``NotImplementedError`` unless a deterministic
fake is requested — but the Spark-side plumbing is real and tested: schema,
partitioning, ``mapInPandas`` UDF signature, and batch shapes are exactly
what a Pillow/torchaudio-backed decoder would plug into.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 16 floats derived from the
    sha256 of the payload.  Replaces (not approximates) pixel decoding —
    clearly marked fake."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_fn(payload: bytes, modality: str, fake: bool = False) -> list[float]:
    """The pluggable decode step. Real decoders (PIL.Image.open /
    soundfile.read / pyav frame sampling) are NOT available in this
    container — STUB."""
    if fake:
        return _fake_decode_features(payload)
    raise NotImplementedError(
        f"real {modality} decoding requires image/audio libs not present in "
        "this environment; pass fake=True for the deterministic stand-in"
    )


def extract_features(media: DataFrame, fake: bool = True,
                     batch_limit: int = 256) -> DataFrame:
    """media(binary payload) → fixed-dim feature vectors via mapInPandas.

    Real plumbing: Arrow batches in, one pandas call per batch, per-row
    error quarantine, bounded batch size for large payloads (set
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` down when payloads are
    MB-scale — the same pattern the trie detector uses for text)."""

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
                except NotImplementedError as exc:
                    out["feature"].append(None)
                    out["error"].append(str(exc))
            yield pd.DataFrame(out)

    return media.select("media_id", "modality", "payload").mapInPandas(
        run, schema=FEATURES_SCHEMA
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
