"""Markup-stripping text converter with original-offset mapping.

Spark-first analogue of the reference's nxml → plain-text conversion
(``PmcDocumentConverterAE`` wired at ``PmcNxml2TxtPipeline.java:91-92``):
conversation corpora carry markup / tool-output blobs inside ``text``;
downstream detection wants clean text, but emitted mention offsets must map
back to the ORIGINAL raw text (the reference keeps the XML view and the
text view side by side in the CAS for the same reason,
``PmcNxml2TxtPipeline.java:52-56``).

Design:
- ``strip_markup`` is a pure function: one left-to-right scan removing
  ``<...>`` tags and decoding the five XML named entities, emitting the
  clean string plus a PIECEWISE offset map — a list of ``(clean_start,
  raw_start)`` segments inside which ``raw = raw_start + (pos -
  clean_start)``.  Segments are O(#tags + #entities), not O(len), so the
  map column stays small even for long turns.
- ``strip_markup_turns`` runs it per turn via ``mapInPandas`` (Arrow
  batches, no per-row Python overhead beyond the scan itself) — a narrow
  stage that fuses with the downstream trie detection scan.
- ``map_mention_offsets`` converts clean-text mention spans back to raw
  offsets with pure array expressions (``filter``/``element_at``) — no
  second Python stage.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

# tag branch is TAG-SHAPED only (`</?[A-Za-z!?]...>` — elements, comments,
# PIs): a bare '<' in prose or code ("if a < b and c > d") copies through
# instead of being swallowed as a pseudo-tag
_MARKUP_RE = re.compile(r"</?[A-Za-z!?][^>]*>|&(lt|gt|quot|apos|amp);")
_ENTITY_CHAR = {"lt": "<", "gt": ">", "quot": '"', "apos": "'", "amp": "&"}


def strip_markup(raw: str) -> tuple[str, list[tuple[int, int, int]]]:
    """Return ``(clean_text, segments)`` where each segment ``(c, r, w)``
    maps clean offsets ``>= c`` (until the next segment) to ``r + (pos -
    c)`` in the raw string; ``w`` is the RAW width of one clean character
    in the segment (1 for copy runs, the entity length for decoded
    entities) so span ENDS can cover a whole trailing entity.  Tags are
    removed; ``&lt; &gt; &quot; &apos; &amp;`` decode to one character
    anchored at the entity's raw start."""
    out: list[str] = []
    segs: list[tuple[int, int, int]] = []
    clean_pos = 0
    raw_pos = 0
    for m in _MARKUP_RE.finditer(raw):
        if m.start() > raw_pos:  # copy run before the match
            segs.append((clean_pos, raw_pos, 1))
            run = raw[raw_pos:m.start()]
            out.append(run)
            clean_pos += len(run)
        if m.group(1):  # entity → one decoded char anchored at its start
            segs.append((clean_pos, m.start(), m.end() - m.start()))
            out.append(_ENTITY_CHAR[m.group(1)])
            clean_pos += 1
        raw_pos = m.end()
    if raw_pos < len(raw):
        segs.append((clean_pos, raw_pos, 1))
        out.append(raw[raw_pos:])
    return "".join(out), segs


STRIPPED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp, raw_text string,"
    " segs array<struct<c:int,r:int,w:int>>"
)


def strip_markup_turns(transcripts: DataFrame) -> DataFrame:
    """Per-turn markup stripping: ``text`` becomes the clean text (so every
    downstream operator works unchanged), ``raw_text`` keeps the original,
    and ``segs`` carries the clean→raw offset map.  Narrow (mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cleans, rawz, segz = [], [], []
            for raw in pdf["text"]:
                if raw is None:
                    cleans.append(None)
                    rawz.append(None)
                    segz.append(None)
                    continue
                clean, segs = strip_markup(raw)
                cleans.append(clean)
                rawz.append(raw)
                segz.append([{"c": c, "r": r, "w": w} for c, r, w in segs])
            out = pdf[["conv_id", "turn_idx", "role", "tool", "ts"]].copy()
            out["text"] = cleans
            out["raw_text"] = rawz
            out["segs"] = segz
            yield out[["conv_id", "turn_idx", "role", "text", "tool", "ts",
                       "raw_text", "segs"]]

    return transcripts.select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).mapInPandas(run, schema=STRIPPED_SCHEMA)


def _raw_offset(segs: Column, clean_off: Column) -> Column:
    """Raw offset for a clean offset given the piecewise segment map: the
    last segment with ``c <= off`` anchors it.  Pure array expressions."""
    seg = F.element_at(F.filter(segs, lambda s: s["c"] <= clean_off), -1)
    return seg["r"] + (clean_off - seg["c"])


def _raw_char_end(segs: Column, clean_off: Column) -> Column:
    """Raw END (exclusive) of the clean character at *clean_off*: its raw
    start plus the segment's per-char raw width — a trailing decoded entity
    covers its whole ``&...;`` source, not just the first raw byte."""
    seg = F.element_at(F.filter(segs, lambda s: s["c"] <= clean_off), -1)
    return seg["r"] + (clean_off - seg["c"]) + seg["w"]


def map_mention_offsets(
    mentions: DataFrame, stripped: DataFrame
) -> DataFrame:
    """Join clean-text mentions back to their turns' offset maps and add
    ``raw_begin`` / ``raw_end`` columns (original-text spans).  ``end`` is
    exclusive, so it maps via the raw end of the LAST covered char — a
    mention ending at a removed-tag boundary or on a decoded entity still
    gets the tight covering raw span."""
    maps = stripped.select("conv_id", "turn_idx", "segs")
    m = mentions.join(maps, ["conv_id", "turn_idx"], "left")
    return m.withColumn(
        "raw_begin", _raw_offset(F.col("segs"), F.col("begin"))
    ).withColumn(
        "raw_end", _raw_char_end(F.col("segs"), F.col("end") - 1)
    ).drop("segs")
