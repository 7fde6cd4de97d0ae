"""Deterministic synthetic transcripts generator (FIXTURES.md F1/F4).

Produces the primary input table ``transcripts(conv_id, turn_idx, role,
text, tool, ts)`` plus a golden per-turn mention list for parity oracles.
Seeded and pure-deterministic (no wall clock, no unordered iteration).
Zipf-ish conversation lengths exercise the conv_id skew path.

The generator plants dictionary surface forms (exact names, synonyms, case
variants, plural forms) at known character offsets, so the expected mention
set is known by construction — the synthetic analogue of the reference's
golden ``.a1`` fixtures.
"""

from __future__ import annotations

import datetime as dt
import random
from dataclasses import dataclass

BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

ROLES = ["user", "assistant", "tool"]
TOOLS = [None, None, "search", "code", "db"]

# filler vocabulary — no overlaps with the planted terms below
_FILLER = (
    "please run the job and report status quickly while logging output "
    "consider batching results then retry with backoff after the deploy "
    "metrics dashboards show latency spikes during rollout yesterday"
).split()


@dataclass
class PlantedTerm:
    surface: str        # text as planted
    concept_id: str     # expected concept
    ontology: str


def default_planted_terms() -> list[PlantedTerm]:
    """Surface forms tied to the mini-CL fixture (tests/fixtures/mini.obo):
    exact names, plural, case variants, multi-word synonyms."""
    return [
        PlantedTerm("cell", "CL:0000000", "CL"),
        PlantedTerm("cells", "CL:0000000", "CL"),
        PlantedTerm("Cell", "CL:0000000", "CL"),
        PlantedTerm("neuron", "CL:0000540", "CL"),
        PlantedTerm("neurons", "CL:0000540", "CL"),
        PlantedTerm("nerve cell", "CL:0000540", "CL"),
        PlantedTerm("amacrine cell", "CL:0000561", "CL"),
        PlantedTerm("amacrine cells", "CL:0000561", "CL"),
        PlantedTerm("interneuron", "CL:0000099", "CL"),
        PlantedTerm("interneurons", "CL:0000099", "CL"),
        PlantedTerm("fibroblast", "CL:0000057", "CL"),
        PlantedTerm("native cell", "CL:0000003", "CL"),
    ]


def zipf_turn_count(rng: random.Random, max_turns: int = 200) -> int:
    """Zipf-distributed turn counts (1..max_turns) — heavy tail for skew."""
    r = rng.random()
    n = int(1.0 / max(r, 1.0 / max_turns) ** 0.7)
    return max(1, min(n, max_turns))


def generate_transcripts(
    n_convs: int = 100,
    seed: int = 42,
    terms: list[PlantedTerm] | None = None,
    min_fill: int = 3,
    max_fill: int = 12,
) -> tuple[list[dict], list[dict]]:
    """Return ``(transcript_rows, golden_mention_rows)``.

    golden rows: ``(conv_id, turn_idx, ontology, concept_id, begin, end,
    covered_text)`` with turn-relative char offsets.
    """
    rng = random.Random(seed)
    terms = terms or default_planted_terms()
    transcripts: list[dict] = []
    golden: list[dict] = []

    for ci in range(n_convs):
        conv_id = f"conv{ci:06d}"
        n_turns = zipf_turn_count(rng)
        for ti in range(n_turns):
            role = ROLES[ti % 3]
            tool = rng.choice(TOOLS[2:]) if role == "tool" else None
            # build turn text: filler words with 0-3 planted terms
            words: list[str] = []
            planted_here: list[tuple[int, PlantedTerm]] = []  # (word_pos, term)
            n_fill = rng.randint(min_fill, max_fill)
            n_plant = rng.randint(0, 3)
            plant_positions = sorted(rng.sample(range(n_fill + 1), min(n_plant, n_fill + 1)))
            fill_iter = [rng.choice(_FILLER) for _ in range(n_fill)]
            pos = 0
            for wi, w in enumerate(fill_iter):
                while plant_positions and plant_positions[0] == wi:
                    plant_positions.pop(0)
                    t = rng.choice(terms)
                    planted_here.append((len(words), t))
                    words.append(t.surface)
                words.append(w)
            while plant_positions:
                plant_positions.pop(0)
                t = rng.choice(terms)
                planted_here.append((len(words), t))
                words.append(t.surface)
            text = " ".join(words)
            # compute char offsets of planted terms
            cum = 0
            word_begins = []
            for w in words:
                word_begins.append(cum)
                cum += len(w) + 1
            for wpos, t in planted_here:
                b = word_begins[wpos]
                golden.append(
                    {
                        "conv_id": conv_id,
                        "turn_idx": ti,
                        "ontology": t.ontology,
                        "concept_id": t.concept_id,
                        "begin": b,
                        "end": b + len(t.surface),
                        "covered_text": t.surface,
                    }
                )
            transcripts.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": ti,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": BASE_TS
                    + dt.timedelta(hours=ci % 48, seconds=30 * ti),
                }
            )
    return transcripts, golden


def reference_article_conv(path: str, conv_id: str = "pmid17608565") -> list[dict]:
    """The reference's golden input article split one-line-per-turn (literal
    text preserved per turn — the per-turn text equality invariant)."""
    with open(path, encoding="utf-8") as f:
        content = f.read()
    rows = []
    ti = 0
    for line in content.split("\n"):
        if not line.strip():
            continue
        rows.append(
            {
                "conv_id": conv_id,
                "turn_idx": ti,
                "role": ROLES[ti % 3],
                "text": line,
                "tool": None,
                "ts": BASE_TS + dt.timedelta(seconds=30 * ti),
            }
        )
        ti += 1
    return rows
