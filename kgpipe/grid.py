"""ConceptMapper parameter-grid evaluation.

The reference sweeps 577 knob permutations serially over the full corpus
(``RunConceptMapperCraftEvals.java:45`` loops ``i < 577``; the knob
vocabulary is in ``ConceptMapperEvalOutputCompiler.java:83-100``) and then
compiles the per-index result files into one TSV
(``ConceptMapperEvalOutputCompiler.java:122-150, 523-558``).

Here the grid is an explicit enumeration (3 SearchStrategy × 4 CaseMatch ×
3 Stemmer × 2 Stopwords × 2 OrderIndependent × 2 FindAllMatches ×
2 SynonymType = 576 combos + the reference's one extra hand-tuned entry ≈
577), and each permutation is an independent detect+evaluate job — they
parallelize trivially (the reference runs them serially in one JVM).
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import product
from typing import Iterable, Optional

from pyspark.sql import DataFrame, SparkSession

from .normalize import (
    CASE_FOLD_DIGITS, CASE_IGNORE, CASE_INSENSITIVE, CASE_SENSITIVE,
    MatchConfig, SEARCH_CONTIGUOUS, SEARCH_SKIP_ANY, SEARCH_SKIP_ANY_OVERLAP,
    STEM_BIOLEMMATIZER, STEM_NONE, STEM_PORTER, STOP_NONE, STOP_PUBMED,
    SYN_ALL, SYN_EXACT_ONLY,
)

_SEARCH = [SEARCH_CONTIGUOUS, SEARCH_SKIP_ANY, SEARCH_SKIP_ANY_OVERLAP]
_CASE = [CASE_FOLD_DIGITS, CASE_IGNORE, CASE_SENSITIVE, CASE_INSENSITIVE]
_STEM = [STEM_PORTER, STEM_NONE, STEM_BIOLEMMATIZER]
_STOP = [STOP_NONE, STOP_PUBMED]
_OIL = [False, True]
_FAM = [False, True]
_SYN = [SYN_EXACT_ONLY, SYN_ALL]


def param_grid() -> list[MatchConfig]:
    """All 576 knob permutations, deterministic order (the reference's
    0..576 index space; index decoding lives in an external artifact, so we
    define our own stable ordering and carry it everywhere)."""
    return [
        MatchConfig(ss, cm, st, sw, oil, fam, syn)
        for ss, cm, st, sw, oil, fam, syn in product(
            _SEARCH, _CASE, _STEM, _STOP, _OIL, _FAM, _SYN
        )
    ]


def param_string(cfg: MatchConfig) -> str:
    """The reference's knob-string format
    (``ConceptMapperEvalOutputCompiler.java:83-100``)."""
    return "_".join(
        [
            f"SearchStrategy:{cfg.search_strategy}",
            f"CaseMatch:{cfg.case_match}",
            f"Stemmer:{cfg.stemmer}",
            f"Stopwords:{cfg.stopwords}",
            f"OrderIndependentLookup:{'ON' if cfg.order_independent else 'OFF'}",
            f"FindAllMatches:{'YES' if cfg.find_all_matches else 'NO'}",
            f"SynonymType:{cfg.synonym_type}",
        ]
    )


@dataclass
class GridResult:
    index: int
    params: str
    tp: int
    fp: int
    fn: int

    @property
    def precision(self) -> float:
        return self.tp / (self.tp + self.fp) if self.tp + self.fp else 0.0

    @property
    def recall(self) -> float:
        return self.tp / (self.tp + self.fn) if self.tp + self.fn else 0.0

    @property
    def f1(self) -> float:
        p, r = self.precision, self.recall
        return 2 * p * r / (p + r) if p + r else 0.0


def run_grid(
    spark: SparkSession,
    transcripts: DataFrame,
    obo_paths: dict[str, str],
    gold: DataFrame,
    ontology: str = "CL",
    indices: Optional[Iterable[int]] = None,
    span: str = "STRICT",
) -> list[GridResult]:
    """Run detect+evaluate for each grid index; returns one summary row per
    permutation (the reference's compiled-TSV analogue).

    The dictionary is rebuilt per permutation (normalization knobs change
    the variant_norm side), mirroring the reference's per-index dictionary
    regeneration (``EntityFinder.java:176-179`` cache keyed by params)."""
    from .detect import build_dictionary_df, detect_mentions
    from .evaluate import compare, summary

    grid = param_grid()
    chosen = list(indices) if indices is not None else range(len(grid))
    out: list[GridResult] = []
    for i in chosen:
        cfg = grid[i]
        ddf = build_dictionary_df(spark, {ontology: obo_paths[ontology]},
                                  configs={ontology: cfg})
        mentions = detect_mentions(transcripts, ddf, configs={ontology: cfg})
        s = summary(
            compare(gold, mentions.select(
                "conv_id", "turn_idx", "concept_id", "begin", "end"
            ), span=span)
        ).first()
        out.append(GridResult(i, param_string(cfg), s.tp or 0, s.fp or 0,
                              s.fn or 0))
    return out


def compile_results(spark: SparkSession, results: list[GridResult]) -> DataFrame:
    """One row per param index with P/R/F — the output-compiler analogue."""
    rows = [
        (r.index, r.params, r.tp, r.fp, r.fn,
         round(r.precision, 6), round(r.recall, 6), round(r.f1, 6))
        for r in results
    ]
    return spark.createDataFrame(
        rows,
        "param_idx int, params string, tp long, fp long, fn long,"
        " precision double, recall double, f1 double",
    )
