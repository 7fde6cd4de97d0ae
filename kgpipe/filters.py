"""Projection/filter operators (SURVEY.md §2.2) as declarative DataFrame
transformations — Catalyst pushes these into the scan where possible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def remove_slots(df: DataFrame) -> DataFrame:
    """SlotRemovalFilter_AE(REMOVE_ALL) — ``EntityFinder.java:102``: a pure
    projection."""
    return df.drop("slots") if "slots" in df.columns else df


def remove_type(df: DataFrame, type_name: str = "token",
                col: str = "concept_id") -> DataFrame:
    """ClassMentionRemovalFilter_AE — drop annotations of a given type
    (``ConceptMapperPipelineFactory.java:105-113`` removes TOKEN annots)."""
    return df.filter(F.col(col) != F.lit(type_name))


def remove_duplicates(df: DataFrame) -> DataFrame:
    """DuplicateAnnotationRemovalFilter_AE (``EntityFinder.java:104-105``)."""
    return df.dropDuplicates(["conv_id", "turn_idx", "concept_id", "begin", "end"])


def score_filter(df: DataFrame, cutoff: int, col: str = "score") -> DataFrame:
    """GenericAnnotationLoader score filter: keep ``score >= cutoff``
    (``GenericAnnotationLoader.java:91-97``)."""
    return df.filter(F.col(col) >= F.lit(cutoff))


def remove_subtree(df: DataFrame, closure_ids: set[str],
                   col: str = "concept_id") -> DataFrame:
    """OntologyClassRemovalFilter_AE — drop annotations whose concept falls
    in the subtree of given roots (``CraftRunGenericComparison.java:164-193``,
    GO roots GO:0008150/0003674/0005575).  The closure id set is small
    (ontology-sized), so it ships as a broadcast literal set and the filter
    stays a narrow, pushdown-able predicate."""
    return df.filter(~F.col(col).isin(list(closure_ids)))


def strip_namespace(df: DataFrame, col: str = "concept_id") -> DataFrame:
    """OboNamespaceRemover_AE — strip ``NS:`` prefixes before comparison
    (``CraftConceptMapperEvaluator.java:188,208-212``)."""
    return df.withColumn(col, F.regexp_replace(F.col(col), r"^[A-Za-z_]+:", ""))


def override_set(df: DataFrame, set_name: str) -> DataFrame:
    """AnnotatorOverrider_AE / AnnotationSetOverrider_AE — label annotations
    as gold vs eval before union (``EvaluationPipeline.java:171-208``)."""
    return df.withColumn("set", F.lit(set_name))


NEGATION_TRIGGERS = ("no", "not", "without", "never", "denies")


def negated_mentions(
    mentions: DataFrame,
    transcripts: DataFrame,
    window: int = 40,
    triggers: tuple[str, ...] = NEGATION_TRIGGERS,
) -> DataFrame:
    """NegEx-style negation flagging (Chapman et al., J Biomed Inform
    2001 — the standard public algorithm, pre-trigger window variant):
    a mention is ``negated`` when a trigger word occurs in the
    ``window`` characters immediately before its span with no clause
    boundary (``.`` or ``;``) between trigger and mention.  Output =
    the mention columns + ``negated`` boolean.

    The window is ``right(left(text, begin), window)`` — identical
    1-based substring semantics in Spark SQL and DuckDB, so the flag is
    oracle-hashable.  One broadcast-friendly equi-join on
    (conv_id, turn_idx) + a JVM-side regexp: no Python, no extra
    exchange beyond the join (which co-partitions with the detector's
    own output key).
    """
    pat = r"(?i)\b(" + "|".join(triggers) + r")\b[^.;]*$"
    t = transcripts.select("conv_id", "turn_idx", "text")
    pre = F.expr(f"right(left(text, begin), {int(window)})")
    return (
        mentions.join(t, ["conv_id", "turn_idx"])
        .withColumn("negated", pre.rlike(pat))
        .drop("text")
    )
