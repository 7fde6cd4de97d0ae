"""KG quality / schema-validation operators over the (subj, pred, obj)
triple table: functional-predicate violation detection and
domain/range (namespace-signature) profiling + anomaly flagging.

The reference validates its graph out-of-band — triples land in the
Neo4j run catalog (`Neo4jRunCatalog.java`) and consistency is whatever
the downstream Cypher asks.  A production KG-construction pipeline wants
these checks IN the build job, before the snapshot flip: a functional
predicate emitting two objects for one subject, or a predicate whose
subject suddenly arrives from the wrong URI namespace, is a data bug the
writer should surface, not the reader.

All ops are pure column expressions + one key-width aggregation each —
no UDFs, no collects — so they hold at 10^12-triple scale:

* ``functional_violations`` shuffles once on (pred, subj); partial
  aggregation collapses the per-partition duplicates before the exchange.
* ``domain_range_profile`` / ``domain_range_violations`` aggregate on
  (pred, subj_ns, obj_ns) — cardinality is O(#predicates × #namespaces),
  i.e. tiny — so the violation flagging window runs over a
  few-hundred-row table no matter the corpus size.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

# scheme+authority of an http(s) URI / final-segment strip — both
# mirrored literally by the DuckDB oracle (RE2-compatible patterns)
_NS_HOST = "^(https?://[^/#]+)"
_NS_STRIP = "[#/][^#/]*$"


def namespace_col(c: Column, level: str = "host") -> Column:
    """Namespace of a node: for an http(s) URI, the scheme+authority
    (``level='host'``, default — cardinality bounded by the handful of
    vocabulary hosts a KG uses, so downstream profiles stay tiny at any
    triple count) or everything up to the last ``/``/``#`` separator
    (``level='prefix'`` — finer, but per-entity URIs like
    ``.../conv/<id>#t<k>`` make its cardinality data-dependent).  Any
    non-URI value (a plain literal like a role name) maps to the
    sentinel ``literal``."""
    if level == "host":
        uri_ns = F.regexp_extract(c, _NS_HOST, 1)
    elif level == "prefix":
        uri_ns = F.regexp_replace(c, _NS_STRIP, "")
    else:
        raise ValueError(f"unknown namespace level: {level!r}")
    return F.when(c.rlike("^https?://"), uri_ns).otherwise(F.lit("literal"))


def functional_violations(
    triples: DataFrame, functional_preds: Sequence[str]
) -> DataFrame:
    """Subjects that violate a functional-predicate constraint — i.e.
    carry MORE than one distinct object for a predicate declared
    functional: ``(pred, subj, n_obj)``.

    One hash aggregation keyed (pred, subj).  The predicate filter is an
    ``isin`` over a small literal list, pushed to the scan; the
    ``countDistinct`` collapses object duplicates map-side first, so the
    exchange carries at most one row per (pred, subj, obj).
    """
    return (
        triples.filter(F.col("pred").isin(list(functional_preds)))
        .groupBy("pred", "subj")
        .agg(F.countDistinct("obj").alias("n_obj"))
        .filter(F.col("n_obj") > 1)
    )


def domain_range_profile(triples: DataFrame, level: str = "host") -> DataFrame:
    """Namespace signature of every predicate:
    ``(pred, subj_ns, obj_ns, n)`` triple counts per (subject-namespace,
    object-namespace) pair.

    At the default host granularity the aggregate output is bounded by
    #preds × #hosts² (dozens of rows for a real KG), so downstream
    consumers — the violation window below, or a human — operate on a
    trivially small table.
    """
    return (
        triples.select(
            "pred",
            namespace_col(F.col("subj"), level).alias("subj_ns"),
            namespace_col(F.col("obj"), level).alias("obj_ns"),
        )
        .groupBy("pred", "subj_ns", "obj_ns")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def domain_range_violations(
    triples: DataFrame, min_share: float = 0.5, level: str = "host"
) -> DataFrame:
    """Minority namespace signatures per predicate — rows of the
    domain/range profile whose count is below ``min_share`` of the
    predicate's dominant signature: ``(pred, subj_ns, obj_ns, n,
    expected_subj_ns, expected_obj_ns, expected_n)``.

    "Expected" is the modal signature (max n, ties broken by
    (subj_ns, obj_ns) ascending so the result is deterministic).  The
    window runs over the aggregated profile — a few hundred rows — so
    this costs nothing beyond ``domain_range_profile`` itself.
    """
    prof = domain_range_profile(triples, level)
    w = Window.partitionBy("pred").orderBy(
        F.desc("n"), F.asc("subj_ns"), F.asc("obj_ns")
    )
    ranked = prof.withColumn("rk", F.row_number().over(w))
    modal = ranked.filter(F.col("rk") == 1).select(
        F.col("pred").alias("m_pred"),
        F.col("subj_ns").alias("expected_subj_ns"),
        F.col("obj_ns").alias("expected_obj_ns"),
        F.col("n").alias("expected_n"),
    )
    return (
        ranked.filter(F.col("rk") > 1)
        .drop("rk")
        .join(F.broadcast(modal), F.col("pred") == F.col("m_pred"))
        .drop("m_pred")
        .filter(F.col("n") < min_share * F.col("expected_n"))
    )


def predicate_completeness(
    triples: DataFrame,
    subject_type_pred: str,
    required_preds: Sequence[str],
    type_obj: Optional[str] = None,
) -> DataFrame:
    """Completeness report: for every subject declared of a type (has a
    ``subject_type_pred`` triple, optionally restricted to object
    ``type_obj``), which of the ``required_preds`` are missing —
    ``(pred, n_subjects, n_present, n_missing)``.

    Two aggregations and one equi-join on (pred, subj); the requirement
    fan-out is a narrow per-row ``explode`` of a literal array (no
    crossJoin, no shuffle of its own), so at 10^12-triple scale the only
    exchanges are the two hash-partitions on (pred, subj).
    """
    typed = triples.filter(F.col("pred") == subject_type_pred)
    if type_obj is not None:
        typed = typed.filter(F.col("obj") == type_obj)
    subjects = typed.select("subj").distinct()

    present = (
        triples.filter(F.col("pred").isin(list(required_preds)))
        .select("pred", "subj")
        .distinct()
        .withColumn("present", F.lit(1))
    )
    req = subjects.select(
        "subj",
        F.explode(F.array(*[F.lit(p) for p in required_preds])).alias("pred"),
    )
    joined = req.join(present, ["pred", "subj"], "left")
    n_present = F.sum(F.coalesce(F.col("present"), F.lit(0)))
    return joined.groupBy("pred").agg(
        F.count(F.lit(1)).alias("n_subjects"),
        n_present.alias("n_present"),
        (F.count(F.lit(1)) - n_present).alias("n_missing"),
    )


def triple_provenance(triples: DataFrame) -> DataFrame:
    """Per-distinct-triple provenance/support profile:
    ``(subj, pred, obj, n_support, n_convs, first_turn)`` — how many
    emitted rows back the triple, how many distinct conversations
    witnessed it, and the earliest turn index that asserted it.

    The support counts are the confidence signal the KG merge consumes
    (a triple seen in 40 conversations outranks a single-turn one) and
    the dedup ledger ``merge_triples_snapshot`` folds away.  One hash
    aggregation keyed on the triple itself — the same key the
    materialized table is partitioned on, so at cluster scale this rides
    the write partitioning with no extra exchange.  ``countDistinct``
    skips NULL conv_ids (conversation-less triple families) exactly like
    SQL ``count(DISTINCT ...)``.
    """
    return triples.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_support"),
        F.countDistinct("conv_id").alias("n_convs"),
        F.min("turn_idx").alias("first_turn"),
    )


def resolve_functional(
    triples: DataFrame, functional_preds: Sequence[str]
) -> DataFrame:
    """Conflict RESOLUTION for functional predicates (the repair step
    after ``functional_violations`` reports them): for each (subj, pred)
    with the predicate declared functional, keep the majority object —
    support = emitted-row count, ties broken by object ascending so the
    result is deterministic: ``(subj, pred, obj, n_support)``.

    One aggregation + one row_number window, both keyed on (subj, pred)
    — the window rides the aggregate's hash partitioning, so resolution
    costs a single exchange of (subj, pred, obj, count) rows regardless
    of corpus size.
    """
    cand = (
        triples.filter(F.col("pred").isin(list(functional_preds)))
        .groupBy("subj", "pred", "obj")
        .agg(F.count(F.lit(1)).alias("n_support"))
    )
    w = Window.partitionBy("subj", "pred").orderBy(
        F.desc("n_support"), F.asc("obj")
    )
    return (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("subj", "pred", "obj", "n_support")
    )


def characteristic_sets(triples: DataFrame) -> DataFrame:
    """Characteristic-set summary of the KG (Neumann & Moerkotte, ICDE
    2011): group subjects by the exact SET of predicates they carry —
    ``(pred_set, n_subjects, n_triples)`` with ``pred_set`` the sorted
    comma-joined distinct predicates.  This is the standard structural
    fingerprint of an RDF corpus: cardinality estimators key on it, and
    a new pred_set appearing between builds is a cheap schema-drift
    alarm alongside ``domain_range_violations``.

    Two hash aggregations: per-subject (``collect_set`` bounded by the
    predicate VOCABULARY size, a few dozen in any real KG — never by
    subject degree, duplicates collapse map-side) then per-signature
    over at most #subjects tiny rows.  All-integer counts + a canonical
    sorted signature string = oracle-hashable.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    per_subj = t.groupBy("subj").agg(
        F.concat_ws(
            ",", F.array_sort(F.collect_set("pred"))).alias("pred_set"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_subj.groupBy("pred_set").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("n").cast("long").alias("n_triples"),
    )


def kg_stats_report(
    triples: DataFrame, approx: bool = False, rsd: float = 0.01
) -> DataFrame:
    """One-row corpus dashboard for a KG build — the numbers a nightly
    job logs next to the snapshot pointer: ``(n_rows, n_triples,
    n_entities, n_preds, n_convs)`` = multiset row count, distinct
    triple count, distinct entity count (subjects ∪ objects), predicate
    vocabulary size, and witnessing-conversation count (NULL conv_ids
    ignored, matching SQL count-distinct).

    Two aggregation jobs joined on their single output rows: the main
    pass uses Spark's expand for its distinct counts, the entity count
    explodes (subj, obj) and distinct-counts the union — every step is
    a distributed partial aggregate (no collect_set of the vocabulary
    into one buffer).  ``approx=True`` swaps every distinct for
    HyperLogLog++ ``approx_count_distinct(rsd=1%)`` in the SAME plan
    shape — at 10^12 rows the exact expand rehashes the full triple
    width per distinct while the sketch is constant-memory per
    partition; the exact version is what the oracle hashes, the approx
    version is the nightly-dashboard default at scale (pytest-bounded
    against exact on the test corpus).
    """
    if approx:
        def cd(*cols):
            c = F.struct(*cols) if len(cols) > 1 else cols[0]
            return F.approx_count_distinct(c, rsd)
    else:
        cd = F.countDistinct
    base = triples.select(
        "subj", "pred", "obj",
        (F.col("conv_id") if "conv_id" in triples.columns
         else F.lit(None).cast("string")).alias("conv_id"),
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        cd("subj", "pred", "obj").cast("long").alias("n_triples"),
        cd("pred").cast("long").alias("n_preds"),
        cd("conv_id").cast("long").alias("n_convs"),
    )
    ents = base.select(
        F.explode(F.array("subj", "obj")).alias("_e")
    ).agg(cd("_e").cast("long").alias("n_entities"))
    return stats.crossJoin(ents).select(
        "n_rows", "n_triples", "n_entities", "n_preds", "n_convs")
