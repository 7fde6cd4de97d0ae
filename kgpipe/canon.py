"""Ontology-ID canonicalization via distributed union-find.

Concepts that share an identical normalized synonym, or that are linked by
OBO ``replaced_by``/``consider``/``xref`` edges, collapse to one canonical
id (the lexicographically smallest member).  The reference handles the
obsolete/replaced_by side driver-side during dictionary builds
(``ConceptMapperDictionaryFileFactory`` via OntologyUtil); shared-synonym
merging is our scale extension for entity canonicalization.

Algorithm: iterative min-label propagation over the edge DataFrame —
each round every node adopts the minimum label among itself and its
neighbours; converges in O(log n) rounds for real synonym graphs (diameter
is tiny).  ``localCheckpoint`` every round cuts the lineage chain so plans
don't grow exponentially (SURVEY.md §7 hard parts).  No GraphFrames
dependency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Return ``(node, component)`` where component = min node id reachable.

    Edges are undirected; self-loops and duplicates are tolerated.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    )
    for _ in range(max_iter):
        # candidate labels via one hop
        prop = (
            sym.join(labels, sym["b"] == labels["node"])
            .select(F.col("a").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .union(prop)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def synonym_edges(dictionary: DataFrame) -> DataFrame:
    """Concepts sharing a normalized variant → star edges to the group min.

    Star topology (every member → group minimum) yields the same connected
    components as the full clique but emits O(group) rows instead of
    O(group²) — the skew-proof choice when a generic synonym is shared by
    many concepts.
    """
    grouped = (
        dictionary.filter(F.col("variant_norm") != "")
        .groupBy("variant_norm")
        .agg(F.collect_set("concept_id").alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.array_min("ids").alias("src"),
            F.explode("ids").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    return grouped


def canonicalize(
    mentions: DataFrame,
    dictionary: DataFrame,
    extra_edges: DataFrame | None = None,
) -> DataFrame:
    """Attach ``canonical_id`` to mentions: the component representative of
    the mention's concept under shared-synonym (+ optional ontology) edges.
    The component map is ontology-sized — broadcast join against the
    corpus-sized mention table."""
    edges = synonym_edges(dictionary)
    if extra_edges is not None:
        edges = edges.unionByName(extra_edges.select("src", "dst"))
    comp = connected_components(edges).withColumnRenamed("node", "concept_id")
    return (
        mentions.join(F.broadcast(comp), "concept_id", "left")
        .withColumn("canonical_id", F.coalesce("component", "concept_id"))
        .drop("component")
    )


def ontology_merge_edges(terms) -> list[tuple[str, str]]:
    """Driver-side helper: ``replaced_by``/``consider`` edges from parsed OBO
    Terms (obsolete-term redirection, cf. ``oboFiles/cl-basic.obo``
    ``replaced_by``/``consider`` stanzas)."""
    out: list[tuple[str, str]] = []
    for t in terms:
        if t.replaced_by:
            out.append((t.id, t.replaced_by))
        for c in t.consider:
            out.append((t.id, c))
    return out
