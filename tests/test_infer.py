"""kgpipe.infer (closure / entailment / BGP) + the new graph.bfs_distances
and quality provenance/resolution operators, on small hand-built graphs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgpipe.graph import bfs_distances
from kgpipe.infer import (
    closure_delta,
    match_pattern,
    rdfs_entail,
    transitive_closure,
)
from kgpipe.quality import resolve_functional, triple_provenance
from kgpipe.triples import RDF_TYPE


def _edges(spark, rows):
    return spark.createDataFrame(rows, "child string, parent string")


def _triples(spark, rows):
    return spark.createDataFrame(
        [(s, p, o, c, t) for s, p, o, c, t in rows],
        "subj string, pred string, obj string, conv_id string, turn_idx int",
    )


# ---------------------------------------------------------------- closure

def test_closure_chain_and_diamond(spark):
    # chain a->b->c->d plus diamond x->{l,r}->y
    e = _edges(spark, [
        ("a", "b"), ("b", "c"), ("c", "d"),
        ("x", "l"), ("x", "r"), ("l", "y"), ("r", "y"),
    ])
    got = {(r.node, r.anc) for r in transitive_closure(e).collect()}
    assert got == {
        ("a", "b"), ("a", "c"), ("a", "d"),
        ("b", "c"), ("b", "d"), ("c", "d"),
        ("x", "l"), ("x", "r"), ("x", "y"), ("l", "y"), ("r", "y"),
    }


def test_closure_deep_chain_log_rounds(spark):
    # depth 17 chain closes within the doubling bound (5 rounds)
    n = 17
    e = _edges(spark, [(f"n{i}", f"n{i+1}") for i in range(n)])
    got = transitive_closure(e, max_iters=5).count()
    assert got == n * (n + 1) // 2


def test_closure_cycle_converges(spark):
    e = _edges(spark, [("a", "b"), ("b", "a"), ("b", "c")])
    got = {(r.node, r.anc) for r in transitive_closure(e).collect()}
    # on a cycle every member reaches every member (incl. itself)
    assert got == {
        ("a", "b"), ("b", "a"), ("a", "a"), ("b", "b"),
        ("a", "c"), ("b", "c"),
    }


def _closure_set(df):
    return {(r.node, r.anc) for r in df.collect()}


def test_closure_delta_matches_full_recompute(spark):
    # base: two chains; delta: edges bridging them + a brand-new node,
    # so new paths interleave old runs and multiple delta edges
    base = _edges(spark, [
        ("a", "b"), ("b", "c"),
        ("x", "y"), ("y", "z"),
    ])
    delta = _edges(spark, [("c", "x"), ("z", "w"), ("n", "a")])
    inc = closure_delta(transitive_closure(base), delta)
    full = transitive_closure(base.unionAll(delta))
    assert _closure_set(inc) == _closure_set(full)


def test_closure_delta_cycle_and_empty(spark):
    base = _edges(spark, [("a", "b"), ("b", "c")])
    c0 = transitive_closure(base)
    # delta closes a cycle back to the root
    delta = _edges(spark, [("c", "a")])
    inc = closure_delta(c0, delta)
    full = transitive_closure(base.unionAll(delta))
    assert _closure_set(inc) == _closure_set(full)
    # empty delta is the identity
    empty = spark.createDataFrame([], "child string, parent string")
    assert _closure_set(closure_delta(c0, empty)) == _closure_set(c0)


# ----------------------------------------------------------------- rdfs

def test_rdfs_entail_rules(spark):
    tri = _triples(spark, [
        ("s1", "p_dom", "o1", None, None),
        ("s2", "p_rng", "o2", None, None),
        ("s3", RDF_TYPE, "B", None, None),
    ])
    domains = spark.createDataFrame([("p_dom", "A")], "pred string, cls string")
    ranges = spark.createDataFrame([("p_rng", "C")], "pred string, cls string")
    sub = _edges(spark, [("A", "Top"), ("B", "A"), ("C", "Top")])
    got = {(r.entity, r.cls) for r in rdfs_entail(
        tri, domains=domains, ranges=ranges, subclass_edges=sub
    ).collect()}
    assert got == {
        ("s1", "A"), ("s1", "Top"),            # rdfs2 + closure
        ("o2", "C"), ("o2", "Top"),            # rdfs3 + closure
        ("s3", "B"), ("s3", "A"), ("s3", "Top"),  # asserted + rdfs9
    }


def test_rdfs_entail_no_schema_is_asserted_types(spark):
    tri = _triples(spark, [
        ("s", RDF_TYPE, "T", None, None), ("s", "p", "o", None, None),
    ])
    got = {(r.entity, r.cls) for r in rdfs_entail(tri).collect()}
    assert got == {("s", "T")}


# ------------------------------------------------------------------ bfs

def test_bfs_undirected_min_dist(spark):
    tri = _triples(spark, [
        ("a", "p", "b", None, None), ("b", "p", "c", None, None),
        ("c", "p", "d", None, None), ("z", "p", "a", None, None),
        ("q", "p", "q2", None, None),  # unreachable island
    ])
    got = {(r.entity, r.dist) for r in
           bfs_distances(tri, ["a"], max_hops=2).collect()}
    assert got == {("a", 0), ("b", 1), ("z", 1), ("c", 2)}


def test_bfs_directed_and_multiseed(spark):
    tri = _triples(spark, [
        ("a", "p", "b", None, None), ("b", "p", "c", None, None),
        ("x", "p", "a", None, None),
    ])
    got = {(r.entity, r.dist) for r in
           bfs_distances(tri, ["a", "c"], max_hops=3, directed=True).collect()}
    # x is upstream of seed a: not reached in directed mode; c is a seed
    assert got == {("a", 0), ("c", 0), ("b", 1)}


def test_bfs_early_stop_and_guard(spark):
    tri = _triples(spark, [("a", "p", "b", None, None)])
    got = bfs_distances(tri, ["a"], max_hops=10).collect()
    assert {(r.entity, r.dist) for r in got} == {("a", 0), ("b", 1)}
    with pytest.raises(ValueError, match="max_frontier"):
        bfs_distances(tri, ["a"], max_hops=1, max_frontier=0)


# ------------------------------------------------------------------ bgp

def test_match_pattern_chain(spark):
    tri = _triples(spark, [
        ("t1", "denotes", "c1", None, None),
        ("t1", "hasRole", "user", None, None),
        ("c1", "cooc", "c2", None, None),
        ("t2", "denotes", "c9", None, None),  # no role -> excluded
    ])
    out = match_pattern(tri, [
        ("?t", "denotes", "?c"),
        ("?t", "hasRole", "?r"),
        ("?c", "cooc", "?d"),
    ])
    assert sorted(out.columns) == ["c", "d", "r", "t"]
    # column order varies with physical join-key placement; compare by name
    assert [r.asDict() for r in out.collect()] == [
        {"t": "t1", "c": "c1", "r": "user", "d": "c2"}
    ]


def test_match_pattern_repeated_var_and_set_semantics(spark):
    tri = _triples(spark, [
        ("a", "p", "a", None, None),
        ("a", "p", "b", None, None),
        ("a", "p", "a", "dup", 1),  # duplicate triple row collapses
    ])
    out = match_pattern(tri, [("?x", "p", "?x")])
    assert [tuple(r) for r in out.collect()] == [("a",)]


def test_match_pattern_rejects_disconnected_and_constant(spark):
    tri = _triples(spark, [("a", "p", "b", None, None)])
    with pytest.raises(ValueError, match="disconnected"):
        match_pattern(tri, [("?x", "p", "?y"), ("?z", "q", "?w")])
    with pytest.raises(ValueError, match="no variables"):
        match_pattern(tri, [("a", "p", "b")])


# ----------------------------------------------------- provenance/resolve

def test_triple_provenance(spark):
    tri = _triples(spark, [
        ("s", "p", "o", "c1", 3),
        ("s", "p", "o", "c1", 1),
        ("s", "p", "o", "c2", 7),
        ("s", "p", "o2", None, None),
    ])
    got = {(r.subj, r.pred, r.obj, r.n_support, r.n_convs, r.first_turn)
           for r in triple_provenance(tri).collect()}
    assert got == {
        ("s", "p", "o", 3, 2, 1),
        ("s", "p", "o2", 1, 0, None),
    }


def test_resolve_functional_majority_and_tie(spark):
    tri = _triples(spark, [
        ("t1", "hasRole", "user", "c", 1),
        ("t1", "hasRole", "user", "c", 2),
        ("t1", "hasRole", "tool", "c", 3),
        ("t2", "hasRole", "b", "c", 1),   # tie with 'a' -> obj asc wins
        ("t2", "hasRole", "a", "c", 2),
        ("t1", "other", "x", "c", 1),     # non-functional pred untouched
    ])
    got = {(r.subj, r.obj, r.n_support) for r in
           resolve_functional(tri, ["hasRole"]).collect()}
    assert got == {("t1", "user", 2), ("t2", "a", 1)}


def test_expand_ancestors(spark):
    from kgpipe.infer import expand_ancestors

    mentions = spark.createDataFrame(
        [("c1", 0, "A", 0, 3, "foo"), ("c1", 1, "B", 4, 7, "bar"),
         ("c1", 2, "Z", 0, 1, "no-parents")],
        ["conv_id", "turn_idx", "concept_id", "begin", "end",
         "covered_text"])
    isa = spark.createDataFrame(
        [("A", "M1"), ("A", "M2"), ("M1", "R"), ("M2", "R"), ("B", "R")],
        ["child", "parent"])
    got = {(r["concept_id"], r["ancestor"])
           for r in expand_ancestors(mentions, isa).collect()}
    # diamond dedup: A reaches R via both mids but yields ONE (A, R) row
    assert got == {("A", "M1"), ("A", "M2"), ("A", "R"), ("B", "R")}


def test_path_query(spark):
    from kgpipe.infer import path_query
    import pytest as _pt

    rows = [
        ("t1", "denotes", "c1"), ("t1", "denotes", "c1"),  # dup path src
        ("t2", "denotes", "c2"),
        ("c1", "cooc", "c2"), ("c1", "rel", "c3"),
        ("c2", "cooc", "c3"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {(r["start"], r["end"])
           for r in path_query(t, [["denotes"], ["cooc", "rel"]]).collect()}
    # t1 -denotes-> c1 -(cooc|rel)-> {c2, c3}; t2 -> c2 -cooc-> c3
    assert got == {("t1", "c2"), ("t1", "c3"), ("t2", "c3")}
    # single step = plain pred-filtered distinct edge set
    one = {(r["start"], r["end"])
           for r in path_query(t, [["denotes"]]).collect()}
    assert one == {("t1", "c1"), ("t2", "c2")}
    with _pt.raises(ValueError):
        path_query(t, [])


def test_rule_mining_stats(spark):
    from kgpipe.infer import rule_mining_stats

    rows = [
        ("x", "p1", "y"), ("x", "p2", "y"), ("x", "p1", "y"),  # dup
        ("a", "p1", "b"),
        ("c", "p2", "d"), ("c", "p3", "d"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {(r["pred1"], r["pred2"]): (r["n_both"], r["n_p1"])
           for r in rule_mining_stats(t).collect()}
    # p1 => p2 holds on (x,y) only; p1 has 2 distinct pairs
    assert got[("p1", "p2")] == (1, 2)
    assert got[("p2", "p1")] == (1, 2)  # p2 also has 2 pairs
    assert got[("p2", "p3")] == (1, 2)
    assert got[("p3", "p2")] == (1, 1)  # p3 => p2 is exact
    assert ("p1", "p3") not in got
    # min_support filters
    assert rule_mining_stats(t, min_support=2).count() == 0


def test_path_rule_stats(spark):
    from kgpipe.infer import path_rule_stats

    rows = [
        # two (p1, p2) paths x->z1->y and x->z2->y collapse to ONE pair
        ("x", "p1", "z1"), ("z1", "p2", "y"),
        ("x", "p1", "z2"), ("z2", "p2", "y"),
        ("x", "p3", "y"),              # direct edge -> support
        ("a", "p1", "m"), ("m", "p2", "b"),  # path without direct edge
        ("c", "p1", "c2"), ("c2", "p2", "c"),  # x == y excluded
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {(r["pred1"], r["pred2"], r["pred3"]):
           (r["n_support"], r["n_pairs"])
           for r in path_rule_stats(t).collect()}
    # (p1, p2) connects {(x,y), (a,b)}; only (x,y) has direct p3
    assert got[("p1", "p2", "p3")] == (1, 2)
    # p1 itself is a direct predicate on path-connected pairs? no:
    # (x,z1) pairs are not (p1,p2)-path endpoints -> no other rules
    assert len(got) == 1


def test_path_rule_stats_mid_guard(spark):
    from kgpipe.infer import path_rule_stats

    rows = (
        [("x", "p1", "hub")]
        + [("hub", "p2", f"y{i}") for i in range(20)]
        + [("x", "p3", "y0")]
    )
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    # hub fan-out 20 > cap 10 -> all hub-mediated paths vanish
    assert path_rule_stats(t, max_mid_out=10).count() == 0
    got = {(r["pred1"], r["pred2"], r["pred3"]): (r["n_support"],
                                                  r["n_pairs"])
           for r in path_rule_stats(t, max_mid_out=None).collect()}
    assert got[("p1", "p2", "p3")] == (1, 20)


def test_apply_rules(spark):
    from kgpipe.infer import apply_rules, path_rule_stats

    rows = [
        # (p1, p2) connects (x,y) [direct p3 present] and (a,b) [absent]
        ("x", "p1", "z1"), ("z1", "p2", "y"), ("x", "p3", "y"),
        ("a", "p1", "m"), ("m", "p2", "b"),
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    rules = path_rule_stats(t)  # (p1,p2,p3): support 1 of 2 pairs
    # at 50% the rule fires and predicts the missing edge only
    got = [(r["subj"], r["pred"], r["obj"], r["pred1"], r["pred2"])
           for r in apply_rules(t, rules, min_confidence_pct=50).collect()]
    assert got == [("a", "p3", "b", "p1", "p2")]
    # at 60% the 50%-confidence rule no longer qualifies
    assert apply_rules(t, rules, min_confidence_pct=60).count() == 0
