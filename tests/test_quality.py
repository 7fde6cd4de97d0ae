from __future__ import annotations

import pytest

from kgpipe.quality import (
    domain_range_profile,
    domain_range_violations,
    functional_violations,
    predicate_completeness,
)


@pytest.fixture()
def triples(spark):
    rows = [
        # hasRole: functional — turn t1 violates it (two roles)
        ("https://kg.example.org/conv/c1#t1", "http://p/hasRole", "user"),
        ("https://kg.example.org/conv/c1#t1", "http://p/hasRole", "assistant"),
        ("https://kg.example.org/conv/c1#t2", "http://p/hasRole", "user"),
        # duplicate triple — NOT a violation (same object twice)
        ("https://kg.example.org/conv/c2#t1", "http://p/hasRole", "tool"),
        ("https://kg.example.org/conv/c2#t1", "http://p/hasRole", "tool"),
        # denotes: majority obo-namespace objects + one literal anomaly
        ("https://kg.example.org/conv/c1#t1", "http://p/denotes",
         "http://purl.obolibrary.org/obo/CL_0000001"),
        ("https://kg.example.org/conv/c1#t2", "http://p/denotes",
         "http://purl.obolibrary.org/obo/CL_0000002"),
        ("https://kg.example.org/conv/c2#t1", "http://p/denotes",
         "http://purl.obolibrary.org/obo/GO_0000003"),
        ("https://kg.example.org/conv/c2#t2", "http://p/denotes", "oops-literal"),
        # rdf:type for completeness: c1 typed, c2 typed
        ("https://kg.example.org/conv/c1", "rdf:type", "http://t/Document"),
        ("https://kg.example.org/conv/c2", "rdf:type", "http://t/Document"),
        # only c1 has a title
        ("https://kg.example.org/conv/c1", "http://p/title", "hello"),
    ]
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_functional_violations(triples):
    got = functional_violations(triples, ["http://p/hasRole"]).collect()
    assert len(got) == 1
    assert got[0]["subj"] == "https://kg.example.org/conv/c1#t1"
    assert got[0]["n_obj"] == 2
    # declaring denotes functional flags the multi-concept turns too
    got2 = {
        r["subj"]: r["n_obj"]
        for r in functional_violations(
            triples, ["http://p/hasRole", "http://p/denotes"]
        ).collect()
    }
    assert got2["https://kg.example.org/conv/c1#t1"] == 2


def test_domain_range_profile_namespaces(triples):
    prof = {
        (r["pred"], r["subj_ns"], r["obj_ns"]): r["n"]
        for r in domain_range_profile(triples).collect()
    }
    # default host granularity: namespace = scheme + authority
    assert prof[("http://p/hasRole", "https://kg.example.org",
                 "literal")] == 5
    assert prof[("http://p/denotes", "https://kg.example.org",
                 "http://purl.obolibrary.org")] == 3
    # the planted literal object shows up as its own signature row
    assert prof[("http://p/denotes", "https://kg.example.org",
                 "literal")] == 1
    # prefix granularity keeps the path up to the last separator
    prefix = {
        (r["pred"], r["subj_ns"], r["obj_ns"]): r["n"]
        for r in domain_range_profile(triples, level="prefix").collect()
    }
    assert prefix[("http://p/denotes", "https://kg.example.org/conv/c1",
                   "http://purl.obolibrary.org/obo")] == 2


def test_domain_range_violations(triples):
    v = domain_range_violations(triples, min_share=1.0).collect()
    bad = [(r["pred"], r["subj_ns"], r["obj_ns"]) for r in v]
    # the literal 'oops' object is a minority signature for denotes
    assert ("http://p/denotes", "https://kg.example.org", "literal") in bad
    row = next(r for r in v if r["obj_ns"] == "literal"
               and r["pred"] == "http://p/denotes")
    assert row["expected_obj_ns"] == "http://purl.obolibrary.org"
    assert row["n"] == 1 and row["expected_n"] == 3
    # a strict-majority threshold of 0 silences everything
    assert domain_range_violations(triples, min_share=0.0).count() == 0


def test_predicate_completeness(triples):
    rep = {
        r["pred"]: r
        for r in predicate_completeness(
            triples, "rdf:type", ["http://p/title", "http://p/hasRole"],
            type_obj="http://t/Document",
        ).collect()
    }
    # both typed conversations counted; only c1 has a title
    assert rep["http://p/title"]["n_subjects"] == 2
    assert rep["http://p/title"]["n_present"] == 1
    assert rep["http://p/title"]["n_missing"] == 1
    # neither conversation node itself has a hasRole triple (turns do)
    assert rep["http://p/hasRole"]["n_present"] == 0


def test_characteristic_sets(spark):
    from kgpipe.quality import characteristic_sets

    rows = [
        ("s1", "p", "x"), ("s1", "q", "y"), ("s1", "p", "z"),
        ("s2", "q", "a"), ("s2", "p", "b"),
        ("s3", "p", "c"),
        ("s1", "p", "x"),  # duplicate triple must not inflate counts
    ]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {r["pred_set"]: (r["n_subjects"], r["n_triples"])
           for r in characteristic_sets(t).collect()}
    assert got == {"p,q": (2, 5), "p": (1, 1)}


def test_kg_stats_report(spark):
    from kgpipe.quality import kg_stats_report

    t = spark.createDataFrame(
        [("a", "p", "b", "c1"), ("a", "p", "b", "c2"),  # dup triple
         ("b", "q", "c", "c1"), ("d", "p", "a", None)],
        ["subj", "pred", "obj", "conv_id"])
    r = kg_stats_report(t).collect()[0]
    assert (r["n_rows"], r["n_triples"], r["n_entities"],
            r["n_preds"], r["n_convs"]) == (4, 3, 4, 2, 2)
    # without a conv_id column: n_convs = 0
    r2 = kg_stats_report(t.drop("conv_id")).collect()[0]
    assert (r2["n_rows"], r2["n_convs"]) == (4, 0)


def test_kg_stats_report_approx(spark):
    from kgpipe.quality import kg_stats_report

    tri = spark.createDataFrame(
        [(f"e{i}", f"p{i % 3}", f"e{(i * 7) % 50}", f"c{i % 5}")
         for i in range(200)],
        ["subj", "pred", "obj", "conv_id"])
    exact = kg_stats_report(tri).collect()[0]
    approx = kg_stats_report(tri, approx=True).collect()[0]
    assert approx["n_rows"] == exact["n_rows"]  # count is always exact
    for c in ("n_triples", "n_entities", "n_preds", "n_convs"):
        # HLL++ at 1% rsd on small cardinalities: generous 5% bound
        assert abs(approx[c] - exact[c]) <= max(1, exact[c] * 0.05)
