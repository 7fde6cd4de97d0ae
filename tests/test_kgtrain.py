from __future__ import annotations

import pytest

from kgpipe.kgtrain import negative_samples


@pytest.fixture()
def triples(spark):
    rows = [(f"e{i}", "p", f"e{(i + 1) % 10}") for i in range(10)]
    rows += [("e0", "q", "e5"), ("e0", "q", "e5")]  # duplicate collapses
    return spark.createDataFrame(rows, ["subj", "pred", "obj"])


def test_negative_samples_shape_and_determinism(triples):
    neg = negative_samples(triples, k=3, n_buckets=8,
                           filter_positives=False)
    rows = neg.collect()
    # 11 distinct positives x 3 negatives, none dropped when unfiltered
    assert len(rows) == 33
    ents = {f"e{i}" for i in range(10)}
    assert all(r["neg_obj"] in ents for r in rows)
    assert {r["neg_i"] for r in rows} == {0, 1, 2}
    # bit-identical on re-run
    again = negative_samples(triples, k=3, n_buckets=8,
                             filter_positives=False).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_negative_samples_filters_positives(triples):
    neg = negative_samples(triples, k=4, n_buckets=8).collect()
    pos = {(r["subj"], r["pred"], r["obj"])
           for r in triples.select("subj", "pred", "obj").collect()}
    assert all((r["subj"], r["pred"], r["neg_obj"]) not in pos
               for r in neg)
    # at most k per positive, and the filter only ever removes rows
    from collections import Counter
    per = Counter((r["subj"], r["pred"], r["obj"]) for r in neg)
    assert max(per.values()) <= 4


def test_negative_samples_distribution(spark):
    # with many draws the sampler covers most of the vocabulary
    rows = [(f"s{i}", "p", f"o{i % 50}") for i in range(500)]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    neg = negative_samples(t, k=2, n_buckets=16, filter_positives=False)
    distinct_negs = neg.select("neg_obj").distinct().count()
    # vocab = 500 subjects + 50 objects = 550; 1000 draws should hit a
    # broad slice of it
    assert distinct_negs > 300
