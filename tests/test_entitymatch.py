from __future__ import annotations

import pytest

from kgpipe.entitymatch import label_match_pairs, match_merge_map


@pytest.fixture()
def labels(spark):
    rows = [
        (1, "Fast Table Engine"),
        (2, "fast table engine v2"),     # 3/4 jaccard with 1
        (3, "Fast Table"),               # 2/3 with 1, 2/4 with 2
        (4, "slow ring"),
        (5, "Slow Ring"),                # exact token-set dup of 4
        (6, "unrelated thing"),
        (7, ""),                         # empty label: dropped
    ]
    return spark.createDataFrame(rows, ["id", "name"])


def test_label_match_exact_and_near(labels):
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["n_union"])
        for r in label_match_pairs(labels, "id", "name",
                                   threshold=0.5).collect()
    }
    assert got[(4, 5)] == (2, 2)       # case-insensitive exact
    assert got[(1, 2)] == (3, 4)       # near-duplicate above 0.5
    assert got[(1, 3)] == (2, 3)       # 0.67
    assert got[(2, 3)] == (2, 4)       # exactly 0.5 -> included (>=)
    assert (1, 6) not in got and (4, 6) not in got
    assert all(a < b for a, b in got)


def test_label_match_threshold(labels):
    got = {(r["id_a"], r["id_b"])
           for r in label_match_pairs(labels, "id", "name",
                                      threshold=0.9).collect()}
    assert got == {(4, 5)}


def test_label_match_hot_token_cap(spark):
    # every label shares the hot token 'common'; the rare tokens are
    # distinct, so capping the hot token kills all candidate generation
    rows = [(i, f"common tok{i}") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "name"])
    assert label_match_pairs(df, "id", "name", threshold=0.4,
                             max_block=5).count() == 0
    # without the cap, 'common' blocks everything together: 45 pairs at
    # jaccard 1/3 >= 0.33
    assert label_match_pairs(df, "id", "name", threshold=0.33,
                             max_block=100).count() == 45


def test_match_merge_map(labels):
    pairs = label_match_pairs(labels, "id", "name", threshold=0.5)
    comp = {r["node"]: r["component"]
            for r in match_merge_map(pairs).collect()}
    # 1-2-3 form one cluster; 4-5 another
    assert comp["1"] == comp["2"] == comp["3"] == "1"
    assert comp["4"] == comp["5"] == "4"


def test_blocking_quality(spark):
    from kgpipe.entitymatch import blocking_quality

    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (5, 6)], ["doc_a", "doc_b"])
    gold = spark.createDataFrame(
        [(2, 1), (3, 4), (7, 8)], ["doc_a", "doc_b"])
    r = blocking_quality(cand, gold).collect()[0]
    # (1,2)/(2,1) canonicalize to one candidate pair
    assert r["n_cand"] == 3
    assert r["n_gold"] == 3
    assert r["n_matched"] == 2  # (7,8) was never blocked together
