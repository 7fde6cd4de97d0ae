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


from kgpipe.kgtrain import random_walks, split_triples


def test_split_triples_partitions_and_leakage_safety(spark):
    rows = [(f"e{i}", f"p{i % 3}", f"e{(i * 7 + 1) % 40}")
            for i in range(200)]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = split_triples(t, valid_frac=0.2, test_frac=0.2).collect()
    n_distinct = t.distinct().count()
    assert len(out) == n_distinct
    splits = {r["split"] for r in out}
    assert splits <= {"train", "valid", "test"}
    train = [r for r in out if r["split"] == "train"]
    held = [r for r in out if r["split"] != "train"]
    assert train and held  # both sides populated at these fractions
    train_ents = {r["subj"] for r in train} | {r["obj"] for r in train}
    train_preds = {r["pred"] for r in train}
    # leakage safety: every held-out entity and predicate is trainable
    for r in held:
        assert r["subj"] in train_ents
        assert r["obj"] in train_ents
        assert r["pred"] in train_preds
    # deterministic
    again = split_triples(t, valid_frac=0.2, test_frac=0.2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_split_triples_validates_fractions(spark):
    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        split_triples(t, valid_frac=0.6, test_frac=0.5)
    with pytest.raises(ValueError):
        split_triples(t, valid_frac=-0.1)


def test_random_walks_follow_edges_and_stop_at_sinks(spark):
    # path graph a->b->c->d plus a branch b->e (e is a sink)
    edges = [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "d"),
             ("b", "p", "e")]
    t = spark.createDataFrame(edges, ["subj", "pred", "obj"])
    out = random_walks(t, walk_length=3, walks_per_node=2).collect()
    adj = {("a", "b"), ("b", "c"), ("b", "e"), ("c", "d")}
    by_walk = {}
    for r in out:
        by_walk.setdefault((r["start"], r["walk"]), {})[r["step"]] = r["node"]
    assert len(by_walk) == 5 * 2  # every node starts walks_per_node walks
    for (start, _), steps in by_walk.items():
        assert steps[0] == start
        ks = sorted(steps)
        assert ks == list(range(len(ks)))  # no gaps: stops stay stopped
        for a, b in zip(ks, ks[1:]):
            assert (steps[a], steps[b]) in adj  # every hop is a real edge
    # sinks never move: walks from d and e are step-0 only
    assert max(s for (st, _), m in by_walk.items() if st == "d"
               for s in m) == 0
    # deterministic
    again = random_walks(t, walk_length=3, walks_per_node=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_random_walks_validates_params(spark):
    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        random_walks(t, walk_length=0)
    with pytest.raises(ValueError):
        random_walks(t, walks_per_node=0)


from kgpipe.kgtrain import (hash_embedding, link_prediction_ranks,
                            lp_metrics, walk_pairs)


def test_walk_pairs_counts_within_window(spark):
    walks = spark.createDataFrame(
        [("a", 0, 0, "a"), ("a", 0, 1, "b"), ("a", 0, 2, "c"),
         ("a", 0, 3, "d"),
         ("x", 1, 0, "x"), ("x", 1, 1, "b")],
        ["start", "walk", "step", "node"])
    got = {(r["center"], r["context"]): r["cnt"]
           for r in walk_pairs(walks, window=2).collect()}
    # window 2 over a-b-c-d: (a,b),(a,c),(b,c),(b,d),(c,d) + reverses;
    # plus the 2-node walk x-b
    assert got[("a", "b")] == 1 and got[("b", "a")] == 1
    assert got[("a", "c")] == 1 and got[("a", "d")] is not None \
        if ("a", "d") in got else True
    assert ("a", "d") not in got  # distance 3 > window
    assert got[("x", "b")] == 1 and got[("b", "x")] == 1
    # symmetric construction: count(u,v) == count(v,u)
    assert all(got[(c, x)] == got[(x, c)] for (c, x) in got)
    with pytest.raises(ValueError):
        walk_pairs(walks, window=0)


def test_hash_embedding_deterministic_and_bounded(spark):
    df = spark.createDataFrame([("a",), ("b",)], ["entity"])
    out = df.withColumn("v", hash_embedding("entity", dim=4, scale=10))
    rows = {r["entity"]: r["v"] for r in out.collect()}
    assert len(rows["a"]) == 4
    assert all(-10 <= x <= 10 for v in rows.values() for x in v)
    assert rows["a"] != rows["b"]
    again = {r["entity"]: r["v"] for r in out.collect()}
    assert rows == again


def test_link_prediction_ranks_exact_small_graph(spark):
    import hashlib

    edges = [(f"e{i}", "p", f"e{(i + 1) % 6}") for i in range(6)]
    edges += [("e0", "q", "e3")]
    t = spark.createDataFrame(edges, ["subj", "pred", "obj"])
    test = spark.createDataFrame([("e0", "p", "e1"), ("e0", "q", "e3")],
                                 ["subj", "pred", "obj"])
    got = {(r["subj"], r["pred"], r["obj"]): r["rank"]
           for r in link_prediction_ranks(t, test, dim=4,
                                          scale=10).collect()}

    # python reimplementation of the exact integer semantics
    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    def emb(x, salt):
        return [h32(f"{x}|{j}|{salt}") % 21 - 10 for j in range(4)]

    ents = sorted({s for s, _, _ in edges} | {o for _, _, o in edges})
    true = {(s, p, o) for s, p, o in edges}
    for (s, p, o), rank in got.items():
        qv = [a + b for a, b in zip(emb(s, "emb"), emb(p, "rel"))]

        def score(e):
            return sum(abs(a - b) for a, b in zip(qv, emb(e, "emb")))

        cands = [e for e in ents if e == o or (s, p, e) not in true]
        ts = score(o)
        expect = 1 + sum(1 for e in cands
                         if score(e) < ts or (score(e) == ts and e < o))
        assert rank == expect, (s, p, o)


def test_lp_metrics_integers(spark):
    ranks = spark.createDataFrame(
        [("a", "p", "b", 1), ("a", "p", "c", 7), ("a", "p", "d", 30)],
        ["subj", "pred", "obj", "rank"])
    m = lp_metrics(ranks).collect()[0]
    assert (m["n_test"], m["hits_at_1"], m["hits_at_10"],
            m["rank_sum"]) == (3, 1, 2, 38)


def test_biased_walks_exact_python_parity(spark):
    import hashlib

    from kgpipe.kgtrain import biased_walks

    edges = [("a", "p", "b"), ("a", "p", "c"), ("b", "p", "a"),
             ("b", "p", "c"), ("c", "p", "a"), ("c", "p", "d"),
             ("d", "p", "b")]
    t = spark.createDataFrame(edges, ["subj", "pred", "obj"])
    got = {(r["start"], r["walk"], r["step"]): r["node"]
           for r in biased_walks(t, walk_length=3, walks_per_node=2,
                                 w_return=1, w_common=4,
                                 w_far=2).collect()}

    def h32(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    adj = {}
    for s, _, o in edges:
        adj.setdefault(s, set()).add(o)
    adj = {k: sorted(v) for k, v in adj.items()}
    nodes = sorted({s for s, _, _ in edges} | {o for _, _, o in edges})

    expect = {}
    for start in nodes:
        for walk in (0, 1):
            expect[(start, walk, 0)] = start
            prev, cur = None, start
            for step in range(1, 4):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                r = h32(f"{start}|{walk}|{step - 1}|n2v")
                if prev is None:
                    nxt = nbrs[r % len(nbrs)]
                else:
                    ws = [1 if x == prev
                          else 4 if x in adj.get(prev, ())
                          else 2 for x in nbrs]
                    rr = r % sum(ws)
                    cum = 0
                    for x, w in zip(nbrs, ws):
                        cum += w
                        if rr < cum:
                            nxt = x
                            break
                expect[(start, walk, step)] = nxt
                prev, cur = cur, nxt
    assert got == expect


def test_biased_walks_validates_and_guards(spark):
    from kgpipe.kgtrain import biased_walks

    t = spark.createDataFrame([("a", "p", "b")], ["subj", "pred", "obj"])
    with pytest.raises(ValueError):
        biased_walks(t, w_return=-1)
    with pytest.raises(ValueError):
        biased_walks(t, w_return=0, w_common=0, w_far=0)
    # max_degree truncates candidate lists but still yields walks
    rows = [("h", "p", f"n{i}") for i in range(10)] + [("n0", "p", "h")]
    g = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    out = biased_walks(g, walk_length=2, walks_per_node=1, max_degree=3)
    picked = {r["node"] for r in out.collect() if r["step"] == 1
              and r["start"] == "h"}
    assert picked <= {"n0", "n1", "n2"}


def test_pra_path_features(spark):
    from kgpipe.kgtrain import pra_path_features

    t = spark.createDataFrame(
        [("a", "p", "m1"), ("a", "p", "m2"), ("m1", "q", "b"),
         ("m2", "q", "b"), ("m1", "r", "a"),  # closes back: excluded
         ("a", "p", "m1")],                   # duplicate triple
        ["subj", "pred", "obj"])
    got = {(r["subj"], r["obj"], r["pred1"], r["pred2"]): r["n_paths"]
           for r in pra_path_features(t).collect()}
    # a -p-> {m1,m2} -q-> b : one (p,q) feature with 2 distinct mids
    assert got[("a", "b", "p", "q")] == 2
    assert ("a", "a", "p", "r") not in got  # self-pair excluded
    # hub guard at cap 1: m1 (unlabeled fan-out 2: b, a) is dropped as a
    # mid; m2 (fan-out 1) survives, leaving one path a->m2->b
    capped = {(r["subj"], r["obj"], r["pred1"], r["pred2"]): r["n_paths"]
              for r in pra_path_features(t, max_mid_out=1).collect()}
    assert capped == {("a", "b", "p", "q"): 1}


def test_pra_path_features_brute_parity(spark):
    from collections import Counter

    from kgpipe.kgtrain import pra_path_features

    rows = [(f"n{(3 * i) % 11}", f"p{i % 3}", f"n{(5 * i + 1) % 11}")
            for i in range(40)]
    t = spark.createDataFrame(rows, ["subj", "pred", "obj"])
    got = {(r["subj"], r["obj"], r["pred1"], r["pred2"]): r["n_paths"]
           for r in pra_path_features(t, max_mid_out=None).collect()}

    e = sorted(set(rows))
    expect = {}
    for s1, p1, o1 in e:
        for s2, p2, o2 in e:
            if o1 == s2 and o2 != s1:
                expect.setdefault((s1, o2, p1, p2), set()).add(o1)
    expect = {k: len(v) for k, v in expect.items()}
    assert got == expect


def test_mention_contexts(spark):
    from kgpipe.kgtrain import mention_contexts

    t = spark.createDataFrame(
        [("c1", 0, "u", "alpha beta spark gamma delta", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    m = spark.createDataFrame(
        [("c1", 0, "T:0001", 11, 16, "spark")],
        ["conv_id", "turn_idx", "concept_id", "begin", "end",
         "covered_text"])
    r = mention_contexts(m, t, window_chars=6).collect()[0]
    assert r["left_ctx"] == " beta "
    assert r["right_ctx"] == " gamma"
    # window wider than available text clips at the boundaries
    r2 = mention_contexts(m, t, window_chars=100).collect()[0]
    assert r2["left_ctx"] == "alpha beta "
    assert r2["right_ctx"] == " gamma delta"
