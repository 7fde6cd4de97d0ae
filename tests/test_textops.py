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
