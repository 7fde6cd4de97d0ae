"""Large-scale training-data text operators over a ``documents`` corpus:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), language ID,
quality scoring, token counting, document fingerprinting.

Everything in this module is pure column expressions — JVM-side, whole-stage
codegen, no Python — so the same logic is expressible as ANSI SQL for the
DuckDB correctness oracle (__spark_entry__.py).  Cross-engine determinism
comes from md5 (identical hex output in Spark and DuckDB) instead of
engine-specific hash functions.

Scale notes per operator are inline; the common theme: candidate generation
via equality on a derived key (hash, band, simhash prefix) so the heavy
self-join is an equi-join the planner can shuffle-partition, never a
cartesian similarity scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# tokenization helpers (column-level)
# ---------------------------------------------------------------------------


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.col(text), r"\s+"), lambda t: t != "")


def distinct_tokens_col(text: str = "text") -> Column:
    return F.array_distinct(tokens_col(text))


def token_count(df: DataFrame, text: str = "text") -> DataFrame:
    """Whitespace token count plus a BPE-ish subword proxy count
    (word-piece-like regex: alnum runs and single non-space symbols)."""
    return df.select(
        "doc_id",
        F.size(tokens_col(text)).alias("n_tokens"),
        F.size(
            F.regexp_extract_all(F.col(text), F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), 1)
        ).alias("n_subwords"),
        F.length(F.col(text)).alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: groups with >1 member, keyed by md5(text).
    One shuffle on the 32-hex-char key; the text column itself never
    shuffles (project before the groupBy)."""
    return (
        df.select(F.col("doc_id"), F.md5(F.col(text)).alias("h"))
        .groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
        )
        .filter(F.col("n_dups") > 1)
    )


def dedup_exact(df: DataFrame, text: str = "text") -> DataFrame:
    """Keep the min doc_id per identical text."""
    w = Window.partitionBy(F.md5(F.col(text))).orderBy("doc_id")
    return df.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    ).drop("__rn")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_signature(text: str = "text", k: int = 8) -> Column:
    """k-permutation MinHash over whitespace-token shingles: permutation i is
    simulated by md5(i || '|' || token); the signature element is the lexical
    min of the hex digests (md5 hex order is engine-portable)."""
    toks = distinct_tokens_col(text)
    def perm(i):
        return F.array_min(
            F.transform(toks, lambda t: F.md5(F.concat(F.lit(f"{i}|"), t)))
        )

    return F.array(*[perm(i) for i in range(k)])


def minhash_lsh_pairs(
    df: DataFrame,
    text: str = "text",
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """shingle → minhash → band → bucket-join near-duplicate pairs.

    Candidate pairs share at least one LSH band (band = concat of k/bands
    adjacent signature slots); candidates are verified with exact token
    Jaccard.  The join is an equi-join on (band_idx, band_value) — the LSH
    trick that keeps near-dup detection shuffle-partitionable at 100 TB
    (no O(n²) comparison)."""
    rows_per_band = k // bands
    sig = df.select(
        F.col("doc_id"), minhash_signature(text, k).alias("sig"),
        distinct_tokens_col(text).alias("toks"),
    )
    banded = sig.select(
        "doc_id",
        "toks",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.concat_ws(
                            "", *[F.col("sig")[b * rows_per_band + r]
                                  for r in range(rows_per_band)]
                        ).alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "toks", "band.band_idx", "band.band_val")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.toks").alias("toks_a"),
            F.col("b.toks").alias("toks_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    jac = F.size(F.array_intersect("toks_a", "toks_b")) / F.size(
        F.array_union("toks_a", "toks_b")
    )
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (direct verification for small candidate sets)
# ---------------------------------------------------------------------------

def ngram_set_col(text: str = "text", n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined)."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame, text: str = "text", n: int = 3, threshold: float = 0.3,
    key_prefix_len: int = 0,
) -> DataFrame:
    """All-pairs n-gram Jaccard within md5-prefix blocks (``key_prefix_len``
    > 0 blocks the quadratic join; 0 = exhaustive, for small inputs/tests)."""
    g = df.select(F.col("doc_id"), ngram_set_col(text, n).alias("grams"))
    if key_prefix_len:
        g = g.withColumn("blk", F.substring(F.md5(F.col("doc_id").cast("string")), 1, key_prefix_len))
        cond = (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    else:
        cond = F.col("a.doc_id") < F.col("b.doc_id")
    a, b = g.alias("a"), g.alias("b")
    jac = F.size(F.array_intersect("a.grams", "b.grams")) / F.size(
        F.array_union("a.grams", "b.grams")
    )
    return (
        a.join(b, cond)
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            "jaccard",
        )
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(text: str = "text", bits: int = 16) -> Column:
    """Sign-sum SimHash: bit j of the fingerprint is 1 when the sum over
    tokens of ±1 (sign taken from hex digit j of md5(token)) is positive.
    Engine-portable: only md5, substring, and integer arithmetic."""
    toks = distinct_tokens_col(text)
    def bit(j):
        contrib = F.aggregate(
            toks,
            F.lit(0),
            lambda acc, t: acc
            + F.when(
                F.substring(F.md5(t), j + 1, 1).isin(
                    "0", "1", "2", "3", "4", "5", "6", "7"
                ),
                F.lit(-1),
            ).otherwise(F.lit(1)),
        )
        return F.when(contrib > 0, F.lit(1 << j)).otherwise(F.lit(0))

    bit_cols = [bit(j) for j in range(bits)]
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out.cast("long")


def simhash_segments(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) per blocking segment: ``max_hamming + 1`` contiguous
    segments so a pair within the hamming budget shares at least one
    IDENTICAL segment (pigeonhole: k differing bits cannot touch all k+1
    segments).  Two halves would only cover hamming <= 1."""
    n_blocks = max_hamming + 1
    base, extra = divmod(bits, n_blocks)
    segs, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        segs.append((off, w))
        off += w
    return segs


def simhash_near_dups(df: DataFrame, text: str = "text", bits: int = 16,
                      max_hamming: int = 2) -> DataFrame:
    """Near-dups by SimHash Hamming distance; candidate generation blocks on
    ``max_hamming + 1`` bit-segments (see ``simhash_segments``)."""
    s = df.select(F.col("doc_id"), simhash_col(text, bits).alias("sh"))
    seg_keys = [
        F.concat(
            F.lit(f"S{i}:"),
            (F.shiftright(F.col("sh"), off).bitwiseAND((1 << w) - 1))
            .cast("string"),
        )
        for i, (off, w) in enumerate(simhash_segments(bits, max_hamming))
    ]
    keyed = s.select(
        "doc_id", "sh", F.explode(F.array(*seg_keys)).alias("blk")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    xor = F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    ham = F.bit_count(xor)
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# language ID (marker-token heuristic; portable scoring)
# ---------------------------------------------------------------------------

_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "es": ["el", "la", "los", "las", "que", "de", "y"],
    "fr": ["le", "la", "les", "des", "et", "que", "une"],
    "de": ["der", "die", "das", "und", "nicht", "ein", "mit"],
    "zh": ["的", "是", "了", "在", "我", "有", "和"],
}


def langid_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Marker-token language scores + argmax prediction.  The heuristic is a
    deliberately SQL-portable stand-in for character-n-gram profiles (the
    shape of the operator — per-doc scores, argmax, abstain on ties — is the
    real deliverable; swap the scorer for fasttext-style profiles off-sandbox)."""
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    score_cols = []
    def marker_score(markers):
        ms = tuple(markers)
        return F.size(F.filter(toks, lambda t: t.isin(*ms)))

    for lang, markers in _LANG_MARKERS.items():
        score_cols.append(marker_score(markers).alias(f"score_{lang}"))
    out = df.select("doc_id", *score_cols)
    best = F.greatest(*[F.col(f"score_{l}") for l in _LANG_MARKERS])
    pred = F.lit("und")
    for lang in reversed(list(_LANG_MARKERS)):
        pred = F.when(
            (F.col(f"score_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(pred)
    return out.withColumn("lang_pred", pred)


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

STOPWORD_SAMPLE = (
    "the a an and or of to in is are was for with that this on as at by".split()
)


def quality_scores(df: DataFrame, text: str = "text") -> DataFrame:
    """Gopher-style heuristic quality features: length, mean word length,
    stopword ratio, punctuation/symbol ratio, alpha ratio — and a composite
    keep/drop flag.  Pure column math; identical SQL runs in DuckDB."""
    toks = tokens_col(text)
    n_tok = F.size(toks)
    mean_wl = F.when(
        n_tok > 0,
        F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
        / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0,
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORD_SAMPLE)))
        / n_tok.cast("double"),
    ).otherwise(F.lit(0.0))
    n_alpha = F.length(F.regexp_replace(F.col(text), r"[^A-Za-z]", ""))
    alpha_ratio = F.when(
        F.length(F.col(text)) > 0, n_alpha / F.length(F.col(text)).cast("double")
    ).otherwise(F.lit(0.0))
    out = df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
    )
    keep = (
        (F.col("n_tokens") >= 5)
        & (F.col("mean_word_len") >= 2)
        & (F.col("mean_word_len") <= 12)
        & (F.col("alpha_ratio") >= 0.5)
    )
    return out.withColumn("keep", keep)


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def fingerprint(df: DataFrame, text: str = "text", w: int = 4) -> DataFrame:
    """Winnowing-style fingerprint: the minimum md5 over each document's
    w-gram shingles plus the whole-text md5.  Collisions on ``min_shingle``
    group near-identical prefixes/bodies cheaply."""
    grams = ngram_set_col(text, w)
    return df.select(
        "doc_id",
        F.md5(F.col(text)).alias("doc_md5"),
        F.array_min(F.transform(grams, lambda g: F.md5(g))).alias("min_shingle"),
    )
