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

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

# ---------------------------------------------------------------------------
# tokenization helpers (column-level)
# ---------------------------------------------------------------------------


def tokens_col(text: str = "text") -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(F.col(text), r"\s+"), lambda t: t != "")


def distinct_tokens_col(text: str = "text") -> Column:
    return F.array_distinct(tokens_col(text))


def subword_tokens_col(text: str = "text") -> Column:
    """BPE-ish deterministic subword proxy (word-piece-like regex: alnum
    runs and single non-space symbols) — the demonstration ``tokens_fn``
    for the pluggable-token-counter seam (a real BPE would plug in the
    same way: any text-column → array<string> column builder)."""
    return F.regexp_extract_all(
        F.col(text), F.lit(r"([A-Za-z0-9]+|[^A-Za-z0-9\s])"), 1)


def token_count(df: DataFrame, text: str = "text",
                tokens_fn=None) -> DataFrame:
    """Token count (``tokens_fn`` column-builder, default whitespace
    ``tokens_col``) plus the BPE-ish subword proxy count and char length.
    Pass ``tokens_fn=subword_tokens_col`` (or a real-tokenizer column
    builder) to budget packing-pipeline tokens instead of words."""
    n_tok = F.size((tokens_fn or tokens_col)(text))
    return df.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.size(subword_tokens_col(text)).alias("n_subwords"),
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
    max_bucket_size: Optional[int] = 500,
    drop_observation=None,
) -> DataFrame:
    """shingle → minhash → band → bucket-join near-duplicate pairs.

    Candidate pairs share at least one LSH band (band = concat of k/bands
    adjacent signature slots); candidates are verified with exact token
    Jaccard.  The join is an equi-join on (band_idx, band_value) — the LSH
    trick that keeps near-dup detection shuffle-partitionable at 100 TB
    (no O(n²) comparison).

    Two scale guards (both mirrored in the SQL oracle):

    - **id-only candidate join**: the banded frame carries only
      ``(doc_id, band_idx, band_val)`` — fixed-width keys — through the
      self-join; the token sets re-attach by doc_id only for the exact
      Jaccard verify of the (corpus-≪) surviving candidates.  Without
      this the shuffle payload at 100 TB is the token arrays themselves.
    - **hot-bucket cap** (``max_bucket_size``, default 500; ``None``
      opts out): a degenerate band value — empty docs, boilerplate-
      identical shards — puts B docs in one bucket and would emit B²
      candidates.  Buckets larger than the cap are dropped whole (the
      bounded-candidate trade SimHash's combination blocking makes;
      members of a >cap bucket almost always share another, smaller
      band, and truly mass-duplicated text is exact-dedup's job —
      ``dedup_keep`` — not LSH's).  The cap is a window count over the
      same (band_idx, band_val) hash partitioning the join shuffles on,
      so it adds no exchange; post-cap, candidate count is bounded by
      ``bands * n_docs * max_bucket_size``.

    ``drop_observation``: an optional ``pyspark.sql.Observation`` making
    the cap's truncation OBSERVABLE instead of silent — after any action
    on the returned frame, ``observation.get`` reports
    ``n_dropped_band_rows`` (doc×band rows removed by the cap) and
    ``n_dropped_buckets`` (approx distinct capped buckets).  Rides the
    same action via ``DataFrame.observe`` — no extra job.
    """
    banded = _band_frame(df, text, k, bands)
    if max_bucket_size is not None:
        w = Window.partitionBy("band_idx", "band_val")
        banded = banded.withColumn("_bsz", F.count(F.lit(1)).over(w))
        if drop_observation is not None:
            dropped = F.col("_bsz") > max_bucket_size
            banded = banded.observe(
                drop_observation,
                F.sum(dropped.cast("long")).alias("n_dropped_band_rows"),
                F.approx_count_distinct(
                    F.when(dropped,
                           F.concat_ws("|", "band_idx", "band_val"))
                ).alias("n_dropped_buckets"),
            )
        banded = banded.filter(
            F.col("_bsz") <= max_bucket_size).drop("_bsz")

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
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    toks = df.select("doc_id", distinct_tokens_col(text).alias("toks"))
    cand = (
        cand.join(
            toks.select(F.col("doc_id").alias("doc_a"),
                        F.col("toks").alias("toks_a")), "doc_a")
        .join(
            toks.select(F.col("doc_id").alias("doc_b"),
                        F.col("toks").alias("toks_b")), "doc_b")
    )
    jac = F.size(F.array_intersect("toks_a", "toks_b")) / F.size(
        F.array_union("toks_a", "toks_b")
    )
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _band_frame(df: DataFrame, text: str, k: int, bands: int) -> DataFrame:
    """``(doc_id, band_idx, band_val)`` LSH band frame — the fixed-width
    join keys of the MinHash candidate generation (identical banding to
    minhash_lsh_pairs, factored for the cross-corpus variant)."""
    rows_per_band = k // bands
    sig = df.select(F.col("doc_id"), minhash_signature(text, k).alias("sig"))
    return sig.select(
        "doc_id",
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
    ).select("doc_id", "band.band_idx", "band.band_val")


def minhash_cross_pairs(
    new_df: DataFrame,
    ref_df: DataFrame,
    text: str = "text",
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket_size: Optional[int] = 500,
) -> DataFrame:
    """Cross-corpus near-duplicate pairs: ``(new_id, ref_id, jaccard)``
    for every ``new_df`` document whose token Jaccard with a ``ref_df``
    document is >= the threshold — the incremental-ingest form of
    ``minhash_lsh_pairs`` ("is this new batch already in the training
    corpus?"), and the near-dup analogue of the ``decontam`` exact
    n-gram screen.

    Same scale guards as the within-corpus op: the band join carries
    id-only fixed-width keys, and the hot-bucket cap applies to the
    REFERENCE side (the 100-TB side — a degenerate reference bucket is
    what explodes; the new batch is the small increment and joins
    whole).  Candidates are bounded by
    ``bands * |new| * max_bucket_size``.  The equi-join on
    (band_idx, band_val) hash-partitions both sides; at a real 1000:1
    corpus ratio the banded new side broadcasts.
    """
    nb = _band_frame(new_df, text, k, bands)
    rb = _band_frame(ref_df, text, k, bands)
    if max_bucket_size is not None:
        w = Window.partitionBy("band_idx", "band_val")
        rb = (
            rb.withColumn("_bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("_bsz") <= max_bucket_size)
            .drop("_bsz")
        )
    cand = (
        nb.alias("n")
        .join(rb.alias("r"),
              (F.col("n.band_idx") == F.col("r.band_idx"))
              & (F.col("n.band_val") == F.col("r.band_val")))
        .select(F.col("n.doc_id").alias("new_id"),
                F.col("r.doc_id").alias("ref_id"))
        .dropDuplicates(["new_id", "ref_id"])
    )
    nt = new_df.select(F.col("doc_id").alias("new_id"),
                       distinct_tokens_col(text).alias("toks_n"))
    rt = ref_df.select(F.col("doc_id").alias("ref_id"),
                       distinct_tokens_col(text).alias("toks_r"))
    jac = F.size(F.array_intersect("toks_n", "toks_r")) / F.size(
        F.array_union("toks_n", "toks_r")
    )
    return (
        cand.join(nt, "new_id").join(rt, "ref_id")
        .withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("new_id", "ref_id", "jaccard")
    )


def dedup_against(
    new_df: DataFrame,
    ref_df: DataFrame,
    text: str = "text",
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket_size: Optional[int] = 500,
) -> DataFrame:
    """The ``new_df`` rows that are NOT near-duplicates of anything in
    ``ref_df`` (left-anti on ``minhash_cross_pairs`` matches) — the
    ingest filter a training-data pipeline runs on every new crawl batch
    before appending to the corpus."""
    matches = minhash_cross_pairs(
        new_df, ref_df, text, k, bands, jaccard_threshold, max_bucket_size
    ).select(F.col("new_id").alias("doc_id")).distinct()
    return new_df.join(matches, "doc_id", "left_anti")


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
    n_blocks: int = 0,
) -> DataFrame:
    """n-gram Jaccard pairs with CONTENT-keyed blocking.

    ``n_blocks`` > 0: block key i (i < n_blocks) = the min over the
    document's n-gram shingles of ``md5(i || '|' || shingle)`` — a MinHash
    of the exact shingle set the Jaccard is computed on, so two documents
    with Jaccard J share at least one of the ``n_blocks`` keys with
    probability 1-(1-J)^n_blocks (>= 93% at J=0.5, n_blocks=4).  This keeps
    the self-join an equi-join at corpus scale WITHOUT the recall collapse
    of id-derived blocking (an id hash is uncorrelated with content, so true
    near-dup pairs land in different blocks almost surely).

    ``n_blocks`` = 0: exhaustive all-pairs — the verification/spec mode for
    small candidate sets (e.g. downstream of an LSH pre-filter), never the
    corpus-scale entry point."""
    g = df.select(F.col("doc_id"), ngram_set_col(text, n).alias("grams"))
    if n_blocks:
        def _minhash_fn(i: int):
            # MUST stay unary: F.transform dispatches on lambda arity and
            # passes the element *index* as a second argument, which would
            # clobber an `i=i` default with an unstable Column and re-draw
            # the hash family on every plan build (nondeterministic recall).
            return lambda s: F.md5(F.concat(F.lit(f"{i}|"), s))

        keys = F.array(*[
            F.array_min(F.transform(F.col("grams"), _minhash_fn(i)))
            for i in range(n_blocks)
        ])
        g = g.select(
            "doc_id", "grams",
            F.posexplode(keys).alias("blk_idx", "blk"),
        )
        cond = (
            (F.col("a.blk_idx") == F.col("b.blk_idx"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
    else:
        cond = F.col("a.doc_id") < F.col("b.doc_id")
    a, b = g.alias("a"), g.alias("b")
    out = (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.grams").alias("ga"),
            F.col("b.grams").alias("gb"),
        )
    )
    if n_blocks:
        out = out.dropDuplicates(["doc_a", "doc_b"])
    return (
        out.withColumn(
            "jaccard",
            F.size(F.array_intersect("ga", "gb"))
            / F.size(F.array_union("ga", "gb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(text: str = "text", bits: int = 64) -> Column:
    """Sign-sum SimHash, up to 64 bits: the sign for bit j of a token is
    bit ``j % 4`` of hex digit ``j // 4`` of ``md5(token)``; fingerprint
    bit j is 1 when the signed sum over tokens is positive.

    Single pass over the tokens: md5 is evaluated ONCE per token and all
    ``bits`` counters update in one ``aggregate``/``zip_with`` walk (the
    naive per-bit form re-hashes every token ``bits`` times).  Bit 63 uses
    the two's-complement weight so a full 64-bit fingerprint fits a signed
    long (xor/bit_count operate on the bit pattern regardless of sign).
    Engine-portable: only md5, substring, and integer arithmetic — the
    DuckDB oracle re-derives the identical value (naive form) at <= 32 bits.
    """
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in [1, 64]")
    toks = distinct_tokens_col(text)
    hs = F.transform(toks, lambda t: F.md5(t))

    def signs(h: Column) -> Column:
        out = []
        for j in range(bits):
            d, m = divmod(j, 4)
            v = F.conv(F.substring(h, d + 1, 1), 16, 10).cast("int")
            out.append(
                F.when(
                    F.shiftright(v, m).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
            )
        return F.array(*out)

    counts = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(acc, signs(h), lambda a, s: a + s),
    )
    weights = F.array(*[
        F.lit((1 << j) if j < 63 else -(1 << 63)).cast("long")
        for j in range(bits)
    ])
    return F.aggregate(
        F.zip_with(
            counts, weights,
            lambda c, w: F.when(c > 0, w).otherwise(F.lit(0)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def simhash_segments(
    bits: int, max_hamming: int, n_segments: int | None = None
) -> list[tuple[int, int]]:
    """(offset, width) per blocking segment.  ``n_segments`` defaults to
    ``max_hamming + 1`` (pigeonhole: k differing bits cannot touch all k+1
    segments, so some segment is identical); more segments enable
    combination blocking (see ``simhash_block_combos``)."""
    n_blocks = n_segments or (max_hamming + 1)
    if n_blocks < max_hamming + 1:
        raise ValueError("need at least max_hamming + 1 segments")
    if n_blocks > bits:
        raise ValueError("more segments than bits")
    base, extra = divmod(bits, n_blocks)
    segs, off = [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        segs.append((off, w))
        off += w
    return segs


def simhash_block_combos(
    bits: int, max_hamming: int, n_segments: int | None = None
) -> list[list[tuple[int, int]]]:
    """Combination blocking keys (Manku/Jarvelin-style): split the
    fingerprint into ``n_segments`` segments and key each candidate table on
    a combination of ``n_segments - max_hamming`` of them.  A pair within
    the hamming budget dirties at most ``max_hamming`` segments, so the
    combination made of the clean segments matches exactly.  Wider combined
    keys (e.g. 5 x 8 bits = 40 bits at 64/8/3) shrink random collisions
    from per-segment 2^-8 to 2^-40 at the cost of C(8,5)=56 tables — the
    production trade-off for 10^9-doc corpora, vs the max_hamming+1
    single-segment scheme whose narrow blocks degenerate toward cartesian."""
    import itertools

    segs = simhash_segments(bits, max_hamming, n_segments)
    take = len(segs) - max_hamming
    return [list(c) for c in itertools.combinations(segs, take)]


def simhash_near_dups(
    df: DataFrame,
    text: str = "text",
    bits: int = 64,
    max_hamming: int = 3,
    n_segments: int | None = None,
) -> DataFrame:
    """Near-dups by SimHash Hamming distance; candidate generation joins on
    combination blocking keys (``simhash_block_combos``).  Defaults are the
    production configuration: 64-bit fingerprint, hamming <= 3, 8 segments
    → 56 tables of 40-bit keys.  ``n_segments=None`` with a small ``bits``
    falls back to ``max_hamming + 1`` single-segment blocks (the
    oracle-checkable configuration)."""
    if n_segments is None:
        n_segments = 8 if bits >= 64 else max_hamming + 1
    s = df.select(F.col("doc_id"), simhash_col(text, bits).alias("sh"))

    def seg_val(off: int, w: int) -> Column:
        # logical shift: sign bit of a full 64-bit fingerprint must not smear
        return F.shiftrightunsigned(F.col("sh"), off).bitwiseAND(
            F.lit((1 << w) - 1)
        )

    combo_keys = [
        F.concat_ws(
            "|", F.lit(f"C{i}"),
            *[seg_val(off, w).cast("string") for off, w in combo],
        )
        for i, combo in enumerate(
            simhash_block_combos(bits, max_hamming, n_segments)
        )
    ]
    keyed = s.select(
        "doc_id", "sh", F.explode(F.array(*combo_keys)).alias("blk")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh")))
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
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


def ngram_instances_col(text: str = "text", n: int = 2) -> Column:
    """Word n-gram instances WITH multiplicity (space-joined), in document
    order — the multiset ``ngram_set_col`` is the distinct view of."""
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    return F.when(
        F.size(toks) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))),
    ).otherwise(F.array().cast("array<string>"))


def repetition_scores(df: DataFrame, text: str = "text",
                      ns: tuple = (2, 3)) -> DataFrame:
    """Gopher-style WITHIN-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1 repetition filters): for each n in
    ``ns``, the fraction of the document's n-gram instances whose n-gram
    occurs more than once in the document (``dup_{n}gram_frac``), and for
    the smallest n the fraction covered by the single most frequent n-gram
    (``top_{n}gram_frac``).  High values flag looping/boilerplate text that
    poisons LM training.

    Pure per-row column math over the token array — narrow, JVM-side, no
    shuffle at any corpus size.  The shingle arrays and per-gram counts are
    staged through separate projections: referencing an aliased non-cheap
    array more than once keeps CollapseProject from inlining it, so each
    array materializes ONCE per row instead of re-evaluating the whole
    shingle construction inside every per-distinct-gram lambda step
    (measured 500× slowdown when inlined).  Identical list algebra runs in
    DuckDB for the oracle."""
    staged = df.select(
        "doc_id",
        *[ngram_instances_col(text, n).alias(f"_i{n}") for n in ns],
    )
    def _count_fn(col_name: str):
        # unary on purpose — a binary lambda would receive the element
        # INDEX as its second argument (F.transform dispatches on arity)
        return lambda g: F.size(
            F.filter(F.col(col_name), lambda x: x == g))

    counted = staged.select(
        "doc_id",
        *[F.col(f"_i{n}") for n in ns],
        # per-distinct-gram occurrence counts over the materialized array
        *[
            F.transform(
                F.array_distinct(F.col(f"_i{n}")), _count_fn(f"_i{n}")
            ).alias(f"_pc{n}")
            for n in ns
        ],
    )
    cols = [F.col("doc_id")]
    for n in ns:
        total = F.size(F.col(f"_i{n}"))
        per_gram = F.col(f"_pc{n}")
        # an instance is "duplicate" iff its gram has count >= 2: the
        # number of such instances = total - #grams-with-count-1
        n_singles = F.size(F.filter(per_gram, lambda c: c == 1))
        dup_frac = F.when(
            total > 0,
            (total - n_singles) / total.cast("double"),
        ).otherwise(F.lit(0.0))
        # integer numerators alongside the ratio: cross-engine hash checks
        # compare exact ints, not float representations
        cols.append(total.alias(f"n_{n}gram_inst"))
        cols.append((total - n_singles).alias(f"n_{n}gram_dup"))
        cols.append(F.round(dup_frac, 4).alias(f"dup_{n}gram_frac"))
        if n == min(ns):
            top_count = F.when(total > 0, F.array_max(per_gram)).otherwise(
                F.lit(0))
            cols.append(top_count.alias(f"top_{n}gram_count"))
    return counted.select(*cols)


def boilerplate_ngrams(df: DataFrame, text: str = "text", n: int = 3,
                       min_docs: int = 2) -> DataFrame:
    """CROSS-corpus boilerplate measurement (the C4/CCNet repeated-
    paragraph filter generalized to token shingles, since transcript turns
    carry no newline structure): an n-gram is *boilerplate* when it occurs
    in >= ``min_docs`` distinct documents; each document reports how much
    of it is made of such corpus-repeated material.

    Returns ``(doc_id, n_inst, n_boiler, boiler_frac)`` where ``n_inst``
    counts the doc's n-gram instances and ``n_boiler`` those whose gram is
    corpus-boilerplate.

    Scale shape (the part that matters at 100 TB): per-(doc, gram) counts
    first — ONE partial-aggregated shuffle keyed on (doc_id, gram), after
    which each gram appears once per doc, bounding the doc-frequency
    aggregate and the join below by distinct-gram volume, not instance
    volume.  Doc-frequency is a second map-side-combined hash-agg on gram;
    the flag join back is a shuffle equi-join on gram (skew-safe: a gram's
    fan-out is its doc count, and both sides are pre-aggregated); the
    final per-doc rollup rides a fourth key-width shuffle.  Raw text never
    shuffles — only 3n-token shingle keys and counts."""
    gcount = (
        df.select(
            F.col("doc_id"),
            F.explode(ngram_instances_col(text, n)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    docfreq = gcount.groupBy("gram").agg(
        F.count(F.lit(1)).alias("n_docs"))
    joined = gcount.join(docfreq, "gram")
    boiler_k = F.when(F.col("n_docs") >= min_docs, F.col("k")).otherwise(
        F.lit(0))
    per_doc = joined.groupBy("doc_id").agg(
        F.sum("k").cast("bigint").alias("n_inst"),
        F.sum(boiler_k).cast("bigint").alias("n_boiler"),
    )
    frac = F.when(
        F.col("n_inst") > 0,
        F.col("n_boiler") / F.col("n_inst").cast("double"),
    ).otherwise(F.lit(0.0))
    return per_doc.withColumn("boiler_frac", F.round(frac, 4))


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


# ---------------------------------------------------------------------------
# near-duplicate clustering (fuzzy dedup keep-one)
# ---------------------------------------------------------------------------

def near_dup_clusters(
    df: DataFrame,
    text: str = "text",
    k: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_iter: int = 20,
    max_bucket_size: Optional[int] = 500,
) -> DataFrame:
    """Fuzzy dedup keep-one: MinHash-LSH near-dup pairs → connected
    components (near-duplicate-ness is transitively closed, as chains of
    small edits connect documents that never pair directly) → every doc
    mapped to its cluster representative ``(doc_id, keep_doc_id)`` with
    ``keep_doc_id`` = the cluster's min doc_id (docs with no near-dup keep
    themselves).  The component step is the distributed pointer-jumping
    union-find (kgpipe.canon) over the pair edges — edge count ≈ near-dup
    pair count, orders of magnitude below the corpus, so the iterative part
    never touches document text."""
    from .canon import connected_components

    pairs = minhash_lsh_pairs(df, text, k, bands, jaccard_threshold,
                              max_bucket_size=max_bucket_size)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(edges, max_iter=max_iter).withColumnRenamed(
        "node", "doc_id"
    )
    return (
        df.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("keep_doc_id"),
        )
    )


def abbreviations(
    transcripts: DataFrame, max_len: int = 4
) -> DataFrame:
    """Abbreviation-definition mining, the deterministic initialism
    core of Schwartz & Hearst (PSB 2003): a parenthesized short form
    of 2-``max_len`` letters whose letters equal, in order, the
    initials of the immediately preceding tokens defines that token
    span as its long form — ``(conv_id, turn_idx, pos, short_form,
    long_form)`` with ``pos`` the short form's 0-based token position
    (multiple definitions per turn all surface).  The full S&H
    right-to-left character alignment admits non-initial matches;
    the initials-only subset is the high-precision rule that needs no
    per-character loop, so both engines compute it identically.

    posexplode + a turn-local position-band self-join (candidate
    window ≤ ``max_len`` tokens per short form — bounded fan-out,
    same banded shape as anaphora_links) + one order-canonical
    aggregate.  Raw text never shuffles; only (turn key, pos, token).
    """
    toks = transcripts.select(
        "conv_id", "turn_idx",
        F.posexplode(F.split(F.lower(F.col("text")), " "))
        .alias("pos", "tok"),
    )
    pat = r"^\(([a-z]{2,%d})\)$" % int(max_len)
    sfs = (
        toks.filter(F.col("tok").rlike(pat))
        .select(
            "conv_id", "turn_idx", F.col("pos").alias("sf_pos"),
            F.regexp_extract("tok", pat, 1).alias("sf"),
        )
        .withColumn("k", F.length("sf"))
    )
    cand = sfs.join(toks, ["conv_id", "turn_idx"]).filter(
        (F.col("pos") >= F.col("sf_pos") - F.col("k"))
        & (F.col("pos") < F.col("sf_pos"))
    )
    grouped = (
        cand.groupBy("conv_id", "turn_idx", "sf_pos", "sf", "k")
        .agg(F.array_sort(F.collect_list(
            F.struct("pos", "tok"))).alias("_lf"))
        .withColumn(
            "_initials",
            F.concat_ws("", F.transform(
                "_lf", lambda s: F.substring(s["tok"], 1, 1))),
        )
    )
    return (
        grouped
        .filter((F.size("_lf") == F.col("k"))
                & (F.col("_initials") == F.col("sf")))
        .select(
            "conv_id", "turn_idx", F.col("sf_pos").alias("pos"),
            F.col("sf").alias("short_form"),
            F.concat_ws(
                " ", F.transform("_lf", lambda s: s["tok"])
            ).alias("long_form"),
        )
    )
