"""KG-embedding training-data operators: deterministic filtered negative
sampling over the triple table.

Embedding trainers (TransE/DistMult-family) consume each positive triple
with ``k`` corrupted negatives.  At 10^12-triple scale the sampler has to
be (a) distributed — no driver-side entity vocabulary, (b) deterministic
— retries and engine ports must produce bit-identical batches, and
(c) filtered — corruptions that happen to be true triples are excluded.

The recipe here avoids every global bottleneck: entities are assigned to
``n_buckets`` hash buckets; within a bucket they get dense indices from a
bucket-partitioned window (parallel — never a global row_number); a
triple's i-th negative picks (bucket, index) by engine-portable md5
arithmetic and equi-joins the entity back.  Per-bucket counts are a
``n_buckets``-row broadcast.  All randomness is md5 — the same hex math
DuckDB computes, so the whole sampler is oracle-hashable.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F


def _h32(*cols: Column | str) -> Column:
    """Engine-portable 32-bit hash: first 8 hex digits of md5 of the
    '|'-joined inputs, as a long (DuckDB mirror:
    ``('0x' || substr(md5(a || '|' || b), 1, 8))::bigint``)."""
    joined = F.concat_ws("|", *cols)
    return F.conv(F.substring(F.md5(joined), 1, 8), 16, 10).cast("long")


def negative_samples(
    triples: DataFrame,
    k: int = 2,
    n_buckets: int = 1024,
    filter_positives: bool = True,
) -> DataFrame:
    """``k`` deterministic corrupted-object negatives per distinct
    positive triple: ``(subj, pred, obj, neg_i, neg_obj)`` where
    ``neg_obj`` is drawn pseudo-uniformly from the full entity
    vocabulary (subjects ∪ objects) by md5 arithmetic on
    (subj, pred, obj, neg_i).  ``filter_positives`` (default) drops
    corruptions that collide with a true triple — the standard
    "filtered" evaluation/training setting — so a row can yield fewer
    than ``k`` negatives.

    Plan: entity vocab = one distinct; per-bucket dense indices = one
    window PARTITIONED by hash bucket (parallel, unlike a global
    row_number); per-bucket counts = ``n_buckets`` rows, broadcast onto
    the exploded triples; the draw equi-joins (bucket, idx) against the
    indexed vocab; the positive filter is one left-anti join on the
    triple key.  Nothing touches the driver; every exchange is keyed by
    bucket or triple-key hashes.  Draws are uniform within a bucket and
    near-uniform overall (bucket sizes deviate by O(sqrt(|V|/B))).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t = triples.select("subj", "pred", "obj").distinct()
    ents = (
        t.select(F.col("subj").alias("entity"))
        .unionAll(t.select(F.col("obj").alias("entity")))
        .distinct()
        .withColumn("bucket", F.pmod(_h32(F.col("entity"), F.lit("ent")),
                                     F.lit(n_buckets)))
    )
    w = Window.partitionBy("bucket").orderBy("entity")
    ents_idx = ents.withColumn("idx", F.row_number().over(w) - 1)
    # dense 0..nb-1 sequence over the NON-EMPTY buckets (a sparse vocab
    # can leave hash buckets empty; drawing over the dense sequence keeps
    # every draw resolvable).  counts is <= n_buckets rows, so the global
    # window/aggregate here are explicitly bounded driver-independent
    # single-partition ops on a tiny frame.
    counts = (
        ents_idx.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("bseq", F.row_number().over(Window.orderBy("bucket")) - 1)
    )
    nb = counts.agg(F.count(F.lit(1)).alias("nb"))

    drawn = (
        t.withColumn("neg_i",
                     F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .crossJoin(F.broadcast(nb))
        .withColumn(
            "bseq",
            F.pmod(_h32("subj", "pred", "obj",
                        F.col("neg_i").cast("string"), F.lit("b")),
                   F.col("nb")),
        )
        .join(F.broadcast(counts), "bseq")
        .withColumn(
            "idx",
            F.pmod(_h32("subj", "pred", "obj",
                        F.col("neg_i").cast("string"), F.lit("p")),
                   F.col("cnt")),
        )
        .join(ents_idx.select("bucket", "idx",
                              F.col("entity").alias("neg_obj")),
              ["bucket", "idx"])
        .select("subj", "pred", "obj", "neg_i", "neg_obj")
    )
    if filter_positives:
        pos = t.select("subj", "pred",
                       F.col("obj").alias("neg_obj"))
        drawn = drawn.join(pos, ["subj", "pred", "neg_obj"], "left_anti")
    return drawn


def split_triples(
    triples: DataFrame,
    valid_frac: float = 0.05,
    test_frac: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Deterministic, LEAKAGE-SAFE train/valid/test split of the distinct
    triple set: ``(subj, pred, obj, split)``.

    Assignment is pure md5 arithmetic on the triple key (engine-portable,
    reproducible across runs/engines/cluster sizes — no sampling state).
    Leakage safety is the standard KG-embedding constraint: a held-out
    triple whose subject, object, or predicate never appears in train is
    unscorable at eval time, so any valid/test triple with an
    out-of-train entity or predicate is DEMOTED to train.  One pass of
    demotion is exact for entities/predicates (train only grows, so no
    new violations appear).

    Plan: one distinct, two narrow hash-key joins against the train
    entity set (keyed on entity id) and one broadcast join against the
    train predicate vocabulary; no shuffle wider than the triple key.
    """
    if valid_frac < 0 or test_frac < 0 or valid_frac + test_frac >= 1:
        raise ValueError(
            f"fractions must be >= 0 and sum < 1, got {valid_frac}, {test_frac}")
    mod = 1_000_000
    t = triples.select("subj", "pred", "obj").distinct()
    u = F.pmod(_h32("subj", "pred", "obj", F.lit(salt)), F.lit(mod))
    test_cut = int(test_frac * mod)
    valid_cut = test_cut + int(valid_frac * mod)
    assigned = t.withColumn(
        "split0",
        F.when(u < test_cut, F.lit("test"))
        .when(u < valid_cut, F.lit("valid"))
        .otherwise(F.lit("train")),
    ).localCheckpoint(eager=True)
    train = assigned.filter(F.col("split0") == "train")
    train_ents = (
        train.select(F.col("subj").alias("entity"))
        .unionAll(train.select(F.col("obj").alias("entity")))
        .distinct()
    )
    train_preds = train.select("pred").distinct()
    se = train_ents.select(F.col("entity").alias("subj"),
                           F.lit(1).alias("_se"))
    oe = train_ents.select(F.col("entity").alias("obj"),
                           F.lit(1).alias("_oe"))
    pe = train_preds.select("pred", F.lit(1).alias("_pe"))
    out = (
        assigned.join(se, "subj", "left")
        .join(oe, "obj", "left")
        .join(F.broadcast(pe), "pred", "left")
        .select(
            "subj", "pred", "obj",
            F.when(F.col("split0") == "train", F.lit("train"))
            .when(
                F.col("_se").isNull() | F.col("_oe").isNull()
                | F.col("_pe").isNull(),
                F.lit("train"),
            )
            .otherwise(F.col("split0"))
            .alias("split"),
        )
    )
    return out


def random_walks(
    triples: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 2,
    seed: str = "rw",
) -> DataFrame:
    """Deterministic uniform random walks over the distinct directed
    entity graph — the DeepWalk/node2vec(p=q=1) corpus generator:
    ``(start, walk, step, node)`` rows, ``walks_per_node`` walks from
    every entity, each up to ``walk_length`` steps (a walk stops early
    at a node with no out-edges).

    "Random" is md5 arithmetic on (start, walk, step, seed) — the same
    engine-portable scheme as ``negative_samples`` — so the corpus is
    bit-reproducible across runs, engines, and cluster sizes (no RNG
    state, no per-partition seeds to coordinate).  Neighbor selection
    indexes a per-source ranked adjacency (row_number partitioned by
    source — parallel, never global) by ``hash % out_degree``.

    Plan: ``walk_length`` rounds, each ONE equi-join of the frontier
    against the indexed adjacency keyed (node, idx), with the frontier
    ``localCheckpoint``ed so plan depth stays O(1).  State is one row
    per live walk — |V| * walks_per_node at most, shrinking as walks
    hit sinks.  Hub skew is bounded: the adjacency join is keyed on the
    walk's CURRENT node, and a hub's row count in the join equals the
    number of walks currently at it, not its degree.
    """
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    e = triples.select("subj", "obj").distinct()
    adj_w = Window.partitionBy("subj").orderBy("obj")
    adj = (
        e.withColumn("idx", F.row_number().over(adj_w) - 1)
        .select(F.col("subj").alias("node"), "idx",
                F.col("obj").alias("nxt"))
        .localCheckpoint(eager=True)
    )
    deg = adj.groupBy("node").agg(F.max("idx").alias("_m")).select(
        "node", (F.col("_m") + 1).alias("deg"))
    nodes = (
        e.select(F.col("subj").alias("node"))
        .unionAll(e.select(F.col("obj").alias("node")))
        .distinct()
    )
    state = (
        nodes.withColumn(
            "walk", F.explode(F.sequence(F.lit(0),
                                         F.lit(walks_per_node - 1))))
        .select(F.col("node").alias("start"), "walk",
                F.lit(0).alias("step"), "node")
        .localCheckpoint(eager=True)
    )
    out = state
    for s in range(1, walk_length + 1):
        cur = state.join(deg, "node")
        pick = F.pmod(
            _h32("start", F.col("walk").cast("string"),
                 F.col("step").cast("string"), F.lit(seed)),
            F.col("deg"),
        )
        state = (
            cur.withColumn("idx", pick)
            .join(adj, ["node", "idx"])
            .select("start", "walk", F.lit(s).alias("step"),
                    F.col("nxt").alias("node"))
            .localCheckpoint(eager=True)
        )
        out = out.unionAll(state)
    return out


def walk_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram training pairs from a random-walk corpus:
    ``(center, context, cnt)`` — every ordered pair of distinct walk
    positions within ``window`` steps of each other, aggregated to
    counts (the word2vec-over-walks corpus of DeepWalk §4.2, as a
    weighted pair table instead of materialized repeats).

    Plan: one self-equi-join keyed (start, walk) — group size is
    walk_length+1, a small constant, so there is NO skew regardless of
    graph shape — followed by a (center, context) count with map-side
    partial aggregation.  Hub nodes cost rows proportional to how many
    walks visit them, never to their degree.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    a = walks.select("start", "walk", F.col("step").alias("sa"),
                     F.col("node").alias("center"))
    b = walks.select("start", "walk", F.col("step").alias("sb"),
                     F.col("node").alias("context"))
    return (
        a.join(b, ["start", "walk"])
        .filter((F.col("sb") != F.col("sa"))
                & (F.abs(F.col("sb") - F.col("sa")) <= window))
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hash_embedding(col: Column | str, dim: int = 8, scale: int = 1000,
                   salt: str = "emb") -> Column:
    """Deterministic INTEGER embedding for a string column: component
    ``j`` is ``md5(value|j|salt) % (2*scale+1) - scale`` — an
    engine-portable stand-in for trained vectors that keeps every
    downstream distance/score in exact integer arithmetic (so link-
    prediction evaluation is oracle-hashable with no float drift)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.pmod(_h32(c, j.cast("string"), F.lit(salt)),
                         F.lit(2 * scale + 1)) - F.lit(scale),
    )


def link_prediction_ranks(
    triples: DataFrame,
    test: DataFrame,
    dim: int = 8,
    scale: int = 1000,
    filtered: bool = True,
) -> DataFrame:
    """TransE-style link-prediction evaluation: for each test triple
    (s, p, o), rank the true object among ALL candidate entities by
    L1 score ``||emb(s) + emb(p) - emb(o')||_1`` (lower = better):
    ``(subj, pred, obj, rank)``.  ``filtered`` (the standard setting)
    excludes candidates o' != o where (s, p, o') is itself a true
    triple.  Rank ties break deterministically: a tied candidate
    counts as better iff its id sorts before the true object.

    Embeddings are the exact-integer ``hash_embedding`` vectors
    (entity salt "emb", predicate salt "rel"), so ranks are
    bit-reproducible and DuckDB-hashable.  Swap in trained float
    vectors by pre-joining your own ``e_vec`` — the plan is identical.

    Plan: the test side (|test| rows, one array each) is BROADCAST
    against the entity table — the standard score-against-full-vocab
    eval is inherently |test| x |V|, so callers bound |test| (eval
    samples), never |V|.  The L1 fold is JVM-side zip_with/aggregate
    (no Python).  Rank = one (subj, pred, obj)-keyed window + count,
    the same hash partitioning reused across both.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    ents = (
        t.select(F.col("subj").alias("entity"))
        .unionAll(t.select(F.col("obj").alias("entity")))
        .distinct()
        .withColumn("e_vec", hash_embedding("entity", dim, scale, "emb"))
    )
    q = (
        test.select("subj", "pred", "obj").distinct()
        .withColumn("s_vec", hash_embedding("subj", dim, scale, "emb"))
        .withColumn("p_vec", hash_embedding("pred", dim, scale, "rel"))
        .withColumn("q_vec", F.zip_with("s_vec", "p_vec",
                                        lambda a, b: a + b))
        .drop("s_vec", "p_vec")
    )
    scored = (
        ents.crossJoin(F.broadcast(q))
        .withColumn(
            "score",
            F.aggregate(
                F.zip_with("q_vec", "e_vec", lambda a, b: F.abs(a - b)),
                F.lit(0).cast("long"), lambda acc, x: acc + x),
        )
        .select("subj", "pred", "obj", "entity", "score")
    )
    if filtered:
        known = t.select("subj", "pred", F.col("obj").alias("entity"),
                         F.lit(1).alias("_k"))
        scored = (
            scored.join(known, ["subj", "pred", "entity"], "left")
            .filter(F.col("_k").isNull()
                    | (F.col("entity") == F.col("obj")))
            .drop("_k")
        )
    w = Window.partitionBy("subj", "pred", "obj")
    better = (
        (F.col("score") < F.col("ts"))
        | ((F.col("score") == F.col("ts"))
           & (F.col("entity") < F.col("obj")))
    )
    return (
        scored.withColumn(
            "ts",
            F.max(F.when(F.col("entity") == F.col("obj"),
                         F.col("score"))).over(w))
        .groupBy("subj", "pred", "obj")
        .agg((F.sum(F.when(better, 1).otherwise(0)) + 1)
             .cast("long").alias("rank"))
    )


def lp_metrics(ranks: DataFrame) -> DataFrame:
    """Integer link-prediction summary over ``link_prediction_ranks``
    output — ``(n_test, hits_at_1, hits_at_10, rank_sum)``.  All
    columns are exact integers (MRR is left to callers: cross-engine
    float summation order makes it un-hashable)."""
    return ranks.agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.when(F.col("rank") <= 1, 1).otherwise(0))
        .cast("long").alias("hits_at_1"),
        F.sum(F.when(F.col("rank") <= 10, 1).otherwise(0))
        .cast("long").alias("hits_at_10"),
        F.sum("rank").cast("long").alias("rank_sum"),
    )


def biased_walks(
    triples: DataFrame,
    walk_length: int = 3,
    walks_per_node: int = 2,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
    seed: str = "n2v",
    max_degree: Optional[int] = None,
) -> DataFrame:
    """Deterministic node2vec-style SECOND-ORDER biased walks over the
    distinct directed entity graph: ``(start, walk, step, node)``, same
    shape as ``random_walks``.  From step 2 on, the next-hop weight
    depends on the PREVIOUS node exactly as in node2vec (Grover &
    Leskovec 2016): ``w_return`` if the candidate IS the previous node
    (distance 0 — their 1/p), ``w_common`` if the previous node has an
    edge to it (distance 1), ``w_far`` otherwise (distance 2 — their
    1/q), with INTEGER weights so the cumulative-weight draw
    (``md5(start|walk|step|seed) %% total_weight``) is exact and
    engine-portable.  Step 1 has no previous node and is uniform.

    Plan per biased step: one equi-join of the frontier against the
    ranked adjacency on the CURRENT node (this materializes each live
    walk's candidate list — the irreducible cost of second-order bias;
    per-walk cost is deg(cur), NOT deg^2: no per-edge alias tables),
    one left join against the edge set keyed (prev, candidate) for the
    distance-1 test, and one (start, walk)-keyed window for the
    cumulative-weight pick.  A hub's join fan-out is walks-at-hub x
    degree; ``max_degree`` truncates candidate lists to the first N
    neighbors in rank order (same safe-by-default hub-guard pattern as
    the graph family — set it when celebrity entities appear).
    """
    if walk_length < 1:
        raise ValueError(f"walk_length must be >= 1, got {walk_length}")
    if walks_per_node < 1:
        raise ValueError(f"walks_per_node must be >= 1, got {walks_per_node}")
    for nm, v in (("w_return", w_return), ("w_common", w_common),
                  ("w_far", w_far)):
        if not isinstance(v, int) or v < 0:
            raise ValueError(f"{nm} must be a non-negative int, got {v!r}")
    if w_return + w_common + w_far <= 0:
        raise ValueError("at least one weight must be positive")

    e = triples.select("subj", "obj").distinct()
    adj_w = Window.partitionBy("subj").orderBy("obj")
    adj = (
        e.withColumn("idx", F.row_number().over(adj_w) - 1)
        .select(F.col("subj").alias("node"), "idx",
                F.col("obj").alias("nxt"))
    )
    if max_degree is not None:
        adj = adj.filter(F.col("idx") < max_degree)
    adj = adj.localCheckpoint(eager=True)
    deg = adj.groupBy("node").agg(F.max("idx").alias("_m")).select(
        "node", (F.col("_m") + 1).alias("deg"))
    # distance-1 membership probe: does prev -> candidate exist?
    common = adj.select(F.col("node").alias("prev"),
                        F.col("nxt"), F.lit(1).alias("_c"))
    nodes = (
        e.select(F.col("subj").alias("node"))
        .unionAll(e.select(F.col("obj").alias("node")))
        .distinct()
    )
    state = (
        nodes.withColumn(
            "walk", F.explode(F.sequence(F.lit(0),
                                         F.lit(walks_per_node - 1))))
        .select(F.col("node").alias("start"), "walk",
                F.lit(0).alias("step"), "node",
                F.lit(None).cast("string").alias("prev"))
        .localCheckpoint(eager=True)
    )
    out = state.select("start", "walk", "step", "node")
    for s in range(1, walk_length + 1):
        draw = _h32("start", F.col("walk").cast("string"),
                    F.lit(str(s - 1)), F.lit(seed))
        if s == 1:
            # no previous node yet: uniform index draw (= random_walks)
            nxt_state = (
                state.join(deg, "node")
                .withColumn("idx", F.pmod(draw, F.col("deg")))
                .join(adj, ["node", "idx"])
                .select("start", "walk", F.lit(s).alias("step"),
                        F.col("nxt").alias("node"),
                        F.col("node").alias("prev"))
            )
        else:
            cand = (
                state.join(adj, "node")
                .join(common, ["prev", "nxt"], "left")
                .withColumn(
                    "w",
                    F.when(F.col("nxt") == F.col("prev"),
                           F.lit(w_return))
                    .when(F.col("_c").isNotNull(), F.lit(w_common))
                    .otherwise(F.lit(w_far)),
                )
            )
            ww = Window.partitionBy("start", "walk").orderBy("idx")
            cum = (
                cand.withColumn("cum", F.sum("w").over(ww))
                .withColumn(
                    "tot",
                    F.sum("w").over(Window.partitionBy("start", "walk")))
                .withColumn("r", F.pmod(draw, F.col("tot")))
            )
            nxt_state = (
                cum.filter((F.col("cum") - F.col("w") <= F.col("r"))
                           & (F.col("r") < F.col("cum")))
                .select("start", "walk", F.lit(s).alias("step"),
                        F.col("nxt").alias("node"),
                        F.col("node").alias("prev"))
            )
        state = nxt_state.localCheckpoint(eager=True)
        out = out.unionAll(state.select("start", "walk", "step", "node"))
    return out


def pra_path_features(
    triples: DataFrame,
    max_mid_out: Optional[int] = 100_000,
) -> DataFrame:
    """Path-Ranking-Algorithm-style length-2 path features for KG
    completion (Lao & Cohen, ML 2010): for every entity pair joined by
    a 2-step predicate path, the path-type counts
    ``(subj, obj, pred1, pred2, n_paths)`` — the feature table a
    downstream ranker consumes (n_paths = number of distinct mid
    entities realizing the (pred1, pred2) path).

    Same hub-guarded 2-path join shape as ``graph.two_hop_reach``:
    the mid-keyed self-join is the classic skew point, so mids with
    out-degree > ``max_mid_out`` are dropped BEFORE the join (default
    on — intermediate bounded by |E| * cap; ``None`` opts out).
    Self-pairs (subj == obj) are excluded as in PRA.
    """
    e = triples.select("subj", "pred", "obj").distinct()
    if max_mid_out is not None:
        # mid fan-out counted on the UNLABELED distinct edge set (entity
        # fan-out, not per-predicate), exactly like two_hop_reach's guard
        ok_mids = (
            e.select("subj", "obj").distinct()
            .groupBy("subj").agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= max_mid_out)
            .select("subj")
        )
        right = e.join(ok_mids, "subj", "left_semi")
    else:
        right = e
    return (
        e.alias("e1")
        .join(right.alias("e2"), F.col("e1.obj") == F.col("e2.subj"))
        .filter(F.col("e2.obj") != F.col("e1.subj"))
        .groupBy(
            F.col("e1.subj").alias("subj"),
            F.col("e2.obj").alias("obj"),
            F.col("e1.pred").alias("pred1"),
            F.col("e2.pred").alias("pred2"),
        )
        .agg(F.countDistinct(F.col("e1.obj")).alias("n_paths"))
    )


def mention_contexts(
    mentions: DataFrame, transcripts: DataFrame, window_chars: int = 30
) -> DataFrame:
    """Entity-mention training contexts (the Wikipedia2Vec-style
    anchor-context extraction, Yamada et al. 2016): for every detected
    mention, the ``window_chars`` characters of turn text on each side
    of the span — ``(conv_id, turn_idx, concept_id, begin, end,
    left_ctx, right_ctx)``.  The (context, concept) pairs are the raw
    material for entity-embedding / entity-linking training; windows
    are character-based so they need no second tokenization pass and
    stay exactly engine-portable.

    One conv-keyed broadcast-eligible equi-join of mentions back to
    turn text + two substring expressions — narrow, shuffle only on
    the (conv_id, turn_idx) hash if neither side broadcasts; the text
    column is dropped after the substrings so raw turns never travel
    further than this join.
    """
    t = transcripts.select("conv_id", "turn_idx", "text")
    left = F.substring(
        F.col("text"),
        F.greatest(F.col("begin") - int(window_chars) + 1, F.lit(1)),
        F.least(F.col("begin"), F.lit(int(window_chars))),
    )
    right = F.substring(
        F.col("text"), F.col("end") + 1, int(window_chars))
    return (
        mentions.join(t, ["conv_id", "turn_idx"])
        .select(
            "conv_id", "turn_idx", "concept_id", "begin", "end",
            left.alias("left_ctx"), right.alias("right_ctx"),
        )
    )
