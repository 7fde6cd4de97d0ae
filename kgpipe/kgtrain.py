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
