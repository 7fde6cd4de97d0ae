from __future__ import annotations

import math

from kgpipe.similarity import cosine_topk, lsh_topk, pairwise_cosine_dedup


def _vectors(spark, n=50, dim=8):
    rows = []
    for i in range(n):
        v = [math.sin(0.7 * i + j) for j in range(dim)]
        rows.append((i, v))
    # plant a near-duplicate of vector 0
    rows.append((999, [x * 1.001 for x in rows[0][1]]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(spark):
    vecs = _vectors(spark)
    queries = vecs.filter("vec_id = 0").selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    top = cosine_topk(vecs, queries, k=3).collect()
    assert top[0].vec_id == 0 and abs(top[0].cosine - 1.0) < 1e-6
    assert {r.vec_id for r in top} >= {0, 999}  # the planted near-dup ranks


def test_lsh_topk_recall_of_top1(spark):
    vecs = _vectors(spark)
    queries = vecs.filter("vec_id = 0").selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    approx = lsh_topk(vecs, queries, dim=8, k=3, n_planes=6, n_tables=4).collect()
    assert approx, "LSH returned no candidates"
    assert approx[0].vec_id == 0  # the query itself always shares buckets


def test_pairwise_cosine_dedup(spark):
    vecs = _vectors(spark)
    pairs = {(r.vec_a, r.vec_b) for r in
             pairwise_cosine_dedup(vecs, dim=8, threshold=0.999).collect()}
    assert (0, 999) in pairs


def test_ivf_topk_recall_and_exactness(spark):
    from pyspark.sql import functions as F

    from kgpipe.similarity import cosine_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 4).selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(e, q, k=5).collect()}

    # full probe == brute force
    full = {(r.q_id, r.vec_id)
            for r in ivf_topk(e, q, k=5, n_centroids=8, n_probe=8).collect()}
    assert full == exact

    # partial probe: the query's own cell is always probed, so the query
    # vector itself (cosine 1.0) is found; recall is substantial
    part = {(r.q_id, r.vec_id)
            for r in ivf_topk(e, q, k=5, n_centroids=8, n_probe=3).collect()}
    for qid in range(4):
        assert (qid, qid) in part
    assert len(part & exact) >= len(exact) // 2


def test_ivf_topk_1024_centroids_no_catalyst_blowup(spark):
    """Centroids ride as array DATA on a broadcast row, so a 1024-cell
    quantizer plans and runs (per-centroid literal expressions hit Catalyst
    expression limits well below this)."""
    import random

    from pyspark.sql import functions as F

    from kgpipe.similarity import cosine_topk, ivf_topk

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    q = e.filter(F.col("vec_id") < 3).selectExpr(
        "vec_id as q_id", "embedding as q_vec"
    )
    rng = random.Random(11)
    cents = [(i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(1024)]
    out = ivf_topk(e, q, k=3, n_probe=1024, centroids=cents).collect()
    got = {(r.q_id, r.vec_id) for r in out}
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(e, q, k=3).collect()}
    assert got == exact  # full probe over any quantizer == brute force


def test_train_centroids_and_ivf(spark):
    """Offline k-means trainer feeds ivf_topk's production path: clustered
    synthetic vectors recover their clusters, and probed search finds the
    exact nearest neighbour for in-cluster queries."""
    import math
    import random

    from kgpipe.similarity import ivf_topk, train_centroids

    rng = random.Random(7)
    dim = 8
    bases = [[1 if d == a else 0 for d in range(dim)] for a in range(4)]
    rows = []
    for i in range(400):
        b = bases[i % 4]
        rows.append((i, [x + rng.uniform(-0.05, 0.05) for x in b]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents = train_centroids(vecs, n_centroids=4, sample_fraction=0.5,
                            n_iter=8, seed=1)
    assert len(cents) == 4
    # each trained centroid is close to one of the 4 cluster bases
    for _, c in cents:
        best = max(
            sum(a * b for a, b in zip(c, base))
            / (math.sqrt(sum(a * a for a in c)) or 1.0)
            for base in bases
        )
        assert best > 0.95, c

    queries = vecs.filter("vec_id < 4").selectExpr(
        "vec_id as q_id", "embedding as q_vec")
    got = {(r.q_id, r.rank): r.vec_id
           for r in ivf_topk(vecs, queries, k=1, n_probe=1,
                             centroids=cents).collect()}
    for q in range(4):
        assert got[(q, 1)] == q  # each vector's own nearest is itself
