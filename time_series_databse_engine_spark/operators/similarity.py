"""Similarity search over embedding columns (north-star op, BASELINE.json).

Baseline: brute-force cosine top-k with a broadcast query set — JVM-side
``zip_with``/``aggregate`` expressions, no Python in the hot path.  Scale
path: LSH bucketing by random-hyperplane signs reduces candidates from N to
a bucket before exact re-scoring (same top-k shape, bucket-equi-join
instead of broadcast-nested-loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def as_double(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    """Sequential left-to-right sum — same evaluation order as the SQL
    oracle's list functions, so doubles agree to rounding."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbours for each query vector.

    ``broadcast(queries)`` → each candidate partition scores all queries
    locally (the classic brute-force ANN baseline: one pass over N
    candidates, no shuffle of the big side); per-query row_number keeps k.
    Returns (query_id, cand_id, cosine_sim, rank).
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), as_double(vec_col).alias("qvec")
        )
    )
    c = embeddings.select(F.col(id_col).alias("cand_id"), as_double(vec_col).alias("cvec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            cosine(F.col("qvec"), F.col("cvec")).alias("_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("_sim", 6).alias("cosine_sim"), "rank")
    )


def cosine_near_dup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id1 < id2) pairs with
    cosine similarity ≥ ``threshold``.

    This is the exact O(n²) baseline (broadcast-nested-loop on id1 < id2) —
    correct at any n, affordable only when one side broadcasts.  The 100 TB
    path is the same scoring over LSH-bucketed candidates
    (``lsh_bucket_topk``'s hyperplane buckets: equi-join on bucket id keeps
    candidate volume ~n²/2^bits per bucket), trading recall for the n²
    pair-join; both return the identical (id1, id2, cosine_sim) shape.
    """
    a = embeddings.select(F.col(id_col).alias("id1"), as_double(vec_col).alias("v1"))
    b = embeddings.select(F.col(id_col).alias("id2"), as_double(vec_col).alias("v2"))
    sim = F.round(cosine(F.col("v1"), F.col("v2")), 6)
    return (
        a.join(F.broadcast(b), F.col("id1") < F.col("id2"))
        .select("id1", "id2", sim.alias("cosine_sim"))
        .filter(F.col("cosine_sim") >= threshold)
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize candidates to their
    nearest of ``n_cells`` centroids (deterministic: the first ``n_cells``
    vectors by id serve as centroids — swap in trained k-means centroids in
    production), then score each query only against its ``n_probe`` nearest
    cells.

    Scale shape: candidate table is scanned once to assign cells (broadcast
    centroids), the probe join is an equi-join on cell id — candidate volume
    drops to ~n_probe/n_cells of N versus brute force, and the shuffle key
    is the cell id, not the pair.
    """
    cents = F.broadcast(
        embeddings.orderBy(id_col).limit(n_cells)
        .select(F.col(id_col).alias("cell_id"), as_double(vec_col).alias("cent"))
    )

    def nearest_cells(df, vec, n):
        scored = df.crossJoin(cents).select(
            "*", cosine(vec, F.col("cent")).alias("_csim")
        )
        w = W.partitionBy(df.columns[0]).orderBy(
            F.col("_csim").desc(), F.col("cell_id").asc()
        )
        return (
            scored.withColumn("_crank", F.row_number().over(w))
            .filter(F.col("_crank") <= n)
            .drop("cent", "_csim", "_crank")
        )

    c = embeddings.select(F.col(id_col).alias("cand_id"), as_double(vec_col).alias("cvec"))
    c_assigned = nearest_cells(c, F.col("cvec"), 1)
    q = queries.select(F.col(id_col).alias("query_id"), as_double(vec_col).alias("qvec"))
    q_probes = nearest_cells(q, F.col("qvec"), n_probe)

    scored = (
        c_assigned.join(F.broadcast(q_probes), "cell_id")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qvec"), F.col("cvec")).alias("_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("_sim", 6).alias("cosine_sim"), "rank")
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH — bucket = sign pattern of
    ``num_planes`` fixed random projections; candidates equi-join queries on
    the bucket key, then exact cosine re-scoring inside the bucket.

    At 100 TB the bucket join replaces the all-pairs scoring with a
    shuffle-on-bucket; recall is tuned by ``num_planes`` (fewer planes →
    bigger buckets → higher recall, more work).
    """
    import numpy as np

    dim = len(embeddings.select(vec_col).first()[0])
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((num_planes, dim))

    def bucket_expr(vec):
        bits = [
            F.when(
                F.aggregate(
                    F.zip_with(
                        vec,
                        F.array(*[F.lit(float(x)) for x in planes[p]]),
                        lambda x, y: x * y,
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                >= 0,
                F.lit("1"),
            ).otherwise(F.lit("0"))
            for p in range(num_planes)
        ]
        return F.concat(*bits)

    c = embeddings.select(
        F.col(id_col).alias("cand_id"),
        as_double(vec_col).alias("cvec"),
    ).withColumn("bucket", bucket_expr(F.col("cvec")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("qvec"),
    ).withColumn("bucket", bucket_expr(F.col("qvec")))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", cosine(F.col("qvec"), F.col("cvec")).alias("_sim"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("_sim").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("_sim", 6).alias("cosine_sim"), "rank")
    )
