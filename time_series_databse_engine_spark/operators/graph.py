"""Iterative graph analytics over candidate-pair edge lists.

The dedup pipeline already produces an undirected document graph (LSH
candidate pairs -> connected components in ``dedup.dedup_clusters``).
PageRank over the same edges answers the question components cannot:
WHICH member of a near-dup cluster is canonical.  Picking the
highest-centrality member (instead of min-id) keeps the version most
connected to the rest of the cluster — the template everything else was
derived from — which is the standard curation heuristic for boilerplate
families.

Scale shape: one edge-keyed equi-join + one grouped sum per iteration
(never materializing anything wider than (id, rank)), iteration count is
FIXED (no driver-side convergence collect), and each iteration ends in a
``localCheckpoint`` lineage cut exactly like the label-propagation loop
in ``dedup.dedup_clusters`` — at 100 TB the per-iteration shuffle volume
is |edges| + |nodes| rows of two numeric columns.

Determinism: ranks are rounded to 9 dp after every iteration (absorbing
grouped-float-sum ordering noise, the kmeans-oracle discipline) and the
damping terms are written symbolically (``1e0 - 0.85e0``) on both
engines so constant folding yields bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    src_col: str = "id1",
    dst_col: str = "id2",
) -> DataFrame:
    """PageRank (Page et al. 1999) over an undirected pair list.

    ``pairs`` rows are undirected edges (the LSH candidate-pair
    contract: id1 < id2, distinct); both directions are materialized, so
    every node has out-degree >= 1 and the dangling-mass correction
    vanishes.  Returns (id, pagerank) with rank rounded to 6 dp.

    Uniform init 1/N; per iteration
    ``rank' = (1-d)/N + d * sum_in(rank/outdeg)``, rank rounded to 9 dp.
    N rides along as a broadcast one-row aggregate (no driver collect).
    """
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
        .localCheckpoint()  # reused by every iteration AND the degree table
    )
    nodes = edges.select(F.col("src").alias("id")).distinct()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    n_row = F.broadcast(nodes.agg(F.count("*").alias("n")))
    d = F.lit(damping)
    ranks = nodes.crossJoin(n_row).select(
        "id", F.round(F.lit(1.0) / F.col("n"), 9).alias("rank")
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("outdeg")).alias("c"),
            )
        )
        summed = contrib.groupBy("id").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "id", "left")
            .crossJoin(n_row)
            .select(
                "id",
                F.round(
                    (F.lit(1.0) - d) / F.col("n")
                    + d * F.coalesce(F.col("s"), F.lit(0.0)),
                    9,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return ranks.select("id", F.round("rank", 6).alias("pagerank"))
