"""SemDeDup — semantic deduplication over an embedding column
(Abbas et al., "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication", 2023, public).

Recipe, re-expressed as DataFrame algebra over operators this engine
already has:

1. **cluster** — spherical k-means coarse assignment (the IVF
   quantizer from ivf.py: sample-trained centroids, one vectorized
   matmul per Arrow batch).
2. **in-cluster pairs** — cosine ≥ τ pairs via an equi-join on
   ``centroid_id`` (the paper computes within-cluster pairwise sims;
   pairwise work is Σᵢ|cᵢ|², bounded by the cluster granularity k —
   never a corpus cross join).
3. **group** — connected components over the pair graph
   (graph.connected_components, O(log n) large-star/small-star
   rounds), so transitively-similar chains collapse to one group.
4. **keep one per group** — the minimum id (deterministic; the paper
   keeps the member with LOWEST similarity to the centroid to retain
   in-cluster diversity — that variant is a one-line keeper swap and
   is exposed via ``keep='far_from_centroid'``).

Scale shape at 100 TB: the corpus is scanned once for assignment; the
pair join shuffles on centroid_id (cluster sizes are controlled by k,
AQE handles stragglers; at production scale write the assigned table
``partitionBy("centroid_id")`` so the join is partition-local); CC
touches only the pair graph (≪ corpus). With ``n_clusters=1`` the
operator degenerates to the exact threshold graph — the value-checked
oracle tier (same trick as ivf_ann's full-probe ≡ exact scan).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from webcrawler_spark.operators.graph import connected_components
from webcrawler_spark.operators.ivf import assign_centroids, train_centroids
from webcrawler_spark.operators.similarity import cosine


def in_cluster_pairs(
    assigned: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, sim) with cosine ≥ threshold, a < b, both sides in the
    same k-means cluster — the join key is centroid_id, so pairwise
    rescoring never leaves a cluster."""
    left = assigned.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "centroid_id"
    )
    right = assigned.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "centroid_id"
    )
    return (
        left.join(right, "centroid_id")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """(vec_id, group, keep): semantic-duplicate group per vector and
    whether it survives (one keeper per group = the minimum id; rows
    in no group keep themselves).

    ``n_clusters=1`` is the exact tier (every pair considered — SQL
    oracle-able); larger k is the scale tier, where recall is bounded
    by cluster granularity exactly as in the paper.
    """
    if n_clusters > 1:
        cents = (
            centroids
            if centroids is not None
            else train_centroids(
                embeddings,
                vec_col=vec_col,
                id_col=id_col,
                n_centroids=n_clusters,
            )
        )
        assigned = assign_centroids(embeddings, cents, vec_col)
    else:
        assigned = embeddings.withColumn("centroid_id", F.lit(0))
    pairs = in_cluster_pairs(assigned, threshold, id_col, vec_col)
    comp = connected_components(pairs, src="a", dst="b")
    out = (
        embeddings.select(F.col(id_col).alias("vec_id"))
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("component"), F.col("vec_id")).alias("group"),
        )
    )
    return out.withColumn("keep", F.col("vec_id") == F.col("group"))


def drop_semantic_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Input rows that survive semantic dedup."""
    verdict = semantic_dedup(
        embeddings, threshold, n_clusters, id_col, vec_col
    )
    return embeddings.join(
        verdict.where("keep").select(F.col("vec_id").alias(id_col)),
        id_col,
    )
