"""IVF (inverted-file) approximate nearest neighbor over an embedding
column — the scale path next to the LSH tier in similarity.py.

Classic IVF recipe (public: Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011 — the coarse-quantizer stage, no
PQ compression here):

1. **train** — spherical k-means on a driver-side sample (the coarse
   quantizer is always trained on a sample, even at 100 TB: k·d floats
   of centroids is kilobytes);
2. **assign** — every vector gets a ``centroid_id`` = argmax cosine
   against the centroid matrix, one vectorized numpy matmul per Arrow
   batch (no per-row Python);
3. **search** — score only vectors whose centroid is among the
   ``n_probe`` centroids nearest the query. At corpus scale the
   indexed table is written ``partitionBy("centroid_id")``, so each
   probe is a partition-pruned scan: the 100 TB table contributes only
   n_probe/k of its bytes to the query.

Recall grows with n_probe; n_probe == k degenerates to the exact scan
(used as the value-checked oracle path — see __spark_entry__).

Determinism: the sample is id-ordered and the k-means init is a seeded
RNG permutation, so every run (and every executor) derives identical
centroids — same policy as similarity.py's md5-derived hyperplanes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.operators.similarity import cosine_topk


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def train_centroids(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 0x1F5EED,
) -> np.ndarray:
    """Spherical k-means (Lloyd, fixed iterations) on an id-ordered
    sample. Returns a unit-row (k, d) float64 centroid matrix."""
    sample = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_rows)
        .toPandas()[vec_col]
    )
    x = _unit_rows(np.stack(sample.to_numpy()).astype(np.float64))
    if len(x) < n_centroids:
        raise ValueError(f"sample ({len(x)}) smaller than k ({n_centroids})")
    rng = np.random.default_rng(seed)
    cent = x[rng.permutation(len(x))[:n_centroids]].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit_rows(cent)
    return cent


def assign_centroids(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``centroid_id`` = argmax cosine vs the centroid matrix.

    One matmul per Arrow batch; the (k, d) matrix rides the closure as
    a plain ndarray (kilobytes — no broadcast machinery needed). At
    corpus scale, follow with
    ``.write.partitionBy("centroid_id")`` so probes prune partitions.
    """
    cent = np.ascontiguousarray(centroids, dtype=np.float64)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:
            return pd.Series([], dtype="int32")
        x = _unit_rows(np.stack(vecs.to_numpy()).astype(np.float64))
        return pd.Series((x @ cent.T).argmax(axis=1).astype(np.int32))

    return df.withColumn("centroid_id", nearest(F.col(vec_col)))


def probe_ids(centroids: np.ndarray, query_vec: list[float], n_probe: int) -> list[int]:
    """The n_probe centroid ids nearest the query — pure driver
    arithmetic, no Spark job (mirror of similarity.probe_buckets)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q)
    q = q / qn if qn else q
    sims = centroids @ q
    order = np.argsort(-sims, kind="stable")
    return [int(i) for i in order[:n_probe]]


def ivf_topk(
    embeddings: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact cosine rescoring inside the probed
    inverted lists only. Accepts a pre-assigned df (has
    ``centroid_id``) or assigns on the fly."""
    if "centroid_id" not in embeddings.columns:
        embeddings = assign_centroids(embeddings, centroids, vec_col)
    probes = probe_ids(centroids, query_vec, n_probe)
    cands = embeddings.filter(F.col("centroid_id").isin(probes))
    return cosine_topk(cands, query_vec, k, id_col, vec_col)
