"""Similarity search over embedding columns (array<float/double>).

Two tiers, as a 100 TB pipeline would run them:

* ``cosine_topk`` — exact brute-force scan. Entirely native
  (``F.zip_with`` + ``F.aggregate`` fold for the dot product, no UDF),
  so it whole-stage-codegens and the oracle (DuckDB
  ``list_cosine_similarity``) reproduces it to float rounding.
* ``lsh_bucket_topk`` — sign-random-projection LSH: deterministic
  hyperplanes derived from md5 of (plane, dim) so every executor (and
  the test oracle) derives the identical planes with no RNG state.
  Buckets shrink the scan by ~2^planes; exact rescoring within the
  probed bucket keeps top-k quality.
* ``embedding_near_dup_pairs`` — pairwise cosine ≥ threshold via the
  same bucketing (near-dup dedup tier for embedding-indexed corpora).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0).cast("double"), lambda acc, v: acc + v.cast("double") * v
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine vs a constant query vector.

    Output: (neighbor_id, sim, rank) — rank 1 = best; ties broken by id
    for full determinism. The scan is a single narrow projection; at
    cluster scale Spark's takeOrdered on (neg-sim, id) avoids a global
    sort of all scores.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.round(cosine(F.col(vec_col), q), 6).alias("sim"),
    )
    from pyspark.sql import Window

    # Two-level top-k so no stage ever globally sorts the full scan:
    # each scan partition keeps its local top-k (one pass, no shuffle),
    # then the final window ranks only <= k * n_partitions survivors in
    # a single tiny task. Same result as a global row_number window.
    w_local = Window.partitionBy("__pid").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    survivors = (
        scored.withColumn("__pid", F.spark_partition_id())
        .withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__pid", "__lr")
    )
    w = Window.orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH
# ---------------------------------------------------------------------------


def _plane_component(plane: int, dim_idx: Column) -> Column:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    derived from md5(plane||','||dim) — identical on every executor and
    in any SQL oracle, no RNG object to ship."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(",", F.lit(str(plane)), dim_idx)), 1, 8),
        16,
        10,
    ).cast("long")
    return (h % 1000) / F.lit(1000.0) - 0.5


def lsh_bucket_col(vec: Column, n_planes: int = 8) -> Column:
    """Bucket id = sign bits of projections onto n_planes hyperplanes."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)

    def _mul(plane: int):
        # NB: a plain `lambda v, i, p=p:` would make PySpark's lambda
        # arity inspection see 3 args and reject it for zip_with
        return lambda v, i: v.cast("double") * _plane_component(plane, i)

    bucket = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(vec, dims, _mul(p)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def with_lsh_bucket(
    embeddings: DataFrame, vec_col: str = "embedding", n_planes: int = 8
) -> DataFrame:
    return embeddings.withColumn(
        "bucket", lsh_bucket_col(F.col(vec_col), n_planes)
    )


def _plane_component_py(plane: int, dim: int) -> float:
    """Driver-side mirror of :func:`_plane_component` (same md5 law)."""
    import hashlib

    h = int(hashlib.md5(f"{plane},{dim}".encode()).hexdigest()[:8], 16)
    return (h % 1000) / 1000.0 - 0.5


def probe_buckets(
    query_vec: list[float], n_planes: int = 6, n_probes: int = 1
) -> list[int]:
    """Multi-probe LSH probe sequence (Lv et al., VLDB 2007).

    The query's own sign bucket first, then buckets reached by flipping
    the sign bits with the smallest projection margins |q·plane| — the
    planes the query sits closest to, where true neighbors most likely
    landed on the other side. Pure driver arithmetic: the hyperplanes
    are md5-derived, so no Spark job is needed to locate the probes.
    """
    import itertools

    if n_planes > 20:
        raise ValueError("n_planes > 20: probe enumeration too large")
    projs = [
        sum(v * _plane_component_py(p, i) for i, v in enumerate(query_vec))
        for p in range(n_planes)
    ]
    base = sum((1 << p) for p, s in enumerate(projs) if s > 0)
    if n_probes <= 1:
        return [base]
    scored = sorted(
        (
            sum(abs(projs[p]) for p in combo),
            sum(1 << p for p in combo),
        )
        for r in range(1, n_planes + 1)
        for combo in itertools.combinations(range(n_planes), r)
    )
    return [base] + [base ^ mask for _, mask in scored[: n_probes - 1]]


def lsh_bucket_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_probes: int = 1,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's probe
    buckets (multi-probe when ``n_probes > 1``).

    The bucketed table would be written partitioned by ``bucket`` at
    corpus scale, making each probe a partition-pruned scan instead of
    a full pass; recall grows with n_probes at linear scan cost in the
    number of probed buckets (see tests/test_operators.py recall
    floor). The probe set is computed on the driver — no Spark job."""
    probes = probe_buckets(query_vec, n_planes, n_probes)
    bucketed = with_lsh_bucket(embeddings, vec_col, n_planes)
    candidates = bucketed.filter(F.col("bucket").isin(probes))
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
) -> DataFrame:
    """(a, b, sim) pairs with cosine ≥ threshold, bucket-joined.

    Near-identical vectors land in the same sign bucket with high
    probability; the pairwise rescoring never leaves the bucket, so no
    full cross join exists. (Multi-probe / band-OR raises recall at
    scale; single-bucket keeps this oracle-comparable.)
    """
    b = with_lsh_bucket(embeddings, vec_col, n_planes)
    left = b.select(
        F.col(id_col).alias("a"), F.col(vec_col).alias("va"), "bucket"
    )
    right = b.select(
        F.col(id_col).alias("b"), F.col(vec_col).alias("vb"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .select(
            "a", "b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim")
        )
        .filter(F.col("sim") >= threshold)
    )
