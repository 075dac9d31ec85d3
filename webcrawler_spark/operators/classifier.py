"""Trained document-quality classifier: hashed bag-of-words logistic
regression, full-batch gradient descent on the cluster.

The role fastText's supervised classifier plays in published pipelines
(LLaMA's "quality classifier" trained on Wikipedia-linked pages,
RedPajama-v2's quality signals, palm-style heuristic-vs-model gating):
a linear model over hashed word features, TRAINED on the corpus being
cleaned — not just applied. This module does the training itself as a
Spark loop (Bottou-style full-batch logistic regression; the hashing
trick is Weinberger et al. 2009):

* ``hash_features`` — explode words once, hash into ``dim`` buckets,
  one sparse row (id, j, x) per touched bucket with x = count/n_words.
  Featurize-once: the corpus text is read exactly once, iterations
  touch only this (much smaller) sparse table.
* ``lr_train`` — per iteration: (1) dot products via a BROADCAST join
  of the ≤``dim``+1-row weight table against the sparse rows + one
  hash aggregate on id; (2) per-doc residual p−y; (3) gradient via a
  co-keyed join back to the sparse rows + one hash aggregate on j
  (≤``dim``+1 groups, map-side combined). The weight vector is the
  k-means-centroid/BPE-merge analog: DRIVER MODEL STATE, collected
  once per iteration (≤65 rows), never the data.
* ``lr_score`` — one broadcast join + one aggregate; p = σ(w·x + b).

Scale notes (100 TB): the corpus-sized tables only ever shuffle on
doc id (the featurize aggregate and the per-doc dot aggregate); at
cluster scale persist ``hash_features`` bucketed by id and both
per-iteration joins are co-located. The j-side aggregate output is
bounded by ``dim`` — a few KiB crossing the wire per iteration no
matter the corpus. Nothing density-expands: features stay sparse rows
end to end.

Two hash tiers (house convention, sketches.py): md5-prefix (default)
is the ORACLE tier — DuckDB replays bucket ids bit-for-bit and the
whole trainer unrolls into SQL (sum-order float noise is ~1e-15,
absorbed by the 6-dp compare) — and ``native_hash=True`` keeps
xxhash64 in JVM codegen for production.

Reference parity: no analog — the reference crawls and extracts
(Parser.py); model-based quality gating is part of the
training-pipeline tier this rebuild adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LR_DIM = 64
BIAS_J = -1  # the bias is bucket -1 with constant feature 1.0


def _bucket(col: Column, dim: int, native_hash: bool) -> Column:
    if native_hash:
        return F.pmod(F.xxhash64(F.lit("lrq"), col), F.lit(dim)).cast("int")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("lrq"), col)), 1, 8), 16, 10
    ).cast("long")
    return (h % dim).cast("int")


def hash_features(
    df: DataFrame,
    col: str = "text",
    id_col: str = "doc_id",
    dim: int = LR_DIM,
    native_hash: bool = False,
) -> DataFrame:
    """Sparse hashed features (id, j, x): per-doc word counts folded
    into ``dim`` buckets, normalized by the doc's word count, plus the
    bias row (j = -1, x = 1). One explode + one hash aggregate.

    The word array is BOUND AS A COLUMN before the explode: with
    ``size(filter(split(text)))`` selected NEXT TO the explode,
    Catalyst places that projection after the Generate and re-splits
    the full text PER EXPLODED WORD ROW — O(doc_len²), caught
    red-handed by a thread dump in the round-5 scale stress (stage
    pinned 32 cores 20+ min on 252k 4k-word docs; ArrayFilter →
    StringSplit per emitted row). Split once, explode the
    attribute."""
    base = (
        df.select(
            F.col(id_col).alias("id"),
            F.filter(F.split(F.col(col), " "), lambda w: w != "").alias(
                "_ws"
            ),
        )
        .select("id", F.size("_ws").alias("n_words"), F.explode("_ws").alias("w"))
    )
    feats = (
        base.where(F.col("n_words") > 0)
        .groupBy("id", _bucket(F.col("w"), dim, native_hash).alias("j"))
        .agg(
            (F.count(F.lit(1)).cast("double") / F.first("n_words")).alias("x")
        )
    )
    bias = df.select(
        F.col(id_col).alias("id"), F.lit(BIAS_J).alias("j"), F.lit(1.0).alias("x")
    )
    return feats.unionByName(bias)


def _score_col() -> Column:
    # p = sigmoid(dot); exp() differs from DuckDB's libm only in the
    # last ulp, absorbed by the 6-dp oracle compare
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("dot")))


def _dots(feats: DataFrame, wdf: DataFrame) -> DataFrame:
    return (
        feats.join(F.broadcast(wdf), "j")
        .groupBy("id")
        .agg(F.sum(F.col("x") * F.col("w")).alias("dot"))
    )


def lr_train(
    feats: DataFrame,
    labels: DataFrame,
    n_iter: int = 3,
    lr: float = 0.5,
    dim: int = LR_DIM,
) -> list[tuple[int, float]]:
    """Train by full-batch GD; returns the weight table [(j, w)] with
    j = -1 the bias. ``labels``: (id, y double in {0, 1}).

    w starts at 0 (p = 0.5 everywhere), so the trajectory is exactly
    reproducible; each iteration's gradient is
    g_j = Σ_i x_ij (σ(w·x_i) − y_i) / n and w ← w − lr·g. The weight
    table is collected per iteration (driver model state, ≤dim+1
    rows); the sparse rows and labels never leave the cluster.
    """
    spark = feats.sparkSession
    n = labels.count()
    feats = feats.persist()
    labels = labels.persist()
    w = {j: 0.0 for j in range(-1, dim)}
    for _ in range(n_iter):
        wdf = spark.createDataFrame(sorted(w.items()), "j int, w double")
        resid = (
            _dots(feats, wdf)
            .join(labels, "id")
            .select("id", (_score_col() - F.col("y")).alias("r"))
        )
        grad = (
            feats.join(resid, "id")
            .groupBy("j")
            .agg((F.sum(F.col("x") * F.col("r")) / F.lit(float(n))).alias("g"))
            .collect()
        )
        for row in grad:
            w[row["j"]] = w[row["j"]] - lr * row["g"]
    feats.unpersist()
    labels.unpersist()
    return sorted(w.items())


def lr_score(
    feats: DataFrame, weights: list[tuple[int, float]]
) -> DataFrame:
    """Score docs with a trained weight table: (id, p, pred)."""
    spark = feats.sparkSession
    wdf = spark.createDataFrame(weights, "j int, w double")
    return _dots(feats, wdf).select(
        "id",
        _score_col().alias("p"),
        (_score_col() >= 0.5).alias("pred"),
    )
