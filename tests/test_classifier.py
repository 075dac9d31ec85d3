"""Distributed logistic-regression quality classifier
(operators/classifier.py): hand-computed one-step gradient, the
learnability law (the label word's bucket gets the top weight and
logloss beats the zero model), hash-tier shape parity, float-tolerant
partition invariance, and the broadcast-weights plan shape."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.classifier import (
    LR_DIM,
    hash_features,
    lr_score,
    lr_train,
)


def _bucket(word: str) -> int:
    return int(hashlib.md5(f"lrq|{word}".encode()).hexdigest()[:8], 16) % LR_DIM


def test_one_step_gradient_hand_computed(spark):
    # two docs, one feature bucket (7) plus bias; w0 = 0 -> p = 0.5
    feats = spark.createDataFrame(
        [(1, 7, 0.5), (1, -1, 1.0), (2, 7, 0.25), (2, -1, 1.0)],
        "id long, j int, x double",
    )
    labels = spark.createDataFrame([(1, 1.0), (2, 0.0)], "id long, y double")
    w = dict(lr_train(feats, labels, n_iter=1, lr=1.0))
    # g_7 = (0.5*(0.5-1) + 0.25*(0.5-0)) / 2 = -0.0625 -> w = 0.0625
    # g_b = ((0.5-1) + (0.5-0)) / 2 = 0 -> bias stays 0
    assert abs(w[7] - 0.0625) < 1e-12
    assert w[-1] == 0.0
    assert all(v == 0.0 for j, v in w.items() if j not in (7, -1))


@pytest.fixture(scope="module")
def corpus(spark):
    # 40 docs; even ids mention 'cat' three times (y=1), odd ids none
    rows = [
        (
            i,
            ("cat data cat table cat row value" if i % 2 == 0
             else "dog data bird table fish row value"),
            float(i % 2 == 0),
        )
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, y double")


def test_learnability_top_weight_and_logloss(spark, corpus):
    feats = hash_features(corpus)
    labels = corpus.select(F.col("doc_id").alias("id"), "y")
    w = lr_train(feats, labels, n_iter=4, lr=2.0)
    wd = dict(w)
    cat = _bucket("cat")
    assert wd[cat] > 0
    assert wd[cat] == max(v for j, v in w if j != -1)
    scored = lr_score(feats, w).join(labels, "id").collect()
    logloss = -sum(
        math.log(r["p"]) if r["y"] == 1.0 else math.log(1 - r["p"])
        for r in scored
    ) / len(scored)
    assert logloss < math.log(2)  # beats the w=0 model
    mean_pos = sum(r["p"] for r in scored if r["y"] == 1.0) / 20
    mean_neg = sum(r["p"] for r in scored if r["y"] == 0.0) / 20
    assert mean_pos > mean_neg


def test_native_hash_tier_same_shape(spark, corpus):
    md5 = hash_features(corpus)
    nat = hash_features(corpus, native_hash=True)
    assert md5.columns == nat.columns
    # bias rows identical; feature mass per doc identical (same x's,
    # different bucket routing)
    a = sorted((r["id"], round(r["x"], 9)) for r in md5.collect())
    b = sorted((r["id"], round(r["x"], 9)) for r in nat.collect())
    assert a == b


def test_partition_invariance_within_float_tolerance(spark, corpus):
    feats = hash_features(corpus)
    labels = corpus.select(F.col("doc_id").alias("id"), "y")
    w1 = dict(lr_train(feats.coalesce(1), labels, n_iter=3, lr=1.0))
    w2 = dict(lr_train(feats.repartition(13), labels, n_iter=3, lr=1.0))
    assert set(w1) == set(w2)
    assert all(abs(w1[j] - w2[j]) < 1e-9 for j in w1)


def test_score_plan_broadcasts_weights(spark, corpus):
    feats = hash_features(corpus)
    w = [(j, 0.01 * j) for j in range(-1, LR_DIM)]
    plan = (
        lr_score(feats, w)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
