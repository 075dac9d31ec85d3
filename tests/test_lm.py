"""Interpolated bigram LM laws (operators/lm.py).

Hand-computed probabilities on a pinned corpus; in-domain text scores
higher than out-of-domain; unseen words fall back to the smoothed
floor; short docs are absent; partition invariance.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.lm import (
    bigram_logprob,
    bigram_logprob_self,
    fit_bigram_lm,
)


@pytest.fixture(scope="module")
def train(spark):
    # tokens: a b a b a c  → N=6, V=3
    # bigrams: (a,b)×2 (b,a)×2 (a,c)×1
    return spark.createDataFrame([(0, "a b a b a c")], "doc_id long, text string")


def test_fit_counts(train):
    bi, uni, n, v = fit_bigram_lm(train)
    assert n == 6 and v == 3
    assert {(r["w1"], r["w2"]): r["c12"] for r in bi.collect()} == {
        ("a", "b"): 2,
        ("b", "a"): 2,
        ("a", "c"): 1,
    }
    assert {r["term"]: r["c"] for r in uni.collect()} == {"a": 3, "b": 2, "c": 1}


def test_hand_computed_score(spark, train):
    bi, uni, n, v = fit_bigram_lm(train)
    test = spark.createDataFrame([(1, "a b"), (2, "a z")], "doc_id long, text string")
    got = {r["doc_id"]: r for r in bigram_logprob(test, bi, uni, n, v, lam=0.7).collect()}
    # p(b|a) = .7*(2/3) + .3*(2+1)/9
    assert got[1]["avg_logp"] == pytest.approx(math.log10(0.7 * 2 / 3 + 0.3 * 3 / 9))
    # unseen z: bigram term 0, unigram floor (0+1)/9
    assert got[2]["avg_logp"] == pytest.approx(math.log10(0.3 * 1 / 9))
    assert got[1]["n_bigrams"] == 1


def test_in_domain_scores_higher(spark, train):
    bi, uni, n, v = fit_bigram_lm(train)
    test = spark.createDataFrame(
        [(1, "a b a b"), (2, "c c c c"), (3, "x y z w")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["avg_logp"] for r in bigram_logprob(test, bi, uni, n, v).collect()}
    assert s[1] > s[2] > s[3]


def test_short_docs_absent(spark, train):
    bi, uni, n, v = fit_bigram_lm(train)
    test = spark.createDataFrame([(1, "a"), (2, "")], "doc_id long, text string")
    assert bigram_logprob(test, bi, uni, n, v).count() == 0


def test_partition_invariance(spark):
    rows = [(i, f"w{i % 5} w{(i + 1) % 5} w{(i + 2) % 5} common tail") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r["doc_id"]: r["avg_logp"] for r in bigram_logprob_self(docs).collect()}
    b = {
        r["doc_id"]: r["avg_logp"]
        for r in bigram_logprob_self(docs.repartition(7)).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-12)
