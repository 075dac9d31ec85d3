"""DSIR importance-resampling laws (operators/dsir.py).

The estimator's contract (Xie et al. 2023): raw docs whose hashed
n-gram profile matches the target slice get higher log weights; the
Gumbel top-k selection is a pure function of (doc_id, weights) —
bit-stable under any partitioning.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import dsir


@pytest.fixture(scope="module")
def corpus(spark):
    # target slice: spark-flavored prose; raw pool: two docs echoing
    # the target vocabulary, two in a disjoint vocabulary
    rows = [
        (0, "spark shuffle partition join agg scan", True),
        (1, "partition join shuffle spark scan agg", True),
        (2, "spark shuffle partition join scan table", False),
        (3, "join agg partition spark shuffle scan", False),
        (4, "el zorro marron salta sobre el perro", False),
        (5, "une phrase sans rapport avec le sujet", False),
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, is_target boolean"
    ).cache()


def test_target_rows_are_not_scored(corpus):
    w = dsir.dsir_logweights(corpus, is_target=F.col("is_target"))
    ids = {r["doc_id"] for r in w.collect()}
    assert ids == {2, 3, 4, 5}


def test_target_like_docs_outweigh_off_target(corpus):
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_logweights(
            corpus, is_target=F.col("is_target")
        ).collect()
    }
    assert min(w[2], w[3]) > max(w[4], w[5])


def test_gram_counts_are_unigrams_plus_bigrams(corpus):
    w = dsir.dsir_logweights(corpus, is_target=F.col("is_target"))
    n = {r["doc_id"]: r["n_grams"] for r in w.collect()}
    # n words -> n unigrams + (n-1) bigrams
    assert n == {2: 11, 3: 11, 4: 13, 5: 13}


def test_single_word_doc_has_no_bigrams(spark):
    df = spark.createDataFrame(
        [(0, "solo", False), (1, "a b", True)],
        "doc_id long, text string, is_target boolean",
    )
    w = dsir.dsir_logweights(df, is_target=F.col("is_target"))
    assert w.collect()[0]["n_grams"] == 1


def test_sample_is_partitioning_invariant(corpus):
    def run(parts):
        w = dsir.dsir_logweights(
            corpus.repartition(parts, "doc_id"), is_target=F.col("is_target")
        )
        return [
            (r["doc_id"], r["rank"], r["key"])
            for r in dsir.dsir_sample(w, k=3).orderBy("rank").collect()
        ]

    assert run(1) == run(7)


def test_gumbel_key_matches_reference(spark):
    import hashlib

    df = spark.createDataFrame([(42, 0.0)], "doc_id long, logw double")
    got = df.select(
        dsir.gumbel_key_col(F.col("logw"), F.col("doc_id")).alias("k")
    ).collect()[0]["k"]
    h = int(hashlib.md5(b"42").hexdigest()[:8], 16)
    expected = -math.log(-math.log((h + 1.0) / float(1 << 32)))
    assert got == pytest.approx(expected, rel=1e-12)


def test_weights_shift_with_target_definition(corpus):
    # flip the target to the Spanish/French docs: the ordering inverts
    w = {
        r["doc_id"]: r["logw"]
        for r in dsir.dsir_logweights(
            corpus, is_target=F.col("doc_id") >= 4
        ).collect()
    }
    assert max(w[0], w[1], w[2], w[3]) < 0  # nothing matches the target
