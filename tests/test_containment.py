"""Broder directional containment: hand-computed goldens, the
quote-in-page asymmetry Jaccard misses, and candidate-tier parity."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.dedup import containment_pairs, jaccard_pairs


@pytest.fixture(scope="module")
def corpus(spark):
    page = " ".join(f"w{i}" for i in range(40))
    quote = " ".join(f"w{i}" for i in range(10, 20))  # 10 words inside page
    other = " ".join(f"x{i}" for i in range(30))
    return spark.createDataFrame(
        [(1, page), (2, quote), (3, other)], "doc_id long, text string"
    )


def test_quote_containment_vs_jaccard(spark, corpus):
    got = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_pairs(corpus, threshold=0.5).collect()
    }
    # quote: 10 words -> 8 trigram shingles, all inside page -> c = 1.0
    assert got[(2, 1)] == 1.0
    # the reverse direction: 8 of page's 38 shingles -> ~0.21, below cut
    assert (1, 2) not in got
    # symmetric Jaccard misses the pair entirely at any useful cut:
    # 8 / (38 + 8 - 8) ~ 0.21
    j = {
        (r["a"], r["b"]): r["jaccard"]
        for r in jaccard_pairs(corpus, threshold=0.5).collect()
    }
    assert (1, 2) not in j and (2, 1) not in j


def test_containment_hand_computed(spark):
    # a: shingles {x y z, y z w}; b shares exactly one of them
    df = spark.createDataFrame(
        [(1, "x y z w"), (2, "x y z q")], "doc_id long, text string"
    )
    got = {
        (r["a"], r["b"]): r["containment"]
        for r in containment_pairs(df, threshold=0.1).collect()
    }
    assert got[(1, 2)] == 0.5  # 1 of a's 2 shingles
    assert got[(2, 1)] == 0.5


def test_containment_threshold_filters(spark, corpus):
    assert not [
        r
        for r in containment_pairs(corpus, threshold=0.99).collect()
        if r["a"] == 1 or r["b"] == 3
    ]


def test_candidate_tier_parity(spark, corpus):
    exact = containment_pairs(corpus, threshold=0.5)
    cand = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 1)], "a long, b long"
    )
    bounded = containment_pairs(corpus, threshold=0.5, candidates=cand)
    # row-identical on pairs the candidate set contains
    assert sorted(map(tuple, bounded.collect())) == sorted(
        t for t in map(tuple, exact.collect()) if (t[0], t[1]) in {(2, 1), (1, 2), (3, 1)}
    )


def test_short_text_no_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    assert containment_pairs(df, threshold=0.1).count() == 0
