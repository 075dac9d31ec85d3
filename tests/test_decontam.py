"""Eval-set decontamination: per-example attribution and removal.

Extends the ngram_contamination flag (test_cleaning.py) with the
attribution and document-removal passes. Fixtures are hand-built so
the expected match sets are derivable on paper: documents share
exactly one 13-token span with a benchmark example, or none, or are
shorter than n tokens.
"""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.cleaning import (
    contamination_matches,
    decontaminate,
)

SPAN = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"
# 13 tokens exactly: one 13-gram


@pytest.fixture()
def corpus(spark):
    rows = [
        # doc 1 embeds SPAN verbatim inside unrelated text -> contaminated
        (1, "one two three " + SPAN + " four five six"),
        # doc 2 clean: same vocabulary, different order, no shared 13-gram
        (2, "mike lima kilo juliett india hotel golf foxtrot echo delta charlie bravo alpha"),
        # doc 3 shorter than n tokens -> can never be flagged
        (3, "tiny doc under thirteen tokens total here"),
        # doc 4 contains SPAN twice -> still ONE distinct shared gram
        (4, SPAN + " padding " + SPAN),
        # doc 5 contains SPAN uppercased -> grams are lowercased, so it flags
        (5, "prefix " + SPAN.upper() + " suffix"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture()
def bench(spark):
    rows = [
        (100, "intro words " + SPAN + " outro words"),
        (200, "completely disjoint benchmark example with its own vocabulary set"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_matches_exact_set(spark, corpus, bench):
    got = {
        (r.doc_id, r.bench_id, r.shared_grams)
        for r in contamination_matches(corpus, bench).collect()
    }
    # docs 1, 4, 5 each share exactly the one SPAN 13-gram with bench 100
    assert got == {(1, 100, 1), (4, 100, 1), (5, 100, 1)}


def test_matches_agree_with_flag_pass(spark, corpus, bench):
    """Attribution summed per doc == the ngram_contamination count."""
    from webcrawler_spark.operators.cleaning import ngram_contamination

    per_doc = {
        r.doc_id: r.shared_grams
        for r in contamination_matches(corpus, bench)
        .groupBy("doc_id")
        .agg(F.sum("shared_grams").alias("shared_grams"))
        .collect()
    }
    flag = {
        r.doc_id: r.n_contaminated
        for r in ngram_contamination(corpus, bench, n=13).collect()
    }
    for doc_id, n_cont in flag.items():
        assert per_doc.get(doc_id, 0) == n_cont


def test_decontaminate_drops_flagged_only(spark, corpus, bench):
    kept = sorted(r.doc_id for r in decontaminate(corpus, bench).collect())
    assert kept == [2, 3]


def test_self_decontamination_law(spark, corpus):
    """Against itself as the benchmark, every doc with >= n tokens is
    flagged (it shares all its grams with itself); only sub-n docs
    survive."""
    kept = sorted(r.doc_id for r in decontaminate(corpus, corpus).collect())
    assert kept == [3]


def test_hashed_tier_same_verdicts(spark, corpus, bench):
    plain = {
        (r.doc_id, r.bench_id, r.shared_grams)
        for r in contamination_matches(corpus, bench, hashed=False).collect()
    }
    hashed = {
        (r.doc_id, r.bench_id, r.shared_grams)
        for r in contamination_matches(corpus, bench, hashed=True).collect()
    }
    assert plain == hashed
    kept_plain = sorted(
        r.doc_id for r in decontaminate(corpus, bench, hashed=False).collect()
    )
    kept_hashed = sorted(
        r.doc_id for r in decontaminate(corpus, bench, hashed=True).collect()
    )
    assert kept_plain == kept_hashed


def test_bench_side_is_broadcast(spark, corpus, bench):
    for df in (
        contamination_matches(corpus, bench),
        decontaminate(corpus, bench),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "SortMergeJoin" not in plan


def test_smaller_n_flags_more(spark, corpus, bench):
    """Monotonicity: shrinking the gram width can only add matches."""
    wide = {
        (r.doc_id, r.bench_id)
        for r in contamination_matches(corpus, bench, n=13).collect()
    }
    narrow = {
        (r.doc_id, r.bench_id)
        for r in contamination_matches(corpus, bench, n=5).collect()
    }
    assert wide <= narrow
