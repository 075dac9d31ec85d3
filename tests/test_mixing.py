"""Mixture sampling, dataset-card rollups, unigram LM scoring, and
exact-substring (duplicated n-gram) dedup stats."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.dedup import duplicated_ngrams
from webcrawler_spark.operators.mixing import mixture_sample, source_report
from webcrawler_spark.operators.textstats import unigram_logprob


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, "a b c d e f g h i j", "en", "s0"),
        (1, "a b c d e f g h i j", "en", "s0"),   # exact dup of 0
        (2, "a b c d e f g h i x", "en", "s1"),   # shares the 8-gram a..h
        (3, "z y x w v u t s r q", "zh", "s1"),   # unique grams
        (4, "one two three", "es", "s0"),         # shorter than k=8
        (5, "a b c", "fr", "s0"),                 # unlisted stratum
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).cache()


def _expected_keep(doc_id: int, rate: float) -> bool:
    u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32
    return u < rate


def test_mixture_sample_matches_reference_hash(corpus):
    rates = {"en": 0.5, "zh": 0.9, "es": 0.1}
    kept = {
        r["doc_id"]
        for r in mixture_sample(
            corpus, rates, default_rate=0.3
        ).collect()
    }
    by_doc = {0: 0.5, 1: 0.5, 2: 0.5, 3: 0.9, 4: 0.1, 5: 0.3}
    expected = {d for d, rate in by_doc.items() if _expected_keep(d, rate)}
    assert kept == expected


def test_mixture_sample_invariant_to_partitioning(corpus):
    rates = {"en": 0.5, "zh": 0.9, "es": 0.1}
    a = set(
        r["doc_id"] for r in mixture_sample(corpus, rates).collect()
    )
    b = set(
        r["doc_id"]
        for r in mixture_sample(corpus.repartition(7), rates).collect()
    )
    assert a == b


def test_mixture_sample_rate_converges(spark):
    big = spark.range(0, 20_000).select(
        F.col("id").alias("doc_id"), F.lit("en").alias("lang")
    )
    n = mixture_sample(big, {"en": 0.25}, id_col="doc_id").count()
    assert abs(n / 20_000 - 0.25) < 0.02  # md5 prefix is uniform


def test_source_report_counts_and_dup_frac(corpus):
    rows = {
        (r["source"], r["stratum"]): r
        for r in source_report(corpus).collect()
    }
    s0_en = rows[("s0", "en")]
    assert s0_en["n_docs"] == 2
    assert s0_en["total_tokens"] == 20
    assert s0_en["exact_dup_frac"] == 0.5  # docs 0,1 identical
    assert rows[("s1", "en")]["exact_dup_frac"] == 0.0
    assert rows[("s0", "es")]["total_tokens"] == 3


def test_unigram_logprob_manual(spark):
    # corpus: "a a b" + "a" → counts a=3, b=1, total=4
    df = spark.createDataFrame(
        [(0, "a a b"), (1, "a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    p_a, p_b = 3 / 4, 1 / 4
    exp0 = (2 * math.log10(p_a) + math.log10(p_b)) / 3
    assert out[0]["n_tokens"] == 3
    assert out[0]["avg_logp"] == pytest.approx(round(exp0, 6), abs=1e-6)
    assert out[1]["avg_logp"] == pytest.approx(
        round(math.log10(p_a), 6), abs=1e-6
    )
    # rarer vocabulary scores lower
    assert out[0]["avg_logp"] < out[1]["avg_logp"]


def test_duplicated_ngrams_marks_shared_spans(corpus):
    out = {r["doc_id"]: r for r in duplicated_ngrams(corpus, k=8).collect()}
    # docs 0,1 identical: all 3 of their 8-grams duplicated
    for d in (0, 1):
        assert out[d]["n_grams"] == 3
        assert out[d]["dup_grams"] == 3
        assert out[d]["dup_gram_frac"] == 1.0
    # doc 2 shares two 8-grams with 0/1 ("a..h" and "b..i"); only its
    # final window "c..x" is unique
    assert out[2]["n_grams"] == 3
    assert out[2]["dup_grams"] == 2
    assert out[2]["dup_gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    # doc 3 unique; docs 4,5 shorter than k → zero grams, frac 0.0
    assert out[3]["dup_grams"] == 0
    for d in (4, 5):
        assert out[d]["n_grams"] == 0
        assert out[d]["dup_grams"] == 0
        assert out[d]["dup_gram_frac"] == 0.0


def test_duplicated_ngrams_within_doc_repeat(spark):
    # a 4-gram repeated inside ONE document still counts (Lee et al.
    # semantics: ≥2 occurrences anywhere, same doc included)
    df = spark.createDataFrame(
        [(0, "p q r s x p q r s y")], "doc_id long, text string"
    )
    out = duplicated_ngrams(df, k=4).collect()[0]
    assert out["n_grams"] == 7
    assert out["dup_grams"] == 2  # both "p q r s" windows
    assert out["dup_gram_frac"] == pytest.approx(2 / 7, abs=1e-6)


def test_duplicated_ngrams_native_hash_parity(corpus):
    a = sorted(
        tuple(r) for r in duplicated_ngrams(corpus, k=8).collect()
    )
    b = sorted(
        tuple(r)
        for r in duplicated_ngrams(corpus, k=8, native_hash=True).collect()
    )
    assert a == b


# --- temperature-scaled source sampling ------------------------------
def _temp_corpus(spark):
    rows = []
    for s, n in [("head", 80), ("mid", 16), ("tail", 4)]:
        for i in range(n):
            rows.append((len(rows), s))
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_temperature_rates_hand_computed(spark):
    from webcrawler_spark.operators.mixing import temperature_rates

    df = _temp_corpus(spark)
    rates = temperature_rates(df, temperature=2.0, target_frac=0.5)
    denom = math.sqrt(80.0) + math.sqrt(16.0) + math.sqrt(4.0)
    want = {
        s: round(min(1.0, 50.0 * math.sqrt(float(n)) / denom / n), 6)
        for s, n in [("head", 80), ("mid", 16), ("tail", 4)]
    }
    assert rates == want
    # T up-weights the tail: per-DOC keep rate grows as source shrinks
    assert rates["tail"] > rates["mid"] > rates["head"]


def test_temperature_one_is_proportional(spark):
    from webcrawler_spark.operators.mixing import temperature_rates

    rates = temperature_rates(
        _temp_corpus(spark), temperature=1.0, target_frac=0.25
    )
    assert set(rates.values()) == {0.25}


def test_temperature_mixture_deterministic_and_expected_size(spark):
    from webcrawler_spark.operators.mixing import (
        temperature_mixture,
        temperature_rates,
    )

    df = _temp_corpus(spark)
    a = {r["doc_id"] for r in temperature_mixture(df).collect()}
    b = {
        r["doc_id"]
        for r in temperature_mixture(df.repartition(7)).collect()
    }
    assert a == b
    # expectation law: sum_s rate_s * n_s == target_total, on a target
    # small enough that no source clips at rate 1.0
    rates = temperature_rates(df, target_frac=0.2)
    assert max(rates.values()) < 1.0
    exp = rates["head"] * 80 + rates["mid"] * 16 + rates["tail"] * 4
    assert abs(exp - 20.0) < 1e-3
