"""Cleaning operators: Gopher-rule quality gate, corpus segment dedup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import cleaning


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # 0: healthy doc — passes everything (26 words, stopwords, varied)
        (0, "the quick brown fox jumps over the lazy dog while a bird "
            "watches from the tall tree and sings a song about the morning sun"),
        # 1: too short
        (1, "tiny doc"),
        # 2: no stopwords
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"),
        # 3: symbol spam (### and ...)
        (3, "the a # # # # # # ... ... ... the a of to in is on for with "
            "more words to cross the minimum length bar here now"),
        # 4: hyper-repetitive bigrams
        (4, " ".join(["spam ham"] * 15) + " the a of to in"),
        # 5: absurd word lengths
        (5, "the a " + " ".join(["pneumonoultramicroscopicsilicovolcanoconiosis"] * 20)),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_gopher_flags_per_rule(docs):
    flags = {
        r["doc_id"]: r
        for r in cleaning.gopher_quality_flags(
            docs, min_words=15, max_words=1000, min_stopword_hits=2,
            max_symbol_ratio=0.1, max_dup_2gram_ratio=0.4,
        ).collect()
    }
    assert flags[0]["keep"]
    assert not flags[1]["ok_word_count"] and not flags[1]["keep"]
    assert not flags[2]["ok_stopwords"] and not flags[2]["keep"]
    assert not flags[3]["ok_symbol_ratio"] and not flags[3]["keep"]
    assert not flags[4]["ok_repetition"] and not flags[4]["keep"]
    assert not flags[5]["ok_avg_word_len"] and not flags[5]["keep"]


def test_apply_gopher_filter_semijoin(docs):
    kept = cleaning.apply_gopher_filter(
        docs, min_words=15, max_words=1000, min_stopword_hits=2,
        max_symbol_ratio=0.1, max_dup_2gram_ratio=0.4,
    )
    assert [r["doc_id"] for r in kept.select("doc_id").collect()] == [0]
    assert kept.columns == docs.columns


def test_segment_dedup_drops_shared_blocks(spark):
    shared = "one two three four five six seven eight"
    rows = [
        (0, shared + " unique tail zero alpha beta gamma delta epsilon"),
        (1, shared + " unique tail one zeta eta theta iota kappa"),
        (2, "totally different words that collide with nothing at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in cleaning.dedup_text_segments(
            df, words_per_segment=8, max_dupes=1
        ).collect()
    }
    # doc 0 is the first occurrence of the shared block: keeps both segments
    assert out[0]["clean_text"].startswith(shared)
    assert out[0]["n_kept"] == 2 and out[0]["n_total"] == 2
    # doc 1 loses the shared block but keeps its unique tail
    assert out[1]["clean_text"] == "unique tail one zeta eta theta iota kappa"
    assert out[1]["n_kept"] == 1 and out[1]["n_total"] == 2
    # doc 2 untouched (9 words -> two segments, both kept)
    assert out[2]["clean_text"] == rows[2][1]
    assert out[2]["n_kept"] == 2 and out[2]["n_total"] == 2


def test_segment_dedup_reassembles_in_order(spark):
    words = [f"w{i}" for i in range(24)]
    df = spark.createDataFrame([(7, " ".join(words))], "doc_id long, text string")
    out = cleaning.dedup_text_segments(df, words_per_segment=8).first()
    assert out["clean_text"] == " ".join(words)
    assert out["n_kept"] == 3 and out["n_total"] == 3


def test_segment_dedup_all_dropped_doc_survives_empty(spark):
    block = "a b c d e f g h"
    df = spark.createDataFrame(
        [(0, block), (1, block), (2, block)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in cleaning.dedup_text_segments(df).collect()}
    assert out[0]["clean_text"] == block           # keeper
    assert out[1]["clean_text"] == "" and out[1]["n_kept"] == 0
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
    assert all(out[i]["n_total"] == 1 for i in range(3))


def test_segment_dedup_max_dupes_threshold(spark):
    block = "a b c d e f g h"
    df = spark.createDataFrame(
        [(0, block), (1, block)], "doc_id long, text string"
    )
    out = cleaning.dedup_text_segments(df, max_dupes=2)
    # duplicated twice but threshold allows 2 copies -> nothing dropped
    assert all(r["clean_text"] == block for r in out.collect())


# ---------------------------------------------------------------------------
# repetition stats (Gopher §A1.1 signals)
# ---------------------------------------------------------------------------


def test_repetition_stats_values(spark):
    rows = [
        (0, "a b c d"),                 # all unique
        (1, "x x x x x"),               # one word repeated
        (2, "a b a b a b"),             # trigrams "a b a"/"b a b" repeat
        (3, "solo"),                    # single word, no trigrams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in cleaning.repetition_stats(df).collect()}
    assert out[0]["top_word_cnt"] == 1 and out[0]["top_word_frac"] == 0.25
    assert out[0]["dup_3gram_frac"] == 0.0
    assert out[1]["top_word_frac"] == 1.0
    # 3 trigrams, all "x x x" -> 1 distinct -> 2/3 duplicated
    assert out[1]["dup_3gram_frac"] == pytest.approx(2 / 3)
    # 4 trigrams: a b a, b a b, a b a, b a b -> 2 distinct -> 1/2
    assert out[2]["n_words"] == 6 and out[2]["top_word_cnt"] == 3
    assert out[2]["dup_3gram_frac"] == 0.5
    assert out[3]["n_words"] == 1 and out[3]["top_word_frac"] == 1.0
    assert out[3]["dup_3gram_frac"] == 0.0


def test_repetition_stats_is_shuffle_free(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = (
        cleaning.repetition_stats(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# ---------------------------------------------------------------------------
# n-gram contamination (train-test decontamination)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def contam_frames(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains bench 3-gram "quick brown fox" (and more)
            (0, "I saw the Quick Brown Fox jumps over a fence"),
            # no 3-gram overlap
            (1, "completely different words live in this document"),
            # two distinct contaminated grams, one repeated twice
            (2, "quick brown fox quick brown fox lazy dog bark"),
        ],
        "doc_id long, text string",
    )
    return docs, bench


def test_ngram_contamination_counts(contam_frames):
    docs, bench = contam_frames
    out = {
        r["doc_id"]: r
        for r in cleaning.ngram_contamination(docs, bench, n=3).collect()
    }
    assert len(out) == 3
    # doc 0: lowercased grams "the quick brown","quick brown fox",
    # "brown fox jumps","fox jumps over" all occur in bench
    assert out[0]["n_contaminated"] == 4 and out[0]["contaminated"]
    assert out[1]["n_contaminated"] == 0 and not out[1]["contaminated"]
    # doc 2: distinct grams hitting bench: "quick brown fox",
    # "brown fox quick"? no; "fox quick brown"? no; "fox lazy dog"? no
    # -> only "quick brown fox" (deduped) = 1
    assert out[2]["n_contaminated"] == 1 and out[2]["contaminated"]


def test_ngram_contamination_hashed_tier_parity(contam_frames):
    docs, bench = contam_frames
    a = sorted(
        map(tuple, cleaning.ngram_contamination(docs, bench, n=3).collect())
    )
    b = sorted(
        map(
            tuple,
            cleaning.ngram_contamination(
                docs, bench, n=3, hashed=True, broadcast_bench=False
            ).collect(),
        )
    )
    assert a == b


def test_ngram_contamination_short_docs(spark):
    bench = spark.createDataFrame([(9, "a b")], "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "a"), (1, "a b c d e")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r["n_contaminated"]
        for r in cleaning.ngram_contamination(docs, bench, n=13).collect()
    }
    # every doc shorter than n yields zero grams on both sides
    assert out == {0: 0, 1: 0}


def test_line_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta\nnav bar\nalpha beta\ncontent line\nalpha beta"),
            (2, "one\ntwo\nthree"),
            (3, "same\nsame"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cleaning.line_repetition_stats(df).collect()}
    r1 = out[1]
    # lines: [ab, nav, ab, content, ab] -> 5 lines, 3 distinct
    assert (r1["n_lines"], r1["n_distinct"]) == (5, 3)
    assert r1["dup_line_frac"] == 2 / 5
    # dup chars: (3-1)*len("alpha beta"); total = 3*10 + 7 + 12
    assert r1["dup_char_frac"] == (2 * 10) / (3 * 10 + 7 + 12)
    assert out[2]["dup_line_frac"] == 0.0 and out[2]["dup_char_frac"] == 0.0
    assert out[3]["dup_line_frac"] == 0.5
    assert out[3]["dup_char_frac"] == 4 / 8


def test_line_repetition_paragraph_variant_and_plan(spark):
    df = spark.createDataFrame(
        [(1, "para one\nstill para one\n\npara one\nstill para one\n\nunique")],
        "doc_id long, text string",
    )
    r = cleaning.line_repetition_stats(df, sep="\n\n").collect()[0]
    assert (r["n_lines"], r["n_distinct"]) == (3, 2)
    plan = (
        cleaning.line_repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_ngram_repetition_stats_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 'ab cd' appears twice (top 2-gram); the 5-gram
            # 'ab cd ab cd xy' appears twice -> covers positions 1..6
            (1, "ab cd ab cd xy ab cd ab cd xy zz"),
            (2, "one two three"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in cleaning.ngram_repetition_stats(df).collect()}
    r1 = out[1]
    assert r1["n_words"] == 11
    # bigram counts: 'ab cd' x4, 'cd ab' x2, 'cd xy' x2, 'xy ab' x1, 'xy zz' x1
    assert (r1["top_gram"], r1["top_gram_cnt"]) == ("ab cd", 4)
    total = 2 * 11  # eleven 2-char words
    assert r1["top_gram_char_frac"] == 4 * len("ab cd") / total
    # duplicated 5-grams: positions 1..10 covered (word 'zz' not)
    assert r1["dup_gram_char_frac"] == 20 / total
    r2 = out[2]
    assert (r2["top_gram"], r2["top_gram_cnt"]) == ("one two", 1)
    assert r2["dup_gram_char_frac"] == 0.0
    r3 = out[3]
    assert (r3["top_gram"], r3["top_gram_cnt"]) == ("", 0)
    assert r3["top_gram_char_frac"] == 0.0 and r3["dup_gram_char_frac"] == 0.0


def test_ngram_repetition_tie_breaks_lexicographic(spark):
    df = spark.createDataFrame(
        [(1, "zz yy zz yy aa bb aa bb")], "doc_id long, text string"
    )
    r = cleaning.ngram_repetition_stats(df).collect()[0]
    # 'aa bb', 'zz yy' both occur twice -> smallest gram wins
    assert (r["top_gram"], r["top_gram_cnt"]) == ("aa bb", 2)


def test_ngram_repetition_shuffle_free(spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], "doc_id long, text string")
    plan = (
        cleaning.ngram_repetition_stats(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
