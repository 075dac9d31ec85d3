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
