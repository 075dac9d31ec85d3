"""Sharded positional inverted index (operators/index.py): posting
goldens, phrase adjacency (incl. repeated-word phrases and 3-word
phrases), independent direct-scan parity, hot-term shard spread, and
the no-corpus-access search plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.index import (
    build_inverted_index,
    phrase_search,
    term_doc_freqs,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "full table scan beats index scan sometimes"),
        (2, "table scan table scan table scan"),
        (3, "the scan table order is reversed here"),
        (4, "no relevant words at all"),
        (5, "a table  scan with a double space"),  # still adjacent words
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def index(docs):
    return build_inverted_index(docs).persist()


def test_postings_hand_computed(index):
    rows = {
        (r["term"], r["doc_id"]): r["positions"] for r in index.collect()
    }
    assert rows[("scan", 1)] == [2, 5]
    assert rows[("table", 2)] == [0, 2, 4]
    assert rows[("scan", 2)] == [1, 3, 5]
    # doc 5: the double space yields an empty token that must be gone
    assert rows[("table", 5)] == [1]
    assert rows[("scan", 5)] == [2]


def test_phrase_search_adjacency(index):
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(index, "table scan").collect()}
    assert got == {1: 1, 2: 3, 5: 1}  # doc 3 has the words reversed


def test_phrase_repeated_word(index):
    got = {r["doc_id"]: r["n_matches"] for r in phrase_search(index, "scan table").collect()}
    assert got == {2: 2, 3: 1}


def test_three_word_phrase(index):
    got = {
        r["doc_id"]: r["n_matches"]
        for r in phrase_search(index, "table scan table").collect()
    }
    assert got == {2: 2}


def test_parity_with_direct_scan(spark, index, docs):
    """Index-based search must equal a from-scratch positional scan
    (the same independence the DuckDB oracle provides)."""
    words = F.filter(F.split("text", " "), lambda w: w != "")
    direct = (
        docs.select("doc_id", words.alias("ws"))
        .select(
            "doc_id",
            F.size(
                F.filter(
                    F.sequence(F.lit(0), F.greatest(F.size("ws") - 2, F.lit(0))),
                    lambda i: (F.element_at("ws", i + 1) == "table")
                    & (F.element_at("ws", i + 2) == "scan"),
                )
            ).alias("n"),
        )
        .where("n > 0")
    )
    a = sorted((r["doc_id"], r["n_matches"]) for r in phrase_search(index, "table scan").collect())
    b = sorted((r["doc_id"], r["n"]) for r in direct.collect())
    assert a == b


def test_hot_term_spreads_over_shards(spark):
    big = spark.range(400).selectExpr(
        "id as doc_id", "'the quick the lazy the end' as text"
    )
    ix = build_inverted_index(big)
    shards = ix.where("term = 'the'").select("shard").distinct().count()
    assert shards > 8  # 400 docs over 16 shards: a hot term fans out


def test_term_doc_freqs(index):
    stats = {r["term"]: (r["doc_freq"], r["coll_freq"]) for r in term_doc_freqs(index).collect()}
    assert stats["table"] == (4, 6)
    assert stats["scan"] == (4, 7)
    assert stats["sometimes"] == (1, 1)


def test_search_plan_reads_only_the_index(spark, docs, tmp_path_factory):
    """Persist the index, search from the files: the plan must contain
    no corpus scan and no cartesian product."""
    root = str(tmp_path_factory.mktemp("ix")) + "/index"
    build_inverted_index(docs).write.parquet(root)
    ix = spark.read.parquet(root)
    plan = (
        phrase_search(ix, "table scan")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # pushdown: each join side scans parquet with the term filter
    assert plan.count("PushedFilters: [IsNotNull(term), EqualTo(term,table)") == 1
    assert plan.count("PushedFilters: [IsNotNull(term), EqualTo(term,scan)") == 1
