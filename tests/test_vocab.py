"""Vocabulary + encoding laws (operators/vocab.py): id order follows
(count desc, term asc); round-trip decode recovers in-vocab tokens;
OOV encodes as unk; order preserved; partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.vocab import build_vocab, encode_docs


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "b a b c b a"), (1, "a c d"), (2, "")],
        "doc_id long, text string",
    )


def test_vocab_id_order(docs):
    v = {r["term"]: (r["token_id"], r["c"]) for r in build_vocab(docs).collect()}
    # counts: b=3, a=3, c=2, d=1, ''=1 — ties broken by term asc
    assert v["a"] == (0, 3) and v["b"] == (1, 3) and v["c"] == (2, 2)


def test_max_size_and_min_count(docs):
    assert build_vocab(docs, max_size=2).count() == 2
    v = build_vocab(docs, min_count=2)
    assert {r["term"] for r in v.collect()} == {"a", "b", "c"}


def test_encode_order_and_unk(spark, docs):
    vocab = build_vocab(docs, min_count=2)  # a=0 b=1 c=2; d + '' are OOV
    enc = {r["doc_id"]: r for r in encode_docs(docs, vocab).collect()}
    assert enc[0]["token_ids"] == [1, 0, 1, 2, 1, 0]
    assert enc[1]["token_ids"] == [0, 2, -1]
    assert enc[1]["n_unk"] == 1
    # split('') yields [''] — one OOV token, not an empty doc
    assert enc[2]["token_ids"] == [-1]


def test_partition_invariance(spark):
    rows = [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(20))) for i in range(50)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    va = build_vocab(d)
    a = {r["doc_id"]: r["token_ids"] for r in encode_docs(d, va).collect()}
    vb = build_vocab(d.repartition(9))
    b = {r["doc_id"]: r["token_ids"] for r in encode_docs(d.repartition(5), vb).collect()}
    assert a == b
