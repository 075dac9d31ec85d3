"""Distributed BPE trainer (operators/bpe.py) vs an independent
pure-Python Sennrich reference: merge tables and segmentations must
match exactly, including greedy-overlap words (aaaa, abab), with the
tie order (count DESC, left ASC, right ASC) and at any parallelism.
The native replace-replay and the Arrow mapInPandas replay must be
bit-identical."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.bpe import (
    SEP,
    apply_merges_native,
    apply_merges_pandas,
    encode,
    init_symbols,
    pair_counts,
    train_bpe,
    word_freqs,
)


# --- independent reference (Sennrich 2016 get_stats/merge_vocab) -----
def _ref_train(word_freq: dict[str, int], n_merges: int):
    vocab = {tuple(w): f for w, f in word_freq.items()}
    merges = []
    for rank in range(n_merges):
        stats: dict[tuple[str, str], int] = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                stats[p] = stats.get(p, 0) + f
        if not stats:
            break
        # count DESC, then (left, right) ASC — the operator's tie order
        (a, b), cnt = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, cnt))
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, {
        "".join(syms): syms for syms in vocab
    }  # word isn't recoverable from merged keys; callers use fixtures


def _ref_segment(word: str, merges) -> list[str]:
    syms = list(word)
    for _, a, b, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def _wf_df(spark, wf: dict[str, int]):
    return spark.createDataFrame(list(wf.items()), "word string, freq long")


def _syms_map(symdf):
    return {
        r["word"]: [s for s in r["syms"].split(SEP) if s]
        for r in symdf.collect()
    }


FIXTURE = {"lowest": 5, "lower": 6, "low": 7, "newest": 3, "widest": 2}
OVERLAP = {"aaaa": 3, "abab": 2, "aaa": 1, "banana": 4}


@pytest.mark.parametrize("wf,k", [(FIXTURE, 8), (OVERLAP, 6)])
def test_trainer_matches_sennrich_reference(spark, wf, k):
    merges, symdf = train_bpe(_wf_df(spark, wf), k, checkpoint_every=3)
    ref_merges, _ = _ref_train(wf, k)
    assert merges == ref_merges
    got = _syms_map(symdf)
    for w in wf:
        assert got[w] == _ref_segment(w, ref_merges), w


def test_pair_counts_multiplicity(spark):
    # "aaa" freq 2 → (a,a) occurs 2 positions × 2 = 4
    df = init_symbols(_wf_df(spark, {"aaa": 2, "ab": 1}))
    rows = {(r["left"], r["right"]): r["cnt"] for r in pair_counts(df).collect()}
    assert rows == {("a", "a"): 4, ("a", "b"): 1}


def test_single_char_words_yield_no_pairs(spark):
    df = init_symbols(_wf_df(spark, {"a": 5, "b": 3}))
    assert pair_counts(df).count() == 0
    merges, _ = train_bpe(_wf_df(spark, {"a": 5}), 4)
    assert merges == []


def test_early_stop_when_fully_merged(spark):
    # "ab" exhausts after 1 merge even though 5 were requested
    merges, symdf = train_bpe(_wf_df(spark, {"ab": 9}), 5)
    assert [(m[1], m[2]) for m in merges] == [("a", "b")]
    assert _syms_map(symdf)["ab"] == ["ab"]


def test_partition_invariance(spark):
    df = _wf_df(spark, FIXTURE)
    m1, _ = train_bpe(df.repartition(1), 6)
    m7, _ = train_bpe(df.repartition(7), 6)
    assert m1 == m7


def test_apply_paths_bit_identical(spark):
    merges, _ = train_bpe(_wf_df(spark, FIXTURE), 8)
    held = spark.createDataFrame(
        [("slowest",), ("wider",), ("newer",), ("abab",), ("q",)],
        "word string",
    )
    nat = {r["word"]: r["syms"] for r in apply_merges_native(held, merges).collect()}
    pnd = {r["word"]: r["syms"] for r in apply_merges_pandas(held, merges).collect()}
    assert nat == pnd
    for w, s in nat.items():
        assert [x for x in s.split(SEP) if x] == _ref_segment(w, merges), w


def test_word_freqs_uses_pretokenizer(spark):
    df = spark.createDataFrame([(0, "the cat the hat"),], "doc_id long, text string")
    wf = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    # GPT-2-style: leading-space pretokens for non-initial words
    assert wf == {"the": 1, " cat": 1, " the": 1, " hat": 1}


def test_vocab_ids_are_chars_then_merges(spark):
    from webcrawler_spark.operators.bpe import vocab_from_merges

    wf = _wf_df(spark, {"ab": 3, "ba": 1})
    merges, _ = train_bpe(wf, 1)  # learns (a, b)
    vocab = {
        r["piece"]: r["id"]
        for r in vocab_from_merges(wf.select("word"), merges).collect()
    }
    assert vocab == {"a": 0, "b": 1, "ab": 2}


def test_encode_ids_matches_reference_and_maps_unseen_to_unk(spark):
    from webcrawler_spark.operators.bpe import encode_ids, vocab_from_merges

    corpus = spark.createDataFrame(
        [(0, "low lower"), (1, "newest low")], "doc_id long, text string"
    )
    wf = word_freqs(corpus)
    merges, _ = train_bpe(wf, 4)
    vocab_df = vocab_from_merges(wf.select("word"), merges)
    vocab = {r["piece"]: r["id"] for r in vocab_df.collect()}
    # base chars lexicographic from 0, merge products after
    base = sorted(p for p in vocab if len(p) == 1)
    assert [vocab[p] for p in base] == list(range(len(base)))
    held = spark.createDataFrame([(9, "low zz")], "doc_id long, text string")
    out = {
        r["doc_id"]: r["ids"]
        for r in encode_ids(held, merges, vocab_df).collect()
    }
    want = []
    for i, w in enumerate("low zz".split(" ")):
        for piece in _ref_segment(w if i == 0 else " " + w, merges):
            want.append(vocab.get(piece, -1))
    assert out[9] == want
    assert -1 in out[9]  # 'z' never seen in training


def test_encode_reassembles_in_order(spark):
    corpus = spark.createDataFrame(
        [(0, "low lower"), (1, "newest low")], "doc_id long, text string"
    )
    merges, _ = train_bpe(word_freqs(corpus), 4)
    out = {r["doc_id"]: r["tokens"] for r in encode(corpus, merges).collect()}
    for did, text in [(0, "low lower"), (1, "newest low")]:
        want = []
        for i, w in enumerate(text.split(" ")):
            want += _ref_segment(w if i == 0 else " " + w, merges)
        assert out[did] == want, did
