"""Training-sequence packing (operators/packing.py).

Laws checked:
- concat-then-chunk: spans tile the token stream exactly (no gaps, no
  overlap), arithmetic fields are mutually consistent, and the result
  is invariant to input partitioning (the distributed prefix-sum is
  order-exact).
- shard-local greedy: within every (shard, sequence) the occupied
  intervals are disjoint, never exceed seq_len, a doc never straddles
  sequences, sequences close exactly when the next doc does not fit
  (greedy law re-checked by a sequential replay), and the result is
  bit-identical at different parallelism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.packing import (
    pack_concat_chunks,
    pack_greedy,
    packing_stats,
    token_count_col,
)

SEQ = 16


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 7) % 23 + (3 if i % 5 else 0))))
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.select(
        "doc_id", token_count_col("text").cast("long").alias("n_tokens")
    )


def test_concat_chunks_tiles_stream_exactly(docs):
    out = pack_concat_chunks(docs, SEQ).orderBy("doc_id").collect()
    pos = 0
    for r in out:
        assert r.tok_start == pos, "spans must tile with no gap/overlap"
        assert r.seq_first == r.tok_start // SEQ
        assert r.seq_last == (r.tok_start + r.n_tokens - 1) // SEQ
        assert r.offset_in_seq == r.tok_start % SEQ
        assert r.n_seqs == r.seq_last - r.seq_first + 1
        pos += r.n_tokens
    total = sum(r.n_tokens for r in out)
    assert pos == total


def test_concat_chunks_partitioning_invariant(docs):
    a = pack_concat_chunks(docs, SEQ).orderBy("doc_id").collect()
    b = (
        pack_concat_chunks(docs.repartition(7), SEQ)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b


def _greedy_replay(items, seq_len):
    """Reference sequential replay of the greedy law."""
    out = {}
    seq, used = 0, 0
    for did, nt in items:
        if nt <= 0:
            continue
        eff = min(nt, seq_len)
        if used > 0 and used + eff > seq_len:
            seq, used = seq + 1, 0
        out[did] = (seq, used, 1 if nt > seq_len else 0)
        used += eff
        if used >= seq_len:
            seq, used = seq + 1, 0
    return out


def test_greedy_matches_sequential_replay(docs):
    got = pack_greedy(docs, SEQ, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in sorted(got, key=lambda r: r.doc_id):
        by_shard.setdefault(r.shard, []).append(r)
    src = {r.doc_id: r.n_tokens for r in docs.collect()}
    assert sum(len(v) for v in by_shard.values()) == sum(
        1 for v in src.values() if v > 0
    )
    for shard, rows in by_shard.items():
        want = _greedy_replay([(r.doc_id, src[r.doc_id]) for r in rows], SEQ)
        for r in rows:
            assert (r.seq_in_shard, r.offset_in_seq, r.truncated) == want[
                r.doc_id
            ], f"greedy law violated for doc {r.doc_id} in shard {shard}"


def test_greedy_capacity_and_no_straddle(docs):
    got = pack_greedy(docs, SEQ, n_shards=4).collect()
    fill: dict[tuple, int] = {}
    for r in got:
        eff = min(r.n_tokens, SEQ)
        assert r.offset_in_seq + eff <= SEQ, "doc must fit its sequence"
        key = (r.shard, r.seq_in_shard)
        fill[key] = max(fill.get(key, 0), r.offset_in_seq + eff)
        assert r.offset_in_seq >= 0
    assert all(v <= SEQ for v in fill.values())


def test_greedy_parallelism_invariant(docs):
    a = sorted(map(tuple, pack_greedy(docs, SEQ, n_shards=4).collect()))
    b = sorted(
        map(tuple, pack_greedy(docs.repartition(11), SEQ, n_shards=4).collect())
    )
    assert a == b


def test_packing_stats_waste(spark):
    docs = spark.createDataFrame(
        [(0, 10), (1, 10), (2, 20)], "doc_id long, n_tokens long"
    )
    packed = pack_greedy(docs, 16, n_shards=1)
    st = packing_stats(packed, 16).collect()[0]
    # greedy in doc_id order: doc0 -> seq0[0:10]; doc1 does not fit ->
    # seq1[0:10]; doc2 truncated to 16 -> seq2 full
    assert st.n_docs == 3 and st.n_seqs == 3 and st.n_truncated == 1
    assert st.tokens_packed == 10 + 10 + 16
    assert abs(st.waste_frac - (1 - 36 / 48)) < 1e-6
