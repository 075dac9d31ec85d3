"""Partitioned Bloom seen-filter (SURVEY.md O5) — safety properties."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_spark.operators.bloom import (
    _bit_positions,
    anti_join_with_bloom,
    build_bloom,
    hash_cols,
    optimal_bits,
)


def test_no_false_drops_exact_equivalence(spark):
    """anti_join_with_bloom ≡ left_anti join, for any overlap pattern."""
    seen = spark.createDataFrame(
        [(f"https://h{i % 7}.x/p{i}",) for i in range(0, 500, 2)], "url string"
    )
    cand = spark.createDataFrame(
        [(f"https://h{i % 7}.x/p{i}",) for i in range(500)], "url string"
    )
    got = {r["url"] for r in anti_join_with_bloom(cand, seen, "url").collect()}
    want = {r["url"] for r in cand.join(seen, "url", "left_anti").collect()}
    assert got == want
    assert len(want) == 250


def test_tiny_filter_heavy_fp_still_correct(spark):
    """Undersized bitmap ⇒ many false positives ⇒ the exact join must
    still rescue every never-seen URL (SURVEY.md §7.4(4))."""
    seen = spark.createDataFrame([(f"u{i}",) for i in range(100)], "url string")
    cand = spark.createDataFrame([(f"u{i}",) for i in range(300)], "url string")
    got = {
        r["url"]
        for r in anti_join_with_bloom(cand, seen, "url", m_bits=64).collect()
    }
    assert got == {f"u{i}" for i in range(100, 300)}


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1)
        ),
        max_size=40,
        unique=True,
    )
)
@settings(max_examples=30, deadline=None)
def test_bloom_membership_no_false_negatives(hashes):
    """Pure-numpy property over arbitrary 64-bit hash pairs (the hash
    family itself is native xxhash64): every inserted key probes
    positive."""
    import numpy as np

    if not hashes:
        return
    m = optimal_bits(len(hashes))
    h1 = np.array([a for a, _ in hashes], dtype=np.uint64)
    h2 = np.array([b for _, b in hashes], dtype=np.uint64)
    pos = _bit_positions(h1, h2, m)
    bitmap = np.zeros(m // 8, dtype=np.uint8)
    flat = pos.ravel()
    np.bitwise_or.at(
        bitmap, (flat // 8).astype(np.int64), (1 << (flat % 8)).astype(np.uint8)
    )
    bits = (bitmap[(pos // 8).astype(np.int64)] >> (pos % 8).astype(np.uint8)) & 1
    assert bits.all()


def test_shard_join_mode_too_big_to_broadcast(spark):
    """The 10^10-URL topology: broadcast_cap_bytes=0 forces the
    cogrouped shard-key probe — the filter stays a (shard, bitmap)
    DataFrame, never one driver/broadcast object — and the routing must
    still be exactly the left_anti join. Extra candidate columns ride
    through the cogroup untouched."""
    seen = spark.createDataFrame(
        [(f"https://h{i % 5}.x/p{i}",) for i in range(0, 600, 3)], "url string"
    )
    cand = spark.createDataFrame(
        [(f"https://h{i % 5}.x/p{i}", i) for i in range(600)], "url string, depth int"
    )
    out = anti_join_with_bloom(
        cand, seen, "url", n_shards=4, broadcast_cap_bytes=0
    )
    got = {(r["url"], r["depth"]) for r in out.collect()}
    want = {
        (r["url"], r["depth"])
        for r in cand.join(seen, "url", "left_anti").collect()
    }
    assert got == want
    assert len(want) == 400
    # the physical plan must contain the cogroup, i.e. the probe really
    # ran as a shard-key join rather than a whole-filter broadcast UDF
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan


def test_broadcast_and_shard_join_tag_identically(spark):
    """Both probe modes are the same filter — forcing each mode must
    yield identical survivor sets (same hashes, same per-shard bitmaps)."""
    seen = spark.createDataFrame([(f"u{i}",) for i in range(0, 400, 2)], "url string")
    cand = spark.createDataFrame([(f"u{i}",) for i in range(400)], "url string")
    kw = dict(col="url", n_shards=4, m_bits=4096)
    a = {r["url"] for r in anti_join_with_bloom(cand, seen, mode="broadcast", **kw).collect()}
    b = {r["url"] for r in anti_join_with_bloom(cand, seen, mode="shard_join", **kw).collect()}
    assert a == b


def test_build_bloom_distributed_matches_local(spark):
    """mapInPandas partial-bitmap OR-merge == single-pass build."""
    import numpy as np
    import pandas as pd

    urls = [f"https://site{i}.example/{i*i}" for i in range(1000)]
    df = spark.createDataFrame([(u,) for u in urls], "url string").repartition(8)
    m = optimal_bits(1000)
    got = build_bloom(df, "url", m)

    local = np.zeros(m // 8, dtype=np.uint8)
    c1, c2 = hash_cols("url")
    hpd = df.select(c1.alias("h1"), c2.alias("h2")).toPandas()
    h1 = hpd["h1"].to_numpy(np.int64).view(np.uint64)
    h2 = hpd["h2"].to_numpy(np.int64).view(np.uint64)
    pos = _bit_positions(h1, h2, m).ravel()
    np.bitwise_or.at(
        local, (pos // 8).astype(np.int64), (1 << (pos % 8)).astype(np.uint8)
    )
    assert np.array_equal(got, local)
