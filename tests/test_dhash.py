"""Image dHash near-dup: brightness invariance (the property the
oracle query exploits), discrimination, the shared pigeonhole band
join, and reject handling."""

import hashlib

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.multimodal import (
    dhash_images,
    dhash_near_pairs,
    dhash_py,
    encode_ppm,
)


def _img(seed: str, shift: int = 0) -> bytes:
    hx = (hashlib.md5(seed.encode()).hexdigest() * 9)[:288]
    payload = bytes(ord(c) + shift for c in hx)
    return encode_ppm(payload, width=9)


def test_dhash_brightness_invariant():
    # +10 on every pixel is strictly monotone -> every adjacent
    # comparison, hence the whole hash, is unchanged
    assert dhash_py(_img("doc1")) == dhash_py(_img("doc1", shift=10))


def test_dhash_discriminates():
    hs = {dhash_py(_img(f"doc{i}")) for i in range(50)}
    assert len(hs) == 50


def test_dhash_small_image_ok():
    # 1x1 image: NN downsample repeats the single pixel -> all
    # comparisons false -> hash 0; must not crash
    assert dhash_py(b"P6\n1 1\n255\nabc") == 0


def test_dhash_near_pairs_finds_planted_copies(spark):
    rows = []
    for i in range(30):
        rows.append((i, bytearray(_img(f"doc{i}"))))
        if i % 10 == 0:
            rows.append((i + 1000, bytearray(_img(f"doc{i}", shift=10))))
    media = spark.createDataFrame(rows, "media_id long, content binary")
    got = sorted(
        (r["a"], r["b"], r["hamming"])
        for r in dhash_near_pairs(media).collect()
    )
    assert got == [(0, 1000, 0), (10, 1010, 0), (20, 1020, 0)]


def test_dhash_plan_no_cross_join(spark):
    media = spark.createDataFrame(
        [(i, bytearray(_img(str(i)))) for i in range(10)],
        "media_id long, content binary",
    )
    plan = (
        dhash_near_pairs(media)._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dhash_undecodable_rows_dropped(spark):
    media = spark.createDataFrame(
        [(1, bytearray(_img("x"))), (2, bytearray(b"\x89PNG not netpbm"))],
        "media_id long, content binary",
    )
    got = dhash_images(media).collect()
    assert [r["media_id"] for r in got] == [1]
