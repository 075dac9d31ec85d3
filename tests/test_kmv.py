"""KMV bottom-k distinct sketch: exact-below-k, merge law,
partitioning invariance, estimator accuracy, and the intersection
estimate HLL cannot express."""

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.sketches import (
    kmv_estimate,
    kmv_intersection,
    kmv_merge,
    kmv_registers,
)


@pytest.fixture(scope="module")
def items(spark):
    # 2000 rows over 700 distinct keys, two halves for the merge law
    return spark.range(2000).select(
        (F.col("id") % 700).cast("string").alias("k"),
        (F.col("id") % 2).alias("half"),
    ).persist()


def test_exact_below_k(spark):
    df = spark.range(400).select((F.col("id") % 40).cast("string").alias("k"))
    est = kmv_estimate(kmv_registers(df, "k"), k=64).collect()[0]
    assert est["n_reg"] == 40
    assert est["est"] == 40.0  # every distinct hash present -> exact


def test_registers_bounded_and_sorted(spark, items):
    regs = kmv_registers(items, "k", k=64).collect()
    hs = sorted(r["h"] for r in regs)
    assert len(regs) == 64
    assert [r["h"] for r in regs] == sorted({r["h"] for r in regs})
    assert all(h >= 0 for h in hs)


def test_merge_law(spark, items):
    whole = kmv_registers(items, "k", k=64)
    h0 = kmv_registers(items.where("half = 0"), "k", k=64)
    h1 = kmv_registers(items.where("half = 1"), "k", k=64)
    merged = kmv_merge(h0.unionByName(h1), k=64)
    assert sorted(r["h"] for r in whole.collect()) == sorted(
        r["h"] for r in merged.collect()
    )


def test_partitioning_invariant(spark, items):
    a = sorted(r["h"] for r in kmv_registers(items.repartition(1), "k", k=32).collect())
    b = sorted(r["h"] for r in kmv_registers(items.repartition(16), "k", k=32).collect())
    assert a == b


def test_estimator_accuracy(spark, items):
    est = kmv_estimate(kmv_registers(items, "k", k=64), k=64).collect()[0]
    # standard error ~ 1/sqrt(k-2) ~ 12.7%; allow 3 sigma
    assert est["est"] == pytest.approx(700, rel=0.4)


def test_keyed_registers(spark, items):
    regs = kmv_registers(items, "k", key="half", k=16)
    counts = {r["half"]: r["cnt"] for r in regs.groupBy("half").agg(F.count("*").alias("cnt")).collect()}
    assert counts == {0: 16, 1: 16}


def test_intersection_estimate(spark):
    a = spark.range(0, 400).select(F.col("id").cast("string").alias("k"))
    b = spark.range(200, 600).select(F.col("id").cast("string").alias("k"))
    ra = kmv_registers(a, "k", k=64)
    rb = kmv_registers(b, "k", k=64)
    row = kmv_intersection(ra, rb, k=64).collect()[0]
    # truth: union 600, intersection 200
    assert row["est_union"] == pytest.approx(600, rel=0.4)
    assert row["est_intersection"] == pytest.approx(200, rel=0.6)
    assert 0 < row["matches"] <= row["n_union_reg"] == 64


def test_disjoint_intersection_is_zero(spark):
    a = spark.range(0, 300).select(F.col("id").cast("string").alias("k"))
    b = spark.range(1000, 1300).select(F.col("id").cast("string").alias("k"))
    row = kmv_intersection(
        kmv_registers(a, "k", k=64), kmv_registers(b, "k", k=64), k=64
    ).collect()[0]
    assert row["matches"] == 0 and row["est_intersection"] == 0.0


def test_native_hash_tier_estimates_correctly(spark, items):
    from webcrawler_spark.operators.sketches import kmv_registers as kr

    regs = kr(items, "k", k=64, native_hash=True)
    est = kmv_estimate(regs, k=64, native_hash=True).collect()[0]
    # without the matching space the estimate is ~2^30x off; with it,
    # the usual accuracy bound holds
    assert est["est"] == pytest.approx(700, rel=0.4)
