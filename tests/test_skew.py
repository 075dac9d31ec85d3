"""Skew diagnosis + repair (operators/skew.py): hand-computed stats,
salted-join row parity with the plain join (inner and left), and the
point of the exercise — the hot key actually spreads over multiple
shuffle partitions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.skew import key_skew_stats, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    rows = [(i, "hot") for i in range(90)]
    rows += [(100 + i, "warm") for i in range(8)]
    rows += [(200, "cold"), (201, "lonely")]
    return spark.createDataFrame(rows, "row_id long, key string")


def test_key_skew_stats_hand_computed(skewed):
    out = {r["key"]: r.asDict() for r in key_skew_stats(skewed, "key", top_k=3).collect()}
    assert set(out) == {"hot", "warm", "cold"}  # lonely cut by top_k, cold wins tie by key asc
    hot = out["hot"]
    assert (hot["krank"], hot["cnt"], hot["n_rows"], hot["n_keys"], hot["max_cnt"]) == (
        1, 90, 100, 4, 90)
    assert hot["share"] == 0.9
    assert hot["skew_ratio"] == round(90 * 4 / 100, 6)  # 3.6 = max/mean
    assert out["warm"]["krank"] == 2 and out["cold"]["krank"] == 3


@pytest.fixture(scope="module")
def dim(spark):
    return spark.createDataFrame(
        [("hot", 1), ("warm", 2), ("frozen", 3)], "key string, cohort int"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_join_parity(skewed, dim):
    plain = skewed.join(dim, "key")
    salted = salted_join(skewed, dim, "key", n_salt=8)
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


def test_salted_left_join_parity(skewed, dim):
    plain = skewed.join(dim, "key", "left")
    salted = salted_join(skewed, dim, "key", n_salt=8, how="left")
    assert _rows(salted.select(*plain.columns)) == _rows(plain)


@pytest.fixture()
def no_aqe_coalesce(spark):
    """AQE coalesces this fixture's tiny shuffles into one partition,
    hiding the layout under test; production-sized hot keys don't fit
    one AQE target partition in the first place."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, "true")
    spark.conf.set(key, "false")
    yield
    spark.conf.set(key, old)


def test_hot_key_spreads_over_partitions(skewed, dim, no_aqe_coalesce):
    # force the shuffle join the operator exists for (a broadcastable
    # dim wouldn't need salting — and would hide the partitioning)
    parts = (
        salted_join(skewed, dim.hint("shuffle_hash"), "key", n_salt=8)
        .where(F.col("key") == "hot")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    plain_parts = (
        skewed.join(dim.hint("shuffle_hash"), "key")
        .where(F.col("key") == "hot")
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    assert plain_parts == 1   # the hot key is one shuffle partition...
    assert parts > 1          # ...until it is salted


def test_salted_join_rejects_unsupported_how(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "key", how="full")
