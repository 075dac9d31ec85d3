"""Bucketed-table co-located joins: the storage-partitioned-join
contract (SURVEY.md O12) on plain open-source Spark.

Asserts the property that matters at 10^10 URLs: once frontier/seen
are written bucketed on the join key, the per-round join/anti-join
plan contains NO Exchange on either side — the multi-TB seen table is
never reshuffled."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.sources.bucketed import colocated_join, save_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    spark.sql("drop table if exists t_frontier")
    spark.sql("drop table if exists t_seen")
    frontier = spark.range(0, 2000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 37).cast("string"),
                 F.lit(".example/p/"), F.col("id").cast("string")).alias("url"),
        (F.col("id") % 37).cast("string").alias("host"),
    )
    seen = frontier.filter(F.col("url").substr(-1, 1).isin("0", "1", "2")).select(
        "url"
    )
    save_bucketed(frontier, "t_frontier", "url", n_buckets=8,
                  path=str(base / "frontier"))
    save_bucketed(seen, "t_seen", "url", n_buckets=8, path=str(base / "seen"))
    yield "t_frontier", "t_seen"
    spark.sql("drop table if exists t_frontier")
    spark.sql("drop table if exists t_seen")


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_equijoin_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "url")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert joined.count() == spark.table(rt).count()


def test_bucketed_anti_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    unseen = colocated_join(spark, lt, rt, "url", how="left_anti")
    plan = _plan(unseen)
    assert "Exchange" not in plan, plan
    n_f = spark.table(lt).count()
    n_s = spark.table(rt).count()
    assert unseen.count() == n_f - n_s


def test_unbucketed_baseline_does_shuffle(spark, bucketed_tables, tmp_path):
    """Control: the same join against an unbucketed copy of the seen
    table DOES exchange — proving the no-Exchange assertion above is
    the bucket layout, not a broadcast or an empty plan."""
    lt, rt = bucketed_tables
    spark.sql("drop table if exists t_seen_plain")
    spark.table(rt).write.mode("overwrite").format("parquet").option(
        "path", str(tmp_path / "seen_plain")
    ).saveAsTable("t_seen_plain")
    try:
        joined = (
            spark.table(lt)
            .hint("shuffle_merge")
            .join(spark.table("t_seen_plain"), "url")
        )
        assert "Exchange" in _plan(joined)
    finally:
        spark.sql("drop table if exists t_seen_plain")


def test_bucketed_join_results_match_plain(spark, bucketed_tables):
    lt, rt = bucketed_tables
    a = sorted(r.url for r in colocated_join(spark, lt, rt, "url").collect())
    b = sorted(
        r.url
        for r in spark.table(lt).join(spark.table(rt), "url").collect()
    )
    assert a == b
