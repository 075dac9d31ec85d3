"""Structured Streaming surfaces: incremental stats + windowed aggs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.sources.synthetic_web import build_pages
from webcrawler_spark.streaming.incremental import (
    incremental_text_stats,
    text_stats_pipeline,
    windowed_host_throughput,
)


def test_incremental_equals_batch(spark, tmp_path_factory):
    """AvailableNow streaming over the pages dir == plain batch run."""
    root = tmp_path_factory.mktemp("stream")
    pages_dir = str(root / "pages")
    out_dir = str(root / "stats")
    ckpt = str(root / "ckpt")

    pages = build_pages(spark)
    pages.write.parquet(pages_dir)

    incremental_text_stats(spark, pages_dir, out_dir, ckpt)
    got = {
        r["url"]: (r["n_tokens"], r["quality"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["url"]: (r["n_tokens"], r["quality"], r["text"])
        for r in text_stats_pipeline(spark.read.parquet(pages_dir)).collect()
    }
    assert got == want
    assert len(got) > 30

    # exactly-once: a second drain with the same checkpoint adds nothing
    incremental_text_stats(spark, pages_dir, out_dir, ckpt)
    assert spark.read.parquet(out_dir).count() == len(got)

    # incremental: drop a NEW snapshot file, only it is processed
    extra = pages.limit(3).withColumn(
        "url", F.concat(F.lit("https://late.example"), F.col("url"))
    )
    extra.write.mode("append").parquet(pages_dir)
    incremental_text_stats(spark, pages_dir, out_dir, ckpt)
    after = spark.read.parquet(out_dir).count()
    n_extra = text_stats_pipeline(extra).count()
    assert after == len(got) + n_extra


def test_windowed_host_throughput_batch_semantics(spark):
    rows = [
        ("https://a.x", "2022-05-01 00:00:10"),
        ("https://a.x", "2022-05-01 00:00:50"),
        ("https://a.x", "2022-05-01 00:01:10"),
        ("https://b.x", "2022-05-01 00:00:20"),
    ]
    df = spark.createDataFrame(rows, "host string, fetch_time string").withColumn(
        "fetch_time", F.to_timestamp("fetch_time")
    )
    out = {
        (str(r["window_start"]), r["host"]): r["fetches"]
        for r in windowed_host_throughput(df).collect()
    }
    assert out[("2022-05-01 00:00:00", "https://a.x")] == 2
    assert out[("2022-05-01 00:01:00", "https://a.x")] == 1
    assert out[("2022-05-01 00:00:00", "https://b.x")] == 1


# ---------------------------------------------------------------------------
# applyInPandasWithState operators (stateful.py)
# ---------------------------------------------------------------------------


def _drain(stream_df, root, name):
    """Run an availableNow pass into a parquet sink; return the sink."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", f"{root}/{name}-out")
        .option("checkpointLocation", f"{root}/{name}-ckpt")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
    return f"{root}/{name}-out"


def test_politeness_schedule_stream_matches_simulation(spark, tmp_path_factory):
    from webcrawler_spark.streaming.stateful import politeness_schedule_stream

    root = str(tmp_path_factory.mktemp("state"))
    cand_dir = f"{root}/cand"
    rows = [
        # host a: burst at t=0 with delay 2 → 0, 2, 4
        ("a", "u1", 0.0, 2.0),
        ("a", "u2", 0.0, 2.0),
        ("a", "u3", 0.0, 2.0),
        # host a: late arrival after the clock ran past it
        ("a", "u4", 3.0, 2.0),          # next_free=6 > 3 → attempt 6
        # host b: spaced wider than delay → attempts at arrival
        ("b", "v1", 0.0, 1.0),
        ("b", "v2", 5.0, 1.0),
    ]
    ddl = "host string, url string, arrival_ts double, delay double"
    spark.createDataFrame(rows, ddl).write.parquet(cand_dir)

    stream = spark.readStream.schema(ddl).parquet(cand_dir)
    out = _drain(politeness_schedule_stream(stream), root, "sched")
    got = {
        r["url"]: r["attempt_ts"] for r in spark.read.parquet(out).collect()
    }
    assert got == {"u1": 0.0, "u2": 2.0, "u3": 4.0, "u4": 6.0,
                   "v1": 0.0, "v2": 5.0}

    # cross-batch state: a second micro-batch continues the host clocks
    spark.createDataFrame(
        [("a", "u5", 0.0, 2.0), ("c", "w1", 1.0, 9.0)], ddl
    ).write.mode("append").parquet(cand_dir)
    stream = spark.readStream.schema(ddl).parquet(cand_dir)
    _drain(politeness_schedule_stream(stream), root, "sched")
    got2 = {
        r["url"]: r["attempt_ts"] for r in spark.read.parquet(out).collect()
    }
    assert got2["u5"] == 8.0            # host a's next_free (6+2) restored
    assert got2["w1"] == 1.0            # fresh host starts at arrival
    assert len(got2) == 8


def test_first_seen_filter_emits_once(spark, tmp_path_factory):
    from webcrawler_spark.streaming.stateful import first_seen_filter

    root = str(tmp_path_factory.mktemp("seen"))
    links_dir = f"{root}/links"
    ddl = "url string, host string, arrival_ts double"
    spark.createDataFrame(
        [
            ("https://a.x/1", "a.x", 5.0),
            ("https://a.x/1", "a.x", 2.0),   # earlier dup in same batch
            ("https://b.x/1", "b.x", 1.0),
        ],
        ddl,
    ).write.parquet(links_dir)

    stream = spark.readStream.schema(ddl).parquet(links_dir)
    out = _drain(first_seen_filter(stream), root, "seen")
    got = {
        r["url"]: r["arrival_ts"] for r in spark.read.parquet(out).collect()
    }
    assert got == {"https://a.x/1": 2.0, "https://b.x/1": 1.0}

    # a later micro-batch re-offering a seen url emits nothing for it
    spark.createDataFrame(
        [("https://a.x/1", "a.x", 9.0), ("https://c.x/1", "c.x", 3.0)], ddl
    ).write.mode("append").parquet(links_dir)
    stream = spark.readStream.schema(ddl).parquet(links_dir)
    _drain(first_seen_filter(stream), root, "seen")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3
    assert {r["url"] for r in rows} == {
        "https://a.x/1", "https://b.x/1", "https://c.x/1"
    }
