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
