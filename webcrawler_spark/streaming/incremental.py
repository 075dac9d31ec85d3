"""Incremental corpus processing with Structured Streaming.

The crawl itself is batch-iterative by design (SURVEY.md §2.8: the
reference's "stream" is a terminating work queue, which maps to the
driver round loop, not a continuous query). Structured Streaming still
earns its keep downstream of the crawl, where new page snapshots arrive
continuously and derived tables must stay fresh:

* :func:`incremental_text_stats` — pages parquet dir as a file stream →
  per-microbatch text extraction + quality stats, exactly-once via
  checkpointed file-source offsets. ``Trigger.AvailableNow`` drains the
  backlog and stops, which is also how the tests drive it.
* :func:`windowed_host_throughput` — event-time tumbling windows with a
  watermark over the fetch log (late fetch records beyond the watermark
  are dropped, matching the metrics-table semantics).

Both run identical logic in plain batch mode when given a static
DataFrame — the transformations are pure column pipelines, so batch
parity tests pin the streaming results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.functions.htmltools import extract_text_udf
from webcrawler_spark.operators.textstats import quality_score, token_count

PAGES_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string,"
    " status int, content_type string"
)


def pages_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a pages parquet directory (new snapshot
    files = new micro-batch input; offsets checkpointed by the sink)."""
    return spark.readStream.schema(PAGES_DDL).parquet(path)


def text_stats_pipeline(pages: DataFrame) -> DataFrame:
    """The per-page derivation (stream- and batch-applicable alike)."""
    return (
        pages.filter(F.col("status").between(200, 299))
        .filter(F.col("content_type").contains("text/html"))
        .select(
            "url",
            "warc_ts",
            extract_text_udf(F.col("html")).alias("text"),
        )
        .withColumn("n_tokens", token_count(F.col("text")))
        .withColumn("quality", quality_score(F.col("text")))
    )


def incremental_text_stats(
    spark: SparkSession, pages_path: str, out_path: str, checkpoint_path: str
) -> None:
    """Drain all pending page files into a stats table, exactly once.

    AvailableNow processes the current backlog in bounded micro-batches
    and terminates — the idiomatic "incremental batch" trigger.
    """
    q = (
        text_stats_pipeline(pages_stream(spark, pages_path))
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_host_throughput(
    fetch_log: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window fetches-per-host over event time with late-data
    watermarking. fetch_log: (host string, fetch_time timestamp)."""
    return (
        fetch_log.withWatermark("fetch_time", watermark)
        .groupBy(F.window("fetch_time", window).alias("w"), "host")
        .agg(F.count("*").alias("fetches"))
        .select(
            F.col("w.start").alias("window_start"),
            "host",
            "fetches",
        )
    )


def windowed_hdr_histogram(
    events: DataFrame,
    value_col: str,
    time_col: str = "ts",
    window: str = "1 hour",
    key: str | list[str] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window HDR histogram over a stream — continuous
    percentiles (the latency-dashboard pattern) with state bounded by
    the bucket space instead of the event count.

    The sketch is a SUM monoid (operators/sketches.py), so it composes
    directly with streaming aggregation: per (window, key, bucket) the
    state is ONE long, micro-batches merge by addition, and late rows
    (within the watermark, when one is set) fold into the same cell —
    no per-event retention, no sorted buffer. ~1 Ki buckets per group
    vs the unbounded event list an exact percentile would hold: that
    is the difference between a dashboard that survives 10^9
    events/hour and one that OOMs the state store.

    With ``watermark`` set, pair with append/update sinks (state
    evicts once the watermark passes the window). Without one, use
    complete mode over a bounded drain (the AvailableNow pattern).
    Quantile reads are batch-side: ``hdr_quantiles(result,
    key=["window_start", *key])`` on the sink table.
    """
    from webcrawler_spark.operators.sketches import _hdr_keys, hdr_bucket

    if watermark is not None:
        events = events.withWatermark(time_col, watermark)
    keys = _hdr_keys(key)
    return (
        events.groupBy(
            F.window(time_col, window).alias("w"),
            *keys,
            hdr_bucket(F.col(value_col)).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), *keys, "bucket", "cnt")
    )
