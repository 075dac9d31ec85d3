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


def test_lsh_collision_stream_matches_batch_law(spark, tmp_path_factory):
    """Streaming bucket ownership ≡ the batch law: owner(bucket) =
    first (arrival, id) claimant globally; a doc is a near-dup
    candidate iff any of its buckets is owned by another doc — and a
    second micro-batch keeps colliding against batch-1 owners."""
    from webcrawler_spark.operators.dedup import minhash_signatures
    from webcrawler_spark.streaming.stateful import lsh_collision_stream

    root = str(tmp_path_factory.mktemp("lshc"))
    docs1 = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
            (2, "completely different text about spark shuffles"),
        ],
        "doc_id long, text string",
    )
    sig_ddl = "band_id string, band_min string, doc_id long, arrival_ts double"
    sig1 = minhash_signatures(docs1).withColumn(
        "arrival_ts", F.col("doc_id").cast("double")
    )
    sig_dir = f"{root}/sig"
    sig1.coalesce(1).write.parquet(sig_dir)

    out = _drain(
        lsh_collision_stream(spark.readStream.schema(sig_ddl).parquet(sig_dir)),
        root,
        "lsh",
    )
    col1 = spark.read.parquet(out).collect()
    dups1 = {r["doc_id"] for r in col1}
    assert dups1 == {1}                       # doc1 collides with doc0
    assert {r["owner_id"] for r in col1} == {0}
    # batch-law cross-check: owner = min doc per bucket
    sig_pd = sig1.toPandas()
    owners = sig_pd.groupby(["band_id", "band_min"])["doc_id"].min()
    want = {
        int(r.doc_id)
        for r in sig_pd.itertuples()
        if owners[(r.band_id, r.band_min)] < r.doc_id
    }
    assert dups1 == want

    # batch 2: a copy of doc0's text arrives later -> collides against
    # the STATE owner from batch 1; a fresh text does not
    docs2 = spark.createDataFrame(
        [
            (7, "the quick brown fox jumps over the lazy dog"),
            (8, "unrelated fresh content nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    minhash_signatures(docs2).withColumn(
        "arrival_ts", F.col("doc_id").cast("double")
    ).coalesce(1).write.mode("append").parquet(sig_dir)
    _drain(
        lsh_collision_stream(spark.readStream.schema(sig_ddl).parquet(sig_dir)),
        root,
        "lsh",
    )
    rows = spark.read.parquet(out).collect()
    assert {r["doc_id"] for r in rows} == {1, 7}
    assert all(r["owner_id"] == 0 for r in rows if r["doc_id"] == 7)


def test_windowed_hdr_histogram_cross_batch_merge_law(spark, tmp_path_factory):
    """Two-file drain at maxFilesPerTrigger=1 (two micro-batches) must
    equal the batch histogram: the per-(window, key, bucket) state is
    a SUM monoid, so micro-batch order cannot matter."""
    from webcrawler_spark.operators.sketches import hdr_histogram
    from webcrawler_spark.streaming.incremental import windowed_hdr_histogram

    root = str(tmp_path_factory.mktemp("shdr"))
    rows = [
        (f"2024-01-01 0{h}:{m:02d}:00", "t%d" % (m % 2), (h * 37 + m * m) % 5000)
        for h in range(3)
        for m in range(40)
    ]
    df = spark.createDataFrame(rows, "ts_s string, k string, v long").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "k", "v"
    )
    df.where("v % 2 = 0").coalesce(1).write.parquet(f"{root}/src")
    df.where("v % 2 = 1").coalesce(1).write.mode("append").parquet(f"{root}/src")

    q = (
        windowed_hdr_histogram(
            spark.readStream.schema("ts timestamp, k string, v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{root}/src"),
            "v",
            key="k",
        )
        .writeStream.format("memory")
        .queryName("hdr_merge_law")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert q.lastProgress is not None

    got = sorted(map(tuple, spark.table("hdr_merge_law").collect()))
    want = sorted(
        map(
            tuple,
            hdr_histogram(
                df.withColumn(
                    "window_start", F.date_trunc("hour", F.col("ts"))
                ),
                "v",
                key=["window_start", "k"],
            ).collect(),
        )
    )
    assert got == want and len(got) > 10
