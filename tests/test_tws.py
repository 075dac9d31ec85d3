"""transformWithStateInPandas twins (streaming/tws.py): the Spark 4
processor API must reproduce the applyInPandasWithState operators
row-for-row, including cross-micro-batch state restore.

Skips when protobuf is absent: transformWithStateInPandas launches a
separate streaming Python driver worker that speaks protobuf to the
JVM state server (StreamingPythonRunner), and this sandbox ships
pyspark without the protobuf package. The operator code itself is
pure DataFrame/processor API; on any normal Spark 4 install
(pip install pyspark[connect] or protobuf present) these tests run.
"""

from __future__ import annotations

import pytest

def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs protobuf (absent in this sandbox)",
)


def _drain(stream_df, root, name):
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


def test_politeness_tws_matches_applyinpandas(spark, tmp_path_factory):
    from webcrawler_spark.streaming.tws import politeness_schedule_tws

    root = str(tmp_path_factory.mktemp("tws"))
    cand_dir = f"{root}/cand"
    ddl = "host string, url string, arrival_ts double, delay double"
    rows = [
        ("a", "u1", 0.0, 2.0),
        ("a", "u2", 0.0, 2.0),
        ("a", "u3", 0.0, 2.0),
        ("a", "u4", 3.0, 2.0),
        ("b", "v1", 0.0, 1.0),
        ("b", "v2", 5.0, 1.0),
    ]
    spark.createDataFrame(rows, ddl).write.parquet(cand_dir)
    stream = spark.readStream.schema(ddl).parquet(cand_dir)
    out = _drain(politeness_schedule_tws(stream), root, "sched")
    got = {r["url"]: r["attempt_ts"] for r in spark.read.parquet(out).collect()}
    # identical to test_streaming's applyInPandasWithState expectations
    assert got == {"u1": 0.0, "u2": 2.0, "u3": 4.0, "u4": 6.0,
                   "v1": 0.0, "v2": 5.0}

    # cross-batch: the named ValueState restores per-host clocks
    spark.createDataFrame(
        [("a", "u5", 0.0, 2.0), ("c", "w1", 1.0, 9.0)], ddl
    ).write.mode("append").parquet(cand_dir)
    stream = spark.readStream.schema(ddl).parquet(cand_dir)
    _drain(politeness_schedule_tws(stream), root, "sched")
    got2 = {r["url"]: r["attempt_ts"] for r in spark.read.parquet(out).collect()}
    assert got2["u5"] == 8.0
    assert got2["w1"] == 1.0
    assert len(got2) == 8


def test_first_seen_tws_emits_once(spark, tmp_path_factory):
    from webcrawler_spark.streaming.tws import first_seen_tws

    root = str(tmp_path_factory.mktemp("tws-seen"))
    links_dir = f"{root}/links"
    ddl = "url string, host string, arrival_ts double"
    spark.createDataFrame(
        [
            ("https://a.x/1", "a.x", 5.0),
            ("https://a.x/1", "a.x", 2.0),
            ("https://b.x/1", "b.x", 1.0),
        ],
        ddl,
    ).write.parquet(links_dir)
    stream = spark.readStream.schema(ddl).parquet(links_dir)
    out = _drain(first_seen_tws(stream), root, "seen")
    got = {r["url"]: r["arrival_ts"] for r in spark.read.parquet(out).collect()}
    assert got == {"https://a.x/1": 2.0, "https://b.x/1": 1.0}

    spark.createDataFrame(
        [("https://a.x/1", "a.x", 9.0), ("https://c.x/1", "c.x", 3.0)], ddl
    ).write.mode("append").parquet(links_dir)
    stream = spark.readStream.schema(ddl).parquet(links_dir)
    _drain(first_seen_tws(stream), root, "seen")
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3
    assert {r["url"] for r in rows} == {
        "https://a.x/1", "https://b.x/1", "https://c.x/1"
    }
