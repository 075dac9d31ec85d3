"""SURT canonical keys and the CDXJ sink/source: golden transforms,
round-trip integrity, and the global-sort property CDX range scans
rely on."""

import gzip
import os

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.functions.surt import surt_col
from webcrawler_spark.sources.cdx import cdx_lines, read_cdx, write_cdx


SURT_GOLDENS = [
    # (url, expected surt) — spec examples plus edge cases
    ("http://example.com/", "com,example)/"),
    ("https://Example.COM/Path", "com,example)/path"),
    ("http://www.example.com/a", "com,example)/a"),
    ("https://sub.www2.example.org/x?b=2&a=1", "org,example,www2,sub)/x?a=1&b=2"),
    ("http://example.com:8080/p?z=1", "com,example:8080)/p?z=1"),
    ("http://example.com", "com,example)/"),
    ("https://example.com/p#frag", "com,example)/p"),
    ("http://example.com/p?single=1", "com,example)/p?single=1"),
    # www is stripped only as a leading label
    ("http://notwww.example.com/", "com,example,notwww)/"),
]


def test_surt_goldens(spark):
    df = spark.createDataFrame([(u,) for u, _ in SURT_GOLDENS], "url string")
    got = [r["s"] for r in df.select(surt_col(F.col("url")).alias("s")).collect()]
    for (url, want), g in zip(SURT_GOLDENS, got):
        assert g == want, f"{url}: {g!r} != {want!r}"


def test_surt_is_native(spark):
    # zero Python: the projection must be pure codegen (no
    # Arrow/Python eval nodes in the plan)
    df = spark.range(10).select(
        F.concat(F.lit("https://h"), F.col("id"), F.lit(".com/p")).alias("url")
    )
    plan = (
        df.select(surt_col(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


@pytest.fixture(scope="module")
def captures(spark):
    return spark.range(250).select(
        F.concat(
            F.lit("https://h"),
            (F.col("id") % 20).cast("string"),
            F.lit(".example/doc/"),
            F.col("id").cast("string"),
        ).alias("url"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias(
            "payload"
        ),
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        (
            F.to_timestamp(F.lit("2021-06-01 00:00:00"))
            + F.make_interval(secs=F.col("id"))
        ).alias("warc_ts"),
    )


def test_cdx_roundtrip(spark, captures, tmp_path):
    out = str(tmp_path / "cdx")
    manifest = write_cdx(cdx_lines(captures), out, lines_per_file=60).collect()
    assert sum(m["n_records"] for m in manifest) == 250
    back = read_cdx(spark, out + "/*.cdx.gz")
    assert back.count() == 250
    # digest/length integrity: recompute from the source rows
    want = {
        r["url"]: (r["digest"], r["length"], r["ts"])
        for r in cdx_lines(captures).collect()
    }
    for r in back.collect():
        d, ln, ts = want[r["url"]]
        assert r["digest"] == d and r["length"] == ln and r["ts"] == ts
        assert r["digest"].startswith("md5:")
        assert r["ts"].startswith("202106")


def test_cdx_files_globally_sorted(spark, captures, tmp_path):
    out = str(tmp_path / "cdxsorted")
    write_cdx(cdx_lines(captures), out, lines_per_file=40).collect()
    files = sorted(os.listdir(out))
    per_file_keys = []
    for fn in files:
        with open(os.path.join(out, fn), "rb") as f:
            lines = gzip.decompress(f.read()).decode().splitlines()
        keys = [tuple(ln.split(" ", 2)[:2]) for ln in lines if ln.strip()]
        # sorted within the file
        assert keys == sorted(keys), fn
        per_file_keys.append((fn, keys))
    # sorted ACROSS files in partition order (range repartition):
    # group files by partition id (the pNNNNN segment); partitions are
    # range-ordered and files within a partition are seq-ordered
    by_part = {}
    for fn, keys in per_file_keys:
        pid = fn.split("-p")[1].split("-")[0]
        by_part.setdefault(pid, []).extend(keys)
    flat = [k for pid in sorted(by_part) for k in by_part[pid]]
    assert flat == sorted(flat)


def test_cdx_unsorted_mode(spark, captures, tmp_path):
    out = str(tmp_path / "cdxraw")
    write_cdx(
        cdx_lines(captures), out, lines_per_file=40, globally_sorted=False
    ).collect()
    assert read_cdx(spark, out + "/*.cdx.gz").count() == 250


def test_cdx_space_in_path_roundtrips(spark, tmp_path):
    media = spark.createDataFrame(
        [("https://a.com/x y/z", bytearray(b"payload"))],
        "url string, payload binary",
    ).select(
        "url",
        "payload",
        F.lit("text/html").alias("mime"),
        F.lit(200).alias("status"),
        F.to_timestamp(F.lit("2021-01-01 00:00:00")).alias("warc_ts"),
    )
    out = str(tmp_path / "cdxspace")
    write_cdx(cdx_lines(media), out).collect()
    back = read_cdx(spark, out + "/*.cdx.gz").collect()
    assert len(back) == 1
    assert back[0]["surt"] == "com,a)/x%20y/z"  # key field space-free
    assert back[0]["url"] == "https://a.com/x y/z"  # url survives in json
    assert back[0]["length"] == 7
