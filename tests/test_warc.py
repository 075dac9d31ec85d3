"""WARC sink/source round-trip (S5 interchange; WarcFileSave parity)."""

from __future__ import annotations

import glob
import gzip
import hashlib
import os

from pyspark.sql import functions as F

from webcrawler_spark.sources.synthetic_web import build_pages
from webcrawler_spark.sources.warc import (
    read_warc,
    save_pages_warc,
    warc_input_for_crawl,
    write_warc,
)


def _inputs(spark):
    return warc_input_for_crawl(build_pages(spark)).repartition(2, "url")


def test_warc_roundtrip_payload_digests(spark, tmp_path):
    out = str(tmp_path / "warc")
    src = _inputs(spark)
    manifest = save_pages_warc(src, out, records_per_file=5)
    n_in = src.count()
    assert sum(m["n_records"] for m in manifest) == n_in

    back = read_warc(spark, out + "/*.warc.gz")
    assert back.count() == n_in
    want = {
        r["url"]: (
            hashlib.md5(bytes(r["payload"] or b"")).hexdigest(),
            r["status"],
            r["content_type"],
        )
        for r in src.collect()
    }
    got = {
        r["url"]: (
            hashlib.md5(bytes(r["payload"] or b"")).hexdigest(),
            r["status"],
            r["content_type"],
        )
        for r in back.collect()
    }
    assert got == want


def test_warc_rotation_and_gzip_members(spark, tmp_path):
    """Rotation every N records (WarcFileSave.py:9,39-41 analog) and one
    gzip member per record (seekable .warc.gz layout)."""
    out = str(tmp_path / "warc")
    manifest = save_pages_warc(_inputs(spark), out, records_per_file=5)
    assert all(m["n_records"] <= 5 for m in manifest)
    assert len(manifest) >= 2  # forced rotation
    for m in manifest:
        assert os.path.getsize(m["path"]) == m["n_bytes"]
        raw = gzip.decompress(open(m["path"], "rb").read())
        assert raw.count(b"WARC/1.1\r\n") == m["n_records"]
        assert raw.count(b"WARC-Type: response") == m["n_records"]


def test_warc_write_is_deterministic(spark, tmp_path):
    """Byte-identical re-runs: md5-derived record ids, mtime=0 gzip."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    save_pages_warc(_inputs(spark), a, records_per_file=5)
    save_pages_warc(_inputs(spark), b, records_per_file=5)
    fa = sorted(glob.glob(a + "/*.warc.gz"))
    fb = sorted(glob.glob(b + "/*.warc.gz"))
    assert [os.path.basename(p) for p in fa] == [os.path.basename(p) for p in fb]
    for pa, pb in zip(fa, fb):
        assert open(pa, "rb").read() == open(pb, "rb").read()


def test_warc_lazy_manifest_is_distributed(spark, tmp_path):
    """The sink is an executor-side operator: the manifest plan carries
    no collect/driver loop, and file names are partition-private."""
    out = str(tmp_path / "warc")
    man = write_warc(_inputs(spark), out, records_per_file=1000)
    rows = man.collect()
    pids = {os.path.basename(r["path"]).split("-")[1] for r in rows}
    assert len(pids) == 2  # one file set per partition, no global lock


def test_wet_roundtrip_and_mixed_archive_skip(spark, tmp_path_factory):
    from webcrawler_spark.sources.warc import (
        read_warc,
        read_wet,
        write_warc,
        write_wet,
    )

    root = str(tmp_path_factory.mktemp("wet"))
    docs = spark.createDataFrame(
        [
            ("https://a.example/1", "first extracted text"),
            ("https://b.example/2", "second text with unicode üß"),
            ("https://c.example/3", ""),
        ],
        "url string, text string",
    )
    manifest = write_wet(docs, f"{root}/wet", records_per_file=2).collect()
    assert sum(m["n_records"] for m in manifest) == 3
    back = {r["url"]: r["text"] for r in read_wet(spark, f"{root}/wet/*.warc.wet.gz").collect()}
    assert back == {r["url"]: r["text"] for r in docs.collect()}

    # response records in the same directory are skipped by read_wet,
    # and conversion records are invisible to the response parser's
    # record loop only via type filter (mixed-archive hygiene)
    pages = docs.selectExpr(
        "url", "200 as status", "'text/html' as content_type",
        "encode(text, 'utf-8') as payload")
    write_warc(pages, f"{root}/wet", prefix="resp", records_per_file=2).collect()
    assert read_wet(spark, f"{root}/wet/*.gz").count() == 3
    assert read_warc(spark, f"{root}/wet/resp-*.warc.gz").count() == 3


def test_wet_records_link_to_warc_records(spark, tmp_path_factory):
    """WARC-Refers-To of the conversion record equals the response
    record's WARC-Record-ID urn (the WARC/WET pairing contract)."""
    import gzip
    import glob

    from webcrawler_spark.sources.warc import write_warc, write_wet

    root = str(tmp_path_factory.mktemp("link"))
    docs = spark.createDataFrame(
        [("https://a.example/1", "text one")], "url string, text string"
    )
    write_wet(docs, f"{root}/out", records_per_file=10).collect()
    pages = docs.selectExpr(
        "url", "200 as status", "'text/html' as content_type",
        "encode(text, 'utf-8') as payload")
    write_warc(pages, f"{root}/out", records_per_file=10).collect()
    raw = b"".join(
        gzip.decompress(open(p, "rb").read())
        for p in sorted(glob.glob(f"{root}/out/*.gz"))
    ).decode()
    import re
    refers = re.search(r"WARC-Refers-To: <(urn:md5:[0-9a-f]+)>", raw).group(1)
    rid = re.search(r"WARC-Type: response.*?WARC-Record-ID: <(urn:md5:[0-9a-f]+)>", raw, re.S).group(1)
    assert refers == rid
