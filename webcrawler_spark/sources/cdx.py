"""CDXJ index sink + source — the third Common Crawl interchange
artifact beside the WARC/WET pair (sources/warc.py). Format per the
public CDXJ spec (IIPC / pywb docs; Common Crawl's cc-index ships
this layout): one line per capture,

    <surt key> <14-digit timestamp> <json block>

sorted-by-key files so a binary search / range scan finds all
captures of a URL prefix. The json block carries url, digest, mime,
status, length.

Spark-first shape mirrors the WARC sink exactly:

* sink — each partition SORTS its rows by (surt, ts) and streams them
  into rotating ``<prefix>-p{partition}-{seq}.cdx.gz`` files (one gzip
  member per line block — splittable), emitting one manifest row per
  file. Globally sorted output = ``repartitionByRange(surt)`` upstream
  + the partition-local sort here, the standard Spark total-order
  recipe: no driver sort, no single-task stage.
* source — binaryFile + mapInPandas line parser back to columns.

Digest note: Common Crawl uses sha1-base32; this sandbox uses md5 hex
so the DuckDB oracle can recompute every digest (DuckDB has no sha1).
The field carries its scheme prefix (``md5:``) like real CDX digests.
"""

from __future__ import annotations

import gzip
import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.functions.surt import surt_col
from webcrawler_spark.sources.warc import _MANIFEST_SCHEMA, _rotating_sink

LINES_PER_FILE = 3000

_READ_SCHEMA = (
    "surt string, ts string, url string, digest string, mime string,"
    " status int, length long, path string"
)


def cdx_lines(
    df: DataFrame,
    url: str = "url",
    payload: str = "payload",
    mime: str = "mime",
    status: str = "status",
    ts: str = "warc_ts",
) -> DataFrame:
    """(surt, ts, url, digest, mime, status, length) — the CDXJ fields
    as native columns: SURT key via functions/surt.py, 14-digit
    timestamp, md5 digest + byte length of the payload. Pure codegen
    projection; the sink below consumes exactly this shape."""
    return df.select(
        # the line format is space-delimited; real CDX keys arrive
        # percent-encoded from URL canonicalization, so a raw space in
        # a path must be encoded here or read_cdx's split corrupts the
        # record (round-trip pinned by test)
        F.regexp_replace(surt_col(F.col(url)), " ", "%20").alias("surt"),
        F.date_format(F.col(ts), "yyyyMMddHHmmss").alias("ts"),
        F.col(url).alias("url"),
        F.concat(F.lit("md5:"), F.md5(F.col(payload))).alias("digest"),
        F.col(mime).alias("mime"),
        F.col(status).cast("int").alias("status"),
        F.octet_length(F.col(payload)).cast("long").alias("length"),
    )


def write_cdx(
    entries: DataFrame,
    out_dir: str,
    prefix: str = "cdx",
    lines_per_file: int = LINES_PER_FILE,
    globally_sorted: bool = True,
) -> DataFrame:
    """Distributed CDXJ sink over ``cdx_lines``-shaped rows; returns
    the (lazy) per-file manifest. ``globally_sorted`` applies the
    total-order recipe (range repartition on the SURT key, then each
    partition sorts locally before writing) so file N's keys all
    precede file N+1's — the property CDX range scans rely on; at
    sandbox scale the range exchange is one tiny shuffle."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    if globally_sorted:
        entries = entries.repartitionByRange("surt", "ts").sortWithinPartitions(
            "surt", "ts"
        )

    def encode(row) -> bytes:
        block = json.dumps(
            {
                "url": row.url,
                "digest": row.digest,
                "mime": row.mime,
                "status": int(row.status),
                "length": int(row.length),
            },
            sort_keys=True,
            separators=(", ", ": "),
        )
        return f"{row.surt} {row.ts} {block}\n".encode("utf-8")

    sink = _rotating_sink(out_dir, prefix, ".cdx.gz", lines_per_file, encode)
    return entries.mapInPandas(sink, _MANIFEST_SCHEMA)


def read_cdx(spark: SparkSession, path: str) -> DataFrame:
    """Distributed CDXJ source: files scan in parallel, each task
    parses its own files' lines back to columns."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for line in gzip.decompress(bytes(content)).splitlines():
                    if not line.strip():
                        continue
                    surt, ts, block = line.decode("utf-8").split(" ", 2)
                    d = json.loads(block)
                    rows.append(
                        (
                            surt,
                            ts,
                            d.get("url"),
                            d.get("digest"),
                            d.get("mime"),
                            d.get("status"),
                            d.get("length"),
                            fpath,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "surt", "ts", "url", "digest", "mime", "status",
                    "length", "path",
                ],
            )

    return files.mapInPandas(parse, _READ_SCHEMA)
