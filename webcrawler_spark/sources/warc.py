"""WARC/1.1 sink + source (S5 interchange format; SURVEY.md §2.1).

The reference stores fetched pages as gzip WARC response records,
1,000 per file (WarcFileSave.py:20-54; rotation WarcFileSave.py:9,
39-41, via warcio). ``warcio`` is not available here, but the record
format is publicly specified (ISO 28500 / WARC 1.1), so this module
writes it directly: one gzip member per record (the standard .warc.gz
layout, which is what makes the format seekable/splittable), HTTP
response payload inside, rotation every ``records_per_file`` records.

Spark-first shape:

* sink — ``mapInPandas`` over (url, status, content_type, payload,
  fetch_ts): each task streams its partition into rotating
  ``<prefix>-p{partition}-{seq}.warc.gz`` files and emits ONE manifest
  row per file written (path, n_records, n_bytes). No driver
  bottleneck, no lock (the reference needed a global file lock —
  partition-private files need none), and the manifest is the unit a
  snapshot catalog commits.
* source — ``binaryFile`` read + ``mapInPandas`` parse back to rows,
  so a WARC corpus is a first-class input table (url, status,
  content_type, payload, warc_date).

Determinism: WARC-Record-ID is derived from md5(url) rather than a
random UUID so re-runs write byte-identical files (uuid4 would break
the snapshot-diff tests; the spec only requires uniqueness).
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORDS_PER_FILE = 1000  # WarcFileSave.py:9 MAX_RESULTS_PER_WARC_FILE

_MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"


def _warc_date(epoch: float | None) -> str:
    if epoch is None or epoch != epoch:  # None or pandas NaN
        epoch = 0.0
    return datetime.fromtimestamp(float(epoch), tz=timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )


def _record_bytes(
    url: str, status: int, content_type: str, payload: bytes, ts: float | None
) -> bytes:
    """One WARC/1.1 response record (uncompressed) with an HTTP/1.0
    payload, mirroring the reference's StatusAndHeaders(protocol=
    'HTTP/1.0') + create_warc_record(..., 'response') fields."""
    http = (
        f"HTTP/1.0 {status}\r\n"
        f"Content-Type: {content_type or 'application/octet-stream'}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("ascii") + payload
    rid = hashlib.md5((url or "").encode("utf-8")).hexdigest()
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + http + b"\r\n\r\n"


def _rotating_sink(out_dir: str, prefix: str, suffix: str,
                   records_per_file: int, encode):
    """Shared partition-local rotating gzip sink (one gzip member per
    record, a new file every ``records_per_file`` records per
    partition — WarcFileSave.py:39-41 semantics without the global
    lock). ``encode``: row namedtuple → record bytes."""

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        seq, n_in_file = 0, 0
        buf: io.BytesIO | None = None
        out: list[tuple[str, int, int]] = []

        def path() -> str:
            return os.path.join(
                out_dir, f"{prefix}-p{pid:05d}-{seq:04d}{suffix}"
            )

        def flush() -> None:
            nonlocal buf, n_in_file, seq
            if buf is None or n_in_file == 0:
                return
            data = buf.getvalue()
            with open(path(), "wb") as f:
                f.write(data)
            out.append((path(), n_in_file, len(data)))
            seq += 1
            n_in_file = 0
            buf = None

        for pdf in batches:
            for row in pdf.itertuples(index=False):
                rec = encode(row)
                if buf is None:
                    buf = io.BytesIO()
                # one gzip member per record: standard .warc.gz layout
                buf.write(gzip.compress(rec, mtime=0))
                n_in_file += 1
                if n_in_file >= records_per_file:
                    flush()
        flush()
        yield pd.DataFrame(out, columns=["path", "n_records", "n_bytes"])

    return sink


def write_warc(
    df: DataFrame,
    out_dir: str,
    prefix: str = "results",
    records_per_file: int = RECORDS_PER_FILE,
) -> DataFrame:
    """Distributed WARC sink; returns the (lazy) per-file manifest.

    ``df`` columns: url string, status int, content_type string,
    payload binary, fetch_ts double (nullable).
    """
    os.makedirs(out_dir, exist_ok=True)

    def encode(row) -> bytes:
        return _record_bytes(
            row.url,
            int(row.status),
            row.content_type,
            bytes(row.payload) if row.payload is not None else b"",
            getattr(row, "fetch_ts", None),
        )

    cols = ["url", "status", "content_type", "payload"]
    if "fetch_ts" in df.columns:
        cols.append("fetch_ts")
    sink = _rotating_sink(out_dir, prefix, ".warc.gz", records_per_file, encode)
    return df.select(*cols).mapInPandas(sink, _MANIFEST_SCHEMA)


def _wet_record_bytes(url: str, text: bytes, ts: float | None) -> bytes:
    """One WARC/1.1 ``conversion`` record (the WET layout Common Crawl
    ships extracted text in): plain-text payload, no HTTP envelope,
    WARC-Refers-To naming the response record the text came from
    (same urn scheme as _record_bytes, so WARC+WET pairs link up)."""
    rid = hashlib.md5((url or "").encode("utf-8")).hexdigest()
    head = (
        "WARC/1.1\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Record-ID: <urn:md5:wet:{rid}>\r\n"
        f"WARC-Refers-To: <urn:md5:{rid}>\r\n"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(text)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + text + b"\r\n\r\n"


def write_wet(
    df: DataFrame,
    out_dir: str,
    prefix: str = "wet",
    records_per_file: int = RECORDS_PER_FILE,
) -> DataFrame:
    """Distributed WET sink (extracted-text conversion records);
    returns the (lazy) per-file manifest. ``df`` columns: url string,
    text string, fetch_ts double (nullable)."""
    os.makedirs(out_dir, exist_ok=True)

    def encode(row) -> bytes:
        return _wet_record_bytes(
            row.url,
            (row.text or "").encode("utf-8"),
            getattr(row, "fetch_ts", None),
        )

    cols = ["url", "text"]
    if "fetch_ts" in df.columns:
        cols.append("fetch_ts")
    sink = _rotating_sink(
        out_dir, prefix, ".warc.wet.gz", records_per_file, encode
    )
    return df.select(*cols).mapInPandas(sink, _MANIFEST_SCHEMA)


def save_pages_warc(
    df: DataFrame,
    out_dir: str,
    prefix: str = "results",
    records_per_file: int = RECORDS_PER_FILE,
) -> list:
    """Eager sink: run the write, return the collected manifest rows."""
    return write_warc(df, out_dir, prefix, records_per_file).collect()


# ---------------------------------------------------------------------------
# source
# ---------------------------------------------------------------------------

_READ_SCHEMA = (
    "url string, status int, content_type string, payload binary,"
    " warc_date string, path string"
)


def _parse_warc_stream(data: bytes):
    """Yield (headers, payload) per record from multi-member gzip."""
    raw = gzip.decompress(data)  # handles concatenated members
    pos = 0
    while pos < len(raw):
        hdr_end = raw.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            break
        head = raw[pos:hdr_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        fields = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        clen = int(fields.get("content-length", "0"))
        body = raw[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # skip record + trailing \r\n\r\n
        yield fields, body


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC source: files scan in parallel; each task
    parses its own files (binaryFile + mapInPandas)."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for fields, http in _parse_warc_stream(bytes(content)):
                    line_end = http.find(b"\r\n")
                    status = int(http[:line_end].split(b" ")[1])
                    hend = http.find(b"\r\n\r\n")
                    ctype = None
                    for ln in http[line_end + 2 : hend].split(b"\r\n"):
                        k, _, v = ln.partition(b":")
                        if k.strip().lower() == b"content-type":
                            ctype = v.strip().decode("ascii", "replace")
                    rows.append(
                        (
                            fields.get("warc-target-uri"),
                            status,
                            ctype,
                            http[hend + 4 :],
                            fields.get("warc-date"),
                            fpath,
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "status", "content_type", "payload", "warc_date", "path",
                ],
            )

    return files.mapInPandas(parse, _READ_SCHEMA)


def warc_input_for_crawl(pages: DataFrame) -> DataFrame:
    """Adapter: the engine's pages-table shape → WARC sink columns."""
    return pages.select(
        "url",
        "status",
        "content_type",
        F.col("html").alias("payload"),
        F.lit(None).cast("double").alias("fetch_ts"),
    )


_WET_READ_SCHEMA = "url string, text string, warc_date string, path string"


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WET source: conversion records back to (url, text);
    non-conversion records in mixed archives are skipped."""
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for fields, body in _parse_warc_stream(bytes(content)):
                    if fields.get("warc-type") != "conversion":
                        continue
                    rows.append(
                        (
                            fields.get("warc-target-uri"),
                            body.decode("utf-8", "replace"),
                            fields.get("warc-date"),
                            fpath,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["url", "text", "warc_date", "path"]
            )

    return files.mapInPandas(parse, _WET_READ_SCHEMA)
