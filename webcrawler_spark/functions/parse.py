"""Fused parse UDF: decode + text + title + links in ONE pass per page.

The reference decodes and tree-parses each page once and then walks the
same tree for text and links (Worker.py:267-269, Parser.py:8-24,57-72).
Keeping that fusion matters at scale: ``html`` is by far the widest
column, and shipping it through Arrow once (instead of once per scalar
UDF) halves the Python-worker bytes on the hot path.

Output struct per page::

    text    string         -- P6+P9, the byte-identical invariant
    title   string         -- P11
    first20 string         -- P10 (debug record field)
    links   array<string>  -- P7+P8: formatted, deduped, sorted absolute URLs
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    StringType,
    StructField,
    StructType,
)

from webcrawler_spark.functions.htmltools import (
    _parse,
    decode_html_bytes,
    first_n_words,
)
from webcrawler_spark.functions.urltools import format_link

PARSED_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField("title", StringType()),
        StructField("first20", StringType()),
        StructField("links", ArrayType(StringType())),
    ]
)

_INVISIBLE = frozenset(["style", "script", "head", "title", "meta", "[document]"])


def parse_page(html: bytes, host: str) -> tuple:
    """One decode + one parser pass → (text, title, first20, links)."""
    decoded = decode_html_bytes(html)
    p = _parse(decoded)
    text = " ".join(t.strip() for parent, t in p.texts if parent not in _INVISIBLE)
    raw = set()
    for href in p.hrefs:
        if href is None:
            continue
        toks = href.split()
        if toks:
            raw.add(toks[0])  # first whitespace token (Parser.py:22)
    links = sorted({f for r in raw if (f := format_link(r, host))})
    return text, p.title, first_n_words(text, 20), links


@pandas_udf(PARSED_SCHEMA)
def parse_page_udf(html: pd.Series, hosts: pd.Series) -> pd.DataFrame:
    rows = [parse_page(b, h) for b, h in zip(html, hosts)]
    return pd.DataFrame(rows, columns=["text", "title", "first20", "links"])
