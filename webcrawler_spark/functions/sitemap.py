"""Sitemap XML parsing (sitemaps.org protocol, public spec).

The reference crawler discovers URLs only by parsing anchor tags out of
fetched HTML (Parser.py:56-66); it never reads ``/sitemap.xml``. Real
crawl pipelines treat sitemaps as a second frontier source — hosts
advertise them in robots.txt (``Sitemap:`` lines, which
functions/robots.py already tolerates) and they enumerate up to 50k
URLs per file with optional freshness hints. This module adds that
source: a native-regexp extraction of ``<url>``/``<sitemap>`` blocks
into (pos, loc, lastmod) rows, composing with ``normalize_url`` and the
seen-filter anti-join exactly like HTML-extracted links do.

Scale notes (100 TB): pure whole-stage-codegen projection + one
``posexplode`` — zero shuffles, zero Python. One sitemap file is one
row (<= 50 MB by spec, typically ~10 MB for 50k URLs), so a corpus of
millions of sitemaps parallelizes by row like any other scan; there is
no skew story because the explode fan-out is bounded by the spec's 50k
cap. The regexp subset used ((?s), lazy ``.*?``, ``[^<]``) is shared by
Java regex and RE2, so the DuckDB oracle evaluates the same patterns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK_PAT = {"url": r"(?s)<url>(.*?)</url>", "sitemap": r"(?s)<sitemap>(.*?)</sitemap>"}
_LOC_PAT = r"<loc>\s*([^<]+?)\s*</loc>"
_LASTMOD_PAT = r"<lastmod>\s*([^<]+?)\s*</lastmod>"
# robots.txt discovery (sitemaps.org "Informing search engine crawlers"
# + RFC 9309 §2.3's tolerance for unrecognized lines): `Sitemap:` is a
# line-level directive, case-insensitive key, value runs to end of
# line, outside any User-agent group. (?im) + [^\s#] are shared by
# Java regex and RE2 so the DuckDB oracle evaluates the same pattern;
# a trailing `#comment` is cut because the value itself never holds
# whitespace or `#` (it is a URL).
_ROBOTS_SITEMAP_PAT = r"(?im)^[ \t]*sitemap[ \t]*:[ \t]*([^\s#]+)"


def extract_sitemap_urls(
    df: DataFrame,
    xml_col: str = "xml",
    id_col: str = "sitemap_id",
    block: str = "url",
) -> DataFrame:
    """Parse sitemap (``block='url'``) or sitemap-index
    (``block='sitemap'``) XML into one row per entry.

    Output: (id_col, pos, loc, lastmod) — ``pos`` is the 0-based entry
    position within the file (document order, the crawl-priority hint
    some sites encode), ``loc`` is the whitespace-trimmed URL text,
    ``lastmod`` is the raw string hint or NULL when the entry has none.
    Entries without a ``<loc>`` are dropped (spec: loc is required).

    Deliberately regexp-based, not an XML DOM: sitemaps in the wild are
    full of undeclared entities and truncated tails, and the fields the
    crawler needs are flat scalar tags; this matches the tolerant
    posture of the HTML link extractor (htmltools.py).
    """
    blocks = F.regexp_extract_all(
        F.col(xml_col), F.lit(_BLOCK_PAT[block]), F.lit(1)
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(blocks).alias("pos", "_block")
    )
    loc = F.regexp_extract(F.col("_block"), _LOC_PAT, 1)
    lastmod = F.regexp_extract(F.col("_block"), _LASTMOD_PAT, 1)
    return (
        exploded.select(
            F.col(id_col),
            F.col("pos").cast("long").alias("pos"),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
        )
        .filter(F.col("loc") != "")
    )


def extract_robots_sitemaps(
    df: DataFrame,
    robots_col: str = "robots_body",
    id_col: str = "host",
) -> DataFrame:
    """``Sitemap:`` directive extraction from robots.txt bodies —
    the discovery half of the sitemaps.org protocol (the XML half is
    :func:`extract_sitemap_urls`).

    Output: (id_col, pos, sitemap_url) — ``pos`` is the 0-based
    directive position within the file (document order), ``sitemap_url``
    the raw advertised value (callers normalize it like any discovered
    URL, P1). Multiple directives per file are the common case (one per
    index/section); hosts advertising none produce no rows.

    Scale notes: pure codegen regexp + bounded ``posexplode`` (robots
    files are ~KB); zero shuffles, zero Python. The pattern is
    Java∩RE2-portable so the DuckDB oracle runs it verbatim.
    """
    urls = F.regexp_extract_all(
        F.col(robots_col), F.lit(_ROBOTS_SITEMAP_PAT), F.lit(1)
    )
    return df.select(
        F.col(id_col), F.posexplode(urls).alias("pos", "sitemap_url")
    ).select(
        F.col(id_col),
        F.col("pos").cast("long").alias("pos"),
        F.col("sitemap_url"),
    )
