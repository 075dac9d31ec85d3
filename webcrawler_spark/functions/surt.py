"""SURT — Sort-friendly URI Reordering Transform (public spec:
Internet Archive / pywb / OpenWayback documentation; the key format
of Common Crawl's CDX index). ``com,example)/path?a=1&b=2`` sorts
hosts hierarchically, so a range scan over a sorted CDX index covers
an entire domain and all its subdomains — the at-scale lookup
structure for a crawled corpus (range partition by SURT and a
domain's records are one partition range, not a scatter).

The transform here is the standard canonical subset, implemented as
PURE native column expressions (whole-stage codegen, zero Python —
and every step is plain string algebra, so a DuckDB oracle replays
it bit-for-bit):

    1. lowercase; drop the http(s) scheme and any ``#fragment``
    2. drop a leading ``www.`` host label (pywb default canon)
    3. reverse host labels, join with ``,``; keep ``:port`` after
    4. append ``)`` + path (empty path → ``/``)
    5. sort query parameters byte-wise, re-join with ``&``

Divergences from the full IA canonicalizer (documented, deliberate:
they need table-driven rules, not string algebra): no session-id
param stripping, no %-escape re-normalization (urltools.normalize_url
already covers that upstream — compose ``surt_col(normalize_url)``
for full canon).

No reference analog (the reference keeps plain URL strings,
Host.py:13); this is the web-archive-interchange completion of the
WARC/WET pair in sources/warc.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def surt_col(url: Column) -> Column:
    """Native SURT key for a URL column (see module doc for rules)."""
    u = F.regexp_replace(F.lower(url), r"^https?://", "")
    u = F.regexp_replace(u, r"#.*$", "")
    hostport = F.regexp_extract(u, r"^([^/?]*)", 1)
    rest = F.substring(u, F.length(hostport) + F.lit(1), F.lit(2147483647))
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_replace(rest, r"^[^?]*\??", "")
    port = F.regexp_extract(hostport, r"(:\d+)$", 1)
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    qsorted = F.array_join(F.array_sort(F.split(query, "&")), "&")
    return F.concat(
        rev,
        port,
        F.lit(")"),
        path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )
