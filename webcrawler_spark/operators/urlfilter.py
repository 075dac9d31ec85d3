"""URL-level filtering (RefinedWeb §2.1 / Penedo et al. 2023; the
UT1-blocklist pattern used by most public web-corpus pipelines).

Two public rules, both evaluated BEFORE fetching (they gate the
frontier, saving the bandwidth the reference spends fetching then
discarding — the reference has only the extension blocklist,
Parser.py:18-24 / SURVEY F1):

1. **domain blocklist** (hard): the URL's host is a listed domain or
   any subdomain of one. Suffix matching at scale is done by exploding
   each host into its ancestor-domain chain (``a.b.example.com`` →
   ``a.b.example.com``, ``b.example.com``, ``example.com`` — bounded by
   the label count, ~5 rows/url) and equi-joining the blocklist, so a
   multi-million-row UT1-style list needs no LIKE scan and no cross
   join. The join side is broadcast when small, shuffle-hash otherwise.
2. **weighted word score** (soft): Σ weight(w) over lexicon words
   contained in the lowercased URL; the URL is dropped when the sum
   reaches ``threshold``. The lexicon is a fixed small dict, so the
   score is ONE whole-stage-codegen expression — zero joins, zero
   Python.

100 TB notes: rule 2 is a pure projection; rule 1 is one bounded
explode + one equi-join + one distinct on the url id — all key-local,
no skew (the ancestor chain fans out ≤ label-count rows and the
blocklist join is semi-join shaped).
"""

from __future__ import annotations

import functools
import operator as _op
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from webcrawler_spark.functions.urltools import host_col


def ancestor_domains(host: Column) -> Column:
    """Array of the host's ancestor domains, most-specific first,
    stopping at 2 labels (never the bare TLD); a single-label host
    yields itself. ``a.b.example.com`` → [a.b.example.com,
    b.example.com, example.com]."""
    labels = F.split(host, r"\.")
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(labels) - 2, F.lit(0))),
        lambda i: F.array_join(F.slice(labels, i + 1, F.size(labels)), "."),
    )


def word_score_col(url: Column, word_weights: Mapping[str, float]) -> Column:
    """Σ weight(w) for lexicon words contained in the lowercased URL —
    a single codegen expression (insertion-order sum, so the float op
    order is pinned and oracle-replayable)."""
    low = F.lower(url)
    terms = [
        F.when(low.contains(w.lower()), F.lit(float(wt))).otherwise(F.lit(0.0))
        for w, wt in word_weights.items()
    ]
    return functools.reduce(_op.add, terms, F.lit(0.0))


def url_filter(
    df: DataFrame,
    blocklist_domains: DataFrame,
    word_weights: Mapping[str, float],
    url_col: str = "url",
    id_col: str = "doc_id",
    threshold: float = 1.0,
    broadcast_blocklist: bool = True,
) -> DataFrame:
    """(id, url, host, domain_blocked, word_score, keep) for every row.

    ``blocklist_domains`` must have a ``domain`` column (lowercase,
    no scheme). ``keep`` = host not blocked (exact or subdomain) AND
    word_score < threshold.

    The ``host`` output is the BARE hostname (scheme stripped) —
    blocklists are scheme-less, unlike P2's reference-parity
    host-with-schema (urltools.host_col, Parser.py semantics).
    """
    host = F.substring_index(host_col(F.col(url_col)), "://", -1)
    base = df.select(
        F.col(id_col),
        F.col(url_col).alias("url"),
        host.alias("host"),
        word_score_col(F.col(url_col), word_weights).alias("word_score"),
    )
    bl = blocklist_domains.select(F.lower(F.col("domain")).alias("domain"))
    if broadcast_blocklist:
        bl = F.broadcast(bl)
    hits = (
        base.select(
            F.col(id_col),
            F.explode(ancestor_domains(F.col("host"))).alias("domain"),
        )
        .join(bl, "domain")
        .select(id_col)
        .distinct()
        .withColumn("_blocked", F.lit(True))
    )
    return base.join(hits, id_col, "left").select(
        id_col,
        "url",
        "host",
        F.coalesce(F.col("_blocked"), F.lit(False)).alias("domain_blocked"),
        "word_score",
        (
            ~F.coalesce(F.col("_blocked"), F.lit(False))
            & (F.col("word_score") < F.lit(float(threshold)))
        ).alias("keep"),
    )
