"""Crawler-trap detection: hosts that mint unbounded distinct URLs
for near-constant content (calendar pages, session ids, faceted
search). A frontier that keeps admitting such hosts wastes its fetch
budget — the classic mitigation (public: Heydon & Najork, "Mercator:
A scalable, extensible Web crawler", WWW 1999 §3; also the
IRLbot "spam/vertical traps" analysis, Lee et al. WWW 2008) is a
per-host duplicate-content ratio that feeds the scheduler's host
budget.

The reference crawler (Pendulun/WebCrawler) bounds per-host damage
only via its global page budget (Host.py's per-host queue has no
content-signal feedback); this operator adds the standard signal a
production frontier needs at 10^10-URL scale.

Plan shape: one hash aggregate on host — both distinct counts ride
the same aggregate; content is digested to 32 bytes (md5) *before*
the shuffle so full page text never moves. Zero joins, zero windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def trap_host_stats(
    pages: DataFrame,
    host_col: str = "host",
    url_col: str = "url",
    content_col: str = "text",
    min_urls: int = 10,
    dup_threshold: float = 0.5,
) -> DataFrame:
    """(host, n_urls, n_contents, dup_url_frac, is_trap) per host.

    ``dup_url_frac`` = 1 − distinct contents / distinct urls: the
    fraction of a host's URL space that returns content some other of
    its URLs already returned. ``is_trap`` flags hosts with at least
    ``min_urls`` distinct URLs and a duplicate fraction ≥
    ``dup_threshold`` — the scheduler demotes (or caps) flagged hosts
    in the next round's priority assignment.
    """
    return (
        pages.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.countDistinct(F.col(url_col)).alias("n_urls"),
            F.countDistinct(F.md5(F.col(content_col))).alias("n_contents"),
        )
        .select(
            "host",
            "n_urls",
            "n_contents",
            F.round(
                F.lit(1.0) - F.col("n_contents") / F.col("n_urls"), 6
            ).alias("dup_url_frac"),
            (
                (F.col("n_urls") >= F.lit(int(min_urls)))
                & (
                    F.lit(1.0) - F.col("n_contents") / F.col("n_urls")
                    >= F.lit(float(dup_threshold))
                )
            ).alias("is_trap"),
        )
    )
