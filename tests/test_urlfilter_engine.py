"""Engine URL-filter integration (CrawlConfig.url_blocklist /
url_word_weights): discovered links to blocked domains (exact or
subdomain) and links whose weighted URL word score reaches the
threshold never enter the frontier; sub-threshold and clean links are
untouched; the default-off path takes no gate at all (the gate is
skipped entirely, preserving reference parity — the reference's only
URL gate is the extension blocklist, Parser.py:18-24)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.functions.htmltools import decode_html_bytes, visible_text


def _pages(spark):
    """seed.example links to a clean host, a blocked apex, a blocked
    subdomain, a URL over the word threshold, and one under it."""

    def page(title, links=()):
        a = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return (
            f"<html><head><title>{title}</title></head>"
            f"<body><p>{title}.</p>{a}</body></html>"
        )

    rows = [
        (
            "https://seed.example/",
            page(
                "Seed",
                [
                    "https://good.example/a",
                    "https://bad.example/y",
                    "https://ads.bad.example/x",
                    "https://good.example/casino-poker",
                    "https://good.example/casino-only",
                ],
            ),
            200,
            "text/html",
        ),
        ("https://good.example/a", page("A"), 200, "text/html"),
        ("https://bad.example/y", page("Y"), 200, "text/html"),
        ("https://ads.bad.example/x", page("X"), 200, "text/html"),
        ("https://good.example/casino-poker", page("CP"), 200, "text/html"),
        ("https://good.example/casino-only", page("CO"), 200, "text/html"),
    ]
    data = []
    for url, html, status, ct in rows:
        raw = html.encode("utf-8")
        data.append(
            (url, raw, visible_text(decode_html_bytes(raw)), "en", status, ct)
        )
    return spark.createDataFrame(
        data,
        "url string, html binary, text string, lang string, status int,"
        " content_type string",
    ).localCheckpoint()


def _run(spark, pages, **cfg_kwargs):
    eng = CrawlEngine(
        spark,
        pages,
        config=CrawlConfig(max_rounds=6, collect_metrics=False, **cfg_kwargs),
    )
    eng.run(
        spark.createDataFrame(
            [("https://seed.example/", 0)], "url string, seed_order long"
        )
    )
    return eng


def _urls(eng):
    return {r["url"] for r in eng.pages_fetched().select("url").collect()}


@pytest.fixture(scope="module")
def baseline(spark):
    return _run(spark, _pages(spark))


@pytest.fixture(scope="module")
def filtered(spark):
    return _run(
        spark,
        _pages(spark),
        url_blocklist=["bad.example"],
        url_word_weights={"casino": 0.6, "poker": 0.5},
        url_word_threshold=1.0,
    )


def test_default_off_crawls_everything(baseline):
    assert _urls(baseline) == {
        "https://seed.example/",
        "https://good.example/a",
        "https://bad.example/y",
        "https://ads.bad.example/x",
        "https://good.example/casino-poker",
        "https://good.example/casino-only",
    }


def test_blocked_domain_and_subdomain_cut(filtered):
    got = _urls(filtered)
    assert "https://bad.example/y" not in got
    assert "https://ads.bad.example/x" not in got


def test_word_threshold_cut_is_exact(filtered):
    got = _urls(filtered)
    # casino(0.6)+poker(0.5)=1.1 ≥ 1.0 → cut; casino alone 0.6 < 1.0 → kept
    assert "https://good.example/casino-poker" not in got
    assert "https://good.example/casino-only" in got


def test_clean_links_untouched(filtered):
    got = _urls(filtered)
    assert "https://seed.example/" in got
    assert "https://good.example/a" in got


def test_blocked_urls_never_reach_frontier_or_seen(filtered):
    # the cut is pre-frontier (RefinedWeb §2.1 pre-fetch), not a fetch
    # failure: the URLs must not appear in any crawl state at all
    seen = filtered.cat.read("seen")
    bad = seen.filter(
        F.col("url").contains("bad.example")
        | F.col("url").contains("casino-poker")
    )
    assert bad.count() == 0


def test_each_gate_works_alone(spark):
    only_bl = _run(spark, _pages(spark), url_blocklist=["bad.example"])
    got = _urls(only_bl)
    assert "https://bad.example/y" not in got
    assert "https://good.example/casino-poker" in got

    only_ww = _run(
        spark,
        _pages(spark),
        url_word_weights={"casino": 0.6, "poker": 0.5},
    )
    got = _urls(only_ww)
    assert "https://ads.bad.example/x" in got
    assert "https://good.example/casino-poker" not in got
