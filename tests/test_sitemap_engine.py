"""Engine sitemap seeding (CrawlConfig.use_sitemaps): sitemap-only
pages are reachable when the flag is on, invisible when off (the
reference-parity default), and every normal gate still applies."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.functions.htmltools import decode_html_bytes, visible_text


def _pages(spark):
    """seed.example links only to /linked; its sitemap advertises
    /sm1, /sm2 (whitespace-padded loc), /blocked (robots-disallowed),
    and /doc.pdf (extension-filtered). other.example has a sitemap too
    but is never seeded, so its entries must not appear."""
    def page(title, links=()):
        a = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return f"<html><head><title>{title}</title></head><body><p>{title}.</p>{a}</body></html>"

    rows = [
        ("https://seed.example/", page("Seed", ["/linked"]), 200, "text/html"),
        ("https://seed.example/linked", page("Linked"), 200, "text/html"),
        ("https://seed.example/sm1", page("Sm1"), 200, "text/html"),
        ("https://seed.example/sm2", page("Sm2"), 200, "text/html"),
        ("https://seed.example/blocked", page("Blocked"), 200, "text/html"),
        ("https://seed.example/doc.pdf", "%PDF fake", 200, "application/pdf"),
        (
            "https://seed.example/robots.txt",
            "User-agent: *\nDisallow: /blocked\n",
            200,
            "text/plain",
        ),
        (
            "https://seed.example/sitemap.xml",
            "<urlset>"
            "<url><loc>  https://seed.example/sm1  </loc></url>"
            "<url><loc>https://seed.example/sm2</loc>"
            "<lastmod>2026-01-01</lastmod></url>"
            "<url><loc>https://seed.example/blocked</loc></url>"
            "<url><loc>https://seed.example/doc.pdf</loc></url>"
            "</urlset>",
            200,
            "application/xml",
        ),
        ("https://other.example/", page("Other"), 200, "text/html"),
        ("https://other.example/hidden", page("Hidden"), 200, "text/html"),
        (
            "https://other.example/sitemap.xml",
            "<urlset><url><loc>https://other.example/hidden</loc></url></urlset>",
            200,
            "application/xml",
        ),
    ]
    data = []
    for i, (url, html, status, ct) in enumerate(rows):
        raw = html.encode("utf-8")
        data.append((url, raw, visible_text(decode_html_bytes(raw)), "en", status, ct))
    return spark.createDataFrame(
        data,
        "url string, html binary, text string, lang string, status int,"
        " content_type string",
    ).localCheckpoint()


def _seeds(spark):
    return spark.createDataFrame(
        [("https://seed.example/", 0)], "url string, seed_order long"
    )


def _run(spark, pages, use_sitemaps):
    eng = CrawlEngine(
        spark,
        pages,
        config=CrawlConfig(max_rounds=10, use_sitemaps=use_sitemaps),
    )
    eng.run(_seeds(spark))
    return {r["url"]: r["fetched"] for r in eng.seen().collect()}


def test_sitemap_off_is_reference_parity(spark):
    seen = _run(spark, _pages(spark), use_sitemaps=False)
    assert seen.get("https://seed.example/") is True
    assert seen.get("https://seed.example/linked") is True
    assert "https://seed.example/sm1" not in seen
    assert "https://seed.example/sm2" not in seen


def test_sitemap_on_fetches_advertised_pages(spark):
    seen = _run(spark, _pages(spark), use_sitemaps=True)
    # anchor-discovered page still crawled
    assert seen.get("https://seed.example/linked") is True
    # sitemap-only pages fetched (loc whitespace trimmed, lastmod ok)
    assert seen.get("https://seed.example/sm1") is True
    assert seen.get("https://seed.example/sm2") is True
    # robots still gates: attempted (seen) but NOT fetched
    assert seen.get("https://seed.example/blocked") is False
    # extension filter still gates the .pdf entry
    assert seen.get("https://seed.example/doc.pdf") is False
    # un-seeded host's sitemap is never read
    assert "https://other.example/hidden" not in seen


def _pages_discovery(spark):
    """Discovery-channel fixture: adv.example has NO /sitemap.xml but
    its robots.txt advertises a custom path (plus a comment line and
    weird casing); idx.example's well-known /sitemap.xml is a sitemap
    INDEX referencing two child urlsets; loner.example advertises a
    sitemap but is never seeded."""
    def page(title, links=()):
        a = "".join(f'<a href="{u}">{u}</a>' for u in links)
        return f"<html><head><title>{title}</title></head><body><p>{title}.</p>{a}</body></html>"

    rows = [
        # adv.example — robots-advertised custom sitemap path
        ("https://adv.example/", page("Adv"), 200, "text/html"),
        ("https://adv.example/a1", page("A1"), 200, "text/html"),
        ("https://adv.example/a2", page("A2"), 200, "text/html"),
        (
            "https://adv.example/robots.txt",
            "# robots with sitemap ads\n"
            "User-agent: *\nDisallow:\n"
            "SITEMAP: https://adv.example/maps/news.xml  # trailing comment\n",
            200,
            "text/plain",
        ),
        (
            "https://adv.example/maps/news.xml",
            "<urlset><url><loc>https://adv.example/a1</loc></url>"
            "<url><loc>https://adv.example/a2</loc></url></urlset>",
            200,
            "application/xml",
        ),
        # idx.example — well-known path is an index of two children
        ("https://idx.example/", page("Idx"), 200, "text/html"),
        ("https://idx.example/i1", page("I1"), 200, "text/html"),
        ("https://idx.example/i2", page("I2"), 200, "text/html"),
        ("https://idx.example/i3", page("I3"), 200, "text/html"),
        (
            "https://idx.example/sitemap.xml",
            "<sitemapindex>"
            "<sitemap><loc>https://idx.example/sm-a.xml</loc></sitemap>"
            "<sitemap><loc>https://idx.example/sm-b.xml</loc>"
            "<lastmod>2026-02-02</lastmod></sitemap>"
            "</sitemapindex>",
            200,
            "application/xml",
        ),
        (
            "https://idx.example/sm-a.xml",
            "<urlset><url><loc>https://idx.example/i1</loc></url>"
            "<url><loc>https://idx.example/i2</loc></url></urlset>",
            200,
            "application/xml",
        ),
        (
            "https://idx.example/sm-b.xml",
            "<urlset><url><loc>https://idx.example/i3</loc></url></urlset>",
            200,
            "application/xml",
        ),
        # loner.example — advertised but never seeded
        ("https://loner.example/", page("Loner"), 200, "text/html"),
        ("https://loner.example/l1", page("L1"), 200, "text/html"),
        (
            "https://loner.example/robots.txt",
            "Sitemap: https://loner.example/own.xml\n",
            200,
            "text/plain",
        ),
        (
            "https://loner.example/own.xml",
            "<urlset><url><loc>https://loner.example/l1</loc></url></urlset>",
            200,
            "application/xml",
        ),
    ]
    data = []
    for url, html, status, ct in rows:
        raw = html.encode("utf-8")
        data.append((url, raw, visible_text(decode_html_bytes(raw)), "en", status, ct))
    return spark.createDataFrame(
        data,
        "url string, html binary, text string, lang string, status int,"
        " content_type string",
    ).localCheckpoint()


def test_robots_advertised_sitemap_discovered(spark):
    """A custom sitemap path advertised only via robots `Sitemap:` is
    parsed; un-seeded hosts' advertisements stay invisible."""
    pages = _pages_discovery(spark)
    eng = CrawlEngine(
        spark, pages, config=CrawlConfig(max_rounds=10, use_sitemaps=True)
    )
    eng.run(
        spark.createDataFrame(
            [("https://adv.example/", 0)], "url string, seed_order long"
        )
    )
    seen = {r["url"]: r["fetched"] for r in eng.seen().collect()}
    assert seen.get("https://adv.example/a1") is True
    assert seen.get("https://adv.example/a2") is True
    assert "https://loner.example/l1" not in seen


def test_sitemap_index_recursion(spark):
    """An index file at the well-known path is followed one hop to its
    child urlsets; entries keep (file, pos) FIFO order."""
    pages = _pages_discovery(spark)
    eng = CrawlEngine(
        spark, pages, config=CrawlConfig(max_rounds=10, use_sitemaps=True)
    )
    eng.run(
        spark.createDataFrame(
            [("https://idx.example/", 0)], "url string, seed_order long"
        )
    )
    seen = {r["url"]: r["fetched"] for r in eng.seen().collect()}
    assert seen.get("https://idx.example/i1") is True
    assert seen.get("https://idx.example/i2") is True
    assert seen.get("https://idx.example/i3") is True
    ts = {
        r.url: r.fetch_ts
        for r in eng.cat.read("pages_fetched").select("url", "fetch_ts").collect()
    }
    # seed first, then child-file order (sm-a before sm-b), file order within
    assert ts["https://idx.example/"] < ts["https://idx.example/i1"]
    assert ts["https://idx.example/i1"] < ts["https://idx.example/i2"]
    assert ts["https://idx.example/i2"] < ts["https://idx.example/i3"]


def test_sitemap_entries_fifo_after_seeds(spark):
    """Per-host FIFO: the seed root fetches before any sitemap entry
    (discovered_seq offset), and sitemap entries keep file order."""
    pages = _pages(spark)
    eng = CrawlEngine(
        spark, pages, config=CrawlConfig(max_rounds=10, use_sitemaps=True)
    )
    eng.run(_seeds(spark))
    fetched = (
        eng.cat.read("pages_fetched")
        .select("url", "fetch_ts")
        .collect()
    )
    ts = {r.url: r.fetch_ts for r in fetched}
    assert ts["https://seed.example/"] < ts["https://seed.example/sm1"]
    assert ts["https://seed.example/sm1"] < ts["https://seed.example/sm2"]
