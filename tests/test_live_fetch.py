"""Live-transport fetch executor parity (SURVEY.md S3/S4 plug point).

The engine is offline-by-design, but a live deployment swaps the
corpus joins for real HEAD/GET calls inside the per-host applyInPandas
executor (engine._fetch_apply_in_pandas_live) through a transport
object with the reference's access contract (WebAccesser.py:35-100).
These tests drive that executor end-to-end with a deterministic
in-process FakeTransport built from the SAME synthetic corpus and
assert the crawl is byte-identical to the offline-join crawl: same
seen set + fetched flags, same attempt timestamps (politeness law),
same extracted text per url.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.engine import CrawlConfig, CrawlEngine
from webcrawler_spark.sources.synthetic_web import build_pages, seeds_df
from webcrawler_spark.sources.transport import (
    FakeTransport,
    Urllib3Transport,
    transport_from_pages,
)


@pytest.fixture(scope="module")
def pages(spark):
    return build_pages(spark).localCheckpoint()


@pytest.fixture(scope="module")
def offline(spark, pages):
    eng = CrawlEngine(spark, pages, config=CrawlConfig(max_rounds=40))
    eng.run(seeds_df(spark))
    return eng


@pytest.fixture(scope="module")
def live(spark, pages):
    eng = CrawlEngine(
        spark,
        pages,
        config=CrawlConfig(
            max_rounds=40, transport=transport_from_pages(pages)
        ),
    )
    eng.run(seeds_df(spark))
    return eng


def test_seen_and_fetched_parity(offline, live):
    """Same URL-seen set and fetched flags: transport head-miss ==
    corpus miss, text/html gate, 2xx gate."""
    off = {r["url"]: r["fetched"] for r in offline.seen().collect()}
    liv = {r["url"]: r["fetched"] for r in live.seen().collect()}
    assert off == liv
    assert any(not f for f in off.values())  # non-fetched attempts exist


def test_attempt_ts_parity(offline, live):
    """The live executor's fused HEAD+wait loop assigns the identical
    virtual-clock politeness timestamps as the offline window path."""
    off = {r["url"]: r["attempt_ts"] for r in offline.seen().collect()}
    liv = {r["url"]: r["attempt_ts"] for r in live.seen().collect()}
    assert off == liv


def test_text_byte_identical(offline, live):
    """input_hint invariant carried through the transport: the GET body
    round-trips to byte-identical extracted text per url."""
    off = {r["url"]: r["text"] for r in offline.pages_fetched().collect()}
    liv = {r["url"]: r["text"] for r in live.pages_fetched().collect()}
    assert off == liv


def test_transport_failure_is_attempted_not_fetched(spark, pages):
    """A url whose transport times out (head/get -> None) is seen but
    not fetched — the reference's response-less failure mode
    (WebAccesser.py:92-96)."""
    full = transport_from_pages(pages)
    # fail a seed url (always attempted) that the corpus would serve
    from webcrawler_spark.functions.urltools import normalize_url

    victim = next(
        u
        for u in (
            normalize_url(r["url"]) for r in seeds_df(spark).collect()
        )
        if u in full.corpus and full.corpus[u][0] == 200
        and "text/html" in full.corpus[u][1]
    )
    tr = FakeTransport(full.corpus, fail_urls=frozenset({victim}))
    eng = CrawlEngine(
        spark, pages, config=CrawlConfig(max_rounds=40, transport=tr)
    )
    eng.run(seeds_df(spark))
    seen = {r["url"]: r["fetched"] for r in eng.seen().collect()}
    assert seen[victim] is False


def test_fake_transport_contract():
    tr = FakeTransport(
        {"http://a/": (200, "text/html", b"<html/>")},
        fail_urls=frozenset({"http://b/"}),
    )
    assert tr.head("http://a/") == (200, "text/html")
    assert tr.get("http://a/") == (200, "text/html", b"<html/>")
    assert tr.head("http://b/") is None        # simulated timeout
    assert tr.get("http://b/") is None
    assert tr.head("http://nope/") is None     # dns-miss analog


def test_urllib3_transport_pickles_without_pool():
    """The real transport ships config-only (PoolManager rebuilt per
    executor process)."""
    import pickle

    tr = Urllib3Transport(connect_timeout=1.5, read_timeout=2.5)
    tr2 = pickle.loads(pickle.dumps(tr))
    assert tr2.connect_timeout == 1.5 and tr2.read_timeout == 2.5
    assert tr2._pool is None


# ---------------------------------------------------------------------
# Real sockets: Urllib3Transport against a loopback HTTP server. The
# sandbox has no external egress, but 127.0.0.1 is a real network path
# through the real urllib3 PoolManager — this pins the live client's
# contract (WebAccesser.py:35-100): status/content-type/body pass-
# through, browser UA header, and error/timeout -> None parity.
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def loopback_server():
    import http.server
    import threading
    import time as _time

    seen_headers = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _serve(self, send_body: bool):
            seen_headers[self.path] = dict(self.headers)
            if self.path == "/slow":
                _time.sleep(3.0)  # > read_timeout in the test below
            if self.path == "/missing":
                self.send_response(404)
                self.send_header("Content-Type", "text/plain")
                self.end_headers()
                return
            body = b"<html><title>loop</title><body>hi</body></html>"
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            if send_body:
                self.wfile.write(body)

        def do_GET(self):
            self._serve(send_body=True)

        def do_HEAD(self):
            self._serve(send_body=False)

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", seen_headers
    srv.shutdown()


def test_urllib3_real_head_get_loopback(loopback_server):
    base, seen_headers = loopback_server
    tr = Urllib3Transport(connect_timeout=2.0, read_timeout=2.0)
    assert tr.head(f"{base}/page") == (200, "text/html; charset=utf-8")
    status, ctype, body = tr.get(f"{base}/page")
    assert status == 200 and "text/html" in ctype
    assert body == b"<html><title>loop</title><body>hi</body></html>"
    # non-2xx passes through (the engine's F4 gate decides, not the client)
    assert tr.head(f"{base}/missing")[0] == 404
    # browser-like UA reaches the wire (WebAccesser.py:11)
    assert seen_headers["/page"]["User-Agent"] == Urllib3Transport.UA


def test_urllib3_real_timeout_and_refused(loopback_server):
    base, _ = loopback_server
    tr = Urllib3Transport(connect_timeout=0.5, read_timeout=0.5)
    assert tr.get(f"{base}/slow") is None          # read timeout -> None
    # connection refused (nothing listens on the adjacent port) -> None
    import urllib.parse

    port = urllib.parse.urlsplit(base).port
    assert tr.head(f"http://127.0.0.1:{port ^ 1}/x") is None
