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


# ---------------------------------------------------------------------
# FULL engine e2e over a REAL socket (round-3 verdict ask #3): the
# crawl's live executor drives Urllib3Transport through a loopback
# TLS-terminating CONNECT proxy that serves the synthetic corpus —
# real CONNECT tunnel, real TLS handshake, real certificate
# verification against an ephemeral CA (SANs for the *.example parity
# hosts), real HTTP/1.1 keep-alive inside the tunnel. The proxy is the
# egress seam a production crawl cluster has anyway; the assertion is
# the same byte-identity bar as the FakeTransport tests.
# ---------------------------------------------------------------------
@pytest.fixture(scope="module")
def loopback_tls_proxy(tmp_path_factory, spark, pages):
    import datetime
    import socketserver
    import ssl
    import threading

    from cryptography import x509
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.x509.oid import NameOID

    corpus = transport_from_pages(pages).corpus
    hosts = sorted(
        {u.split("/")[2] for u in corpus if u.startswith("https://")}
    )

    def mint():
        nvb = datetime.datetime(2000, 1, 1, tzinfo=datetime.timezone.utc)
        nva = datetime.datetime(2100, 1, 1, tzinfo=datetime.timezone.utc)
        ca_key = ec.generate_private_key(ec.SECP256R1())
        ca_name = x509.Name(
            [x509.NameAttribute(NameOID.COMMON_NAME, "loopback e2e CA")]
        )
        ca = (
            x509.CertificateBuilder()
            .subject_name(ca_name)
            .issuer_name(ca_name)
            .public_key(ca_key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(nvb)
            .not_valid_after(nva)
            .add_extension(
                x509.BasicConstraints(ca=True, path_length=None), critical=True
            )
            .sign(ca_key, hashes.SHA256())
        )
        leaf_key = ec.generate_private_key(ec.SECP256R1())
        leaf = (
            x509.CertificateBuilder()
            .subject_name(
                x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, hosts[0])])
            )
            .issuer_name(ca_name)
            .public_key(leaf_key.public_key())
            .serial_number(x509.random_serial_number())
            .not_valid_before(nvb)
            .not_valid_after(nva)
            .add_extension(
                x509.SubjectAlternativeName(
                    [x509.DNSName(h) for h in hosts]
                    + [x509.DNSName("*.example")]
                ),
                critical=False,
            )
            .add_extension(
                x509.BasicConstraints(ca=False, path_length=None), critical=True
            )
            .sign(ca_key, hashes.SHA256())
        )
        return ca, leaf, leaf_key

    ca, leaf, leaf_key = mint()
    d = tmp_path_factory.mktemp("tlsproxy")
    (d / "ca.pem").write_bytes(ca.public_bytes(serialization.Encoding.PEM))
    (d / "leaf.pem").write_bytes(leaf.public_bytes(serialization.Encoding.PEM))
    (d / "leaf.key").write_bytes(
        leaf_key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption(),
        )
    )
    ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ssl_ctx.load_cert_chain(str(d / "leaf.pem"), str(d / "leaf.key"))

    class Tunnel(socketserver.BaseRequestHandler):
        def handle(self):
            try:
                self._handle()
            except (OSError, ssl.SSLError, ValueError):
                pass  # client hung up / handshake abort — next tunnel

        def _handle(self):
            self.request.settimeout(15)
            f = self.request.makefile("rb")
            line = f.readline().decode("latin-1").strip()
            if not line:
                return
            method, target = line.split()[:2]
            while f.readline() not in (b"\r\n", b"\n", b""):
                pass
            if method != "CONNECT":
                self.request.sendall(b"HTTP/1.1 400 Bad Request\r\n\r\n")
                return
            host = target.rsplit(":", 1)[0]
            self.request.sendall(
                b"HTTP/1.1 200 Connection Established\r\n\r\n"
            )
            tls = ssl_ctx.wrap_socket(self.request, server_side=True)
            tf = tls.makefile("rb")
            while True:
                req = tf.readline()
                if not req or req in (b"\r\n", b"\n"):
                    break
                m, path = req.decode("latin-1").split()[:2]
                while tf.readline() not in (b"\r\n", b"\n", b""):
                    pass
                row = corpus.get(f"https://{host}{path}")
                status, ct, body = row if row else (404, "text/plain", b"")
                tls.sendall(
                    (
                        f"HTTP/1.1 {status} S\r\nContent-Type: {ct}\r\n"
                        f"Content-Length: {len(body)}\r\n"
                        f"Connection: keep-alive\r\n\r\n"
                    ).encode("latin-1")
                    + (b"" if m == "HEAD" else body)
                )

    class Server(socketserver.ThreadingTCPServer):
        allow_reuse_address = True
        daemon_threads = True

    srv = Server(("127.0.0.1", 0), Tunnel)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield (
        f"http://127.0.0.1:{srv.server_address[1]}",
        str(d / "ca.pem"),
    )
    srv.shutdown()


@pytest.fixture(scope="module")
def live_socket(spark, pages, loopback_tls_proxy):
    proxy_url, ca_pem = loopback_tls_proxy
    eng = CrawlEngine(
        spark,
        pages,
        config=CrawlConfig(
            max_rounds=40,
            transport=Urllib3Transport(
                connect_timeout=5.0,
                read_timeout=10.0,
                proxy_url=proxy_url,
                ca_certs=ca_pem,
            ),
        ),
    )
    eng.run(seeds_df(spark))
    return eng


def test_socket_seen_and_fetched_parity(offline, live_socket):
    """The crawl over real TCP+TLS+HTTP reproduces the offline URL-seen
    set and fetched flags exactly (proxy 404 for a corpus-missing URL
    == offline head-miss under the F3/F5 gates)."""
    off = {r["url"]: r["fetched"] for r in offline.seen().collect()}
    liv = {r["url"]: r["fetched"] for r in live_socket.seen().collect()}
    assert off == liv


def test_socket_text_byte_identical(offline, live_socket):
    """input_hint invariant over the wire: GET bodies that crossed a
    real TLS socket round-trip to byte-identical extracted text."""
    off = {r["url"]: r["text"] for r in offline.pages_fetched().collect()}
    liv = {r["url"]: r["text"] for r in live_socket.pages_fetched().collect()}
    assert off == liv
