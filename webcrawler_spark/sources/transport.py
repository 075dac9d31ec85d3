"""Pluggable fetch transports for the live crawl executor.

The engine is offline-by-design (``input_hint``: the corpus is a
parquet/Iceberg table), but the per-host ``applyInPandas`` fetch
executor (engine.py ``_fetch_apply_in_pandas_live``) is the declared
plug point for a real crawler. A transport is any picklable object
with the reference's access contract (WebAccesser.py:35-100):

    head(url) -> (status:int, content_type:str) | None
    get(url)  -> (status:int, content_type:str, body:bytes) | None

``None`` means the request failed (connect/read timeout, TLS error,
DNS miss) — the reference's ``lastResponse == None`` state: the URL is
counted as attempted-not-fetched, exactly like a corpus miss in the
offline join.

* :class:`FakeTransport` — deterministic in-process corpus dict; the
  e2e test (tests/test_live_fetch.py) proves the live executor against
  it is byte-identical to the offline-join crawl over the same pages.
* :class:`Urllib3Transport` — the real network client with the
  reference's pool settings (timeout connect=2/read=3, retries off,
  browser UA — WebAccesser.py:11,44-50). Untestable in this sandbox
  (no egress); constructed lazily per executor process.
"""

from __future__ import annotations

from typing import Optional


class FakeTransport:
    """In-process transport over a {url: (status, content_type, body)}
    dict. Deterministic: no latency, no jitter; urls in ``fail_urls``
    simulate a timed-out request (both HEAD and GET return None,
    mirroring the reference's response-less failure mode)."""

    def __init__(
        self,
        corpus: dict[str, tuple[int, str, bytes]],
        fail_urls: frozenset[str] = frozenset(),
    ):
        self.corpus = corpus
        self.fail_urls = frozenset(fail_urls)

    def head(self, url: str) -> Optional[tuple[int, str]]:
        if url in self.fail_urls:
            return None
        row = self.corpus.get(url)
        if row is None:
            return None
        status, content_type, _ = row
        return int(status), content_type

    def get(self, url: str) -> Optional[tuple[int, str, bytes]]:
        if url in self.fail_urls:
            return None
        row = self.corpus.get(url)
        if row is None:
            return None
        status, content_type, body = row
        return int(status), content_type, bytes(body) if body is not None else b""


def transport_from_pages(pages) -> FakeTransport:
    """Collect a (url, status, content_type, html) DataFrame into a
    FakeTransport. TEST-SCALE ONLY (driver collect): the point is to
    exercise the live executor path against a known corpus; a real
    deployment passes :class:`Urllib3Transport` instead."""
    corpus = {
        r["url"]: (
            int(r["status"]),
            r["content_type"] or "",
            bytes(r["html"]) if r["html"] is not None else b"",
        )
        for r in pages.select("url", "status", "content_type", "html").collect()
    }
    return FakeTransport(corpus)


class Urllib3Transport:
    """Real network transport with the reference crawler's pool
    contract (WebAccesser.py:44-50): connect timeout 2s, read timeout
    3s, no retries, certifi CA bundle, browser-like User-Agent
    (WebAccesser.py:11). The pool is created lazily in each executor
    process (PoolManager is not picklable; only the config ships).

    No external egress exists in this sandbox, but the client itself
    is real-socket-tested against a loopback HTTP server
    (tests/test_live_fetch.py: status/content-type/body pass-through,
    UA on the wire, timeout/refused -> None), and the executor code
    path it plugs into is byte-exact-tested via FakeTransport.
    """

    UA = (
        "Mozilla/5.0 (platform; rv:geckoversion) Gecko/geckotrail"
        " Firefox/firefoxversion"
    )

    def __init__(
        self,
        connect_timeout: float = 2.0,
        read_timeout: float = 3.0,
        proxy_url: str | None = None,
        ca_certs: str | None = None,
    ):
        """``proxy_url``: route all requests through a forward proxy
        (urllib3 ProxyManager — https URLs tunnel via CONNECT). This is
        the egress seam a production crawl cluster usually has anyway,
        and it lets the full engine e2e run against a REAL socket in a
        no-egress sandbox (tests/test_live_fetch.py runs the crawl
        through a loopback TLS-terminating CONNECT proxy that serves
        the synthetic corpus). ``ca_certs``: CA bundle path overriding
        certifi — required when the proxy terminates TLS with its own
        CA; cert verification stays ON either way."""
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.proxy_url = proxy_url
        self.ca_certs = ca_certs
        self._pool = None  # lazily built per process

    def __getstate__(self):
        return {
            "connect_timeout": self.connect_timeout,
            "read_timeout": self.read_timeout,
            "proxy_url": self.proxy_url,
            "ca_certs": self.ca_certs,
        }

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._pool = None

    def _pool_or_create(self):
        if self._pool is None:
            import urllib3

            kwargs = {"retries": False}
            if self.ca_certs is not None:
                kwargs["cert_reqs"] = "CERT_REQUIRED"
                kwargs["ca_certs"] = self.ca_certs
            else:
                try:
                    import certifi

                    kwargs["cert_reqs"] = "CERT_REQUIRED"
                    kwargs["ca_certs"] = certifi.where()
                except ImportError:
                    pass
            timeout = urllib3.util.Timeout(
                connect=self.connect_timeout, read=self.read_timeout
            )
            if self.proxy_url is not None:
                self._pool = urllib3.ProxyManager(
                    self.proxy_url, timeout=timeout, **kwargs
                )
            else:
                self._pool = urllib3.PoolManager(timeout=timeout, **kwargs)
        return self._pool

    def _request(self, method: str, url: str):
        try:
            return self._pool_or_create().request(
                method, url, headers={"User-Agent": self.UA}
            )
        except Exception:
            return None  # reference parity: any transport error -> no response

    def head(self, url: str) -> Optional[tuple[int, str]]:
        r = self._request("HEAD", url)
        if r is None:
            return None
        return int(r.status), r.headers.get("content-type", "")

    def get(self, url: str) -> Optional[tuple[int, str, bytes]]:
        r = self._request("GET", url)
        if r is None:
            return None
        return int(r.status), r.headers.get("content-type", ""), r.data
