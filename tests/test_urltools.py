"""Golden tests for URL scalar semantics (SURVEY.md §5.2 layer 1).

Each truth-table row cites the reference behavior it pins
(/root/reference/utils.py, Parser.py, Worker.py).
"""

import pytest

from webcrawler_spark.functions.urltools import (
    first_href_token,
    format_link,
    host_of,
    join_host_resource,
    normalize_url,
    passes_extension_filter,
    resource_of,
)

# ---------------------------------------------------------------- P1


@pytest.mark.parametrize(
    "raw,expected",
    [
        # scheme+host lowercased
        ("HTTPS://Example.COM/Path", "https://example.com/Path"),
        # default port stripped
        ("https://example.com:443/a", "https://example.com/a"),
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # empty path → '/'
        ("https://example.com", "https://example.com/"),
        # dot segments removed
        ("https://h.io/a/./b/../c", "https://h.io/a/c"),
        # percent-encoding: hex uppercased, unreserved decoded
        ("https://h.io/%7euser/%2fx%41", "https://h.io/~user/%2FxA"),
        # query/fragment kept
        ("https://h.io/a?b=1&c=2#frag", "https://h.io/a?b=1&c=2#frag"),
        # malformed input returned unchanged (utils.py:22-29 contract)
        ("not a url", "not a url"),
        ("mailto:joe@x.com", "mailto:joe@x.com"),
        ("", ""),
        # IDN host → punycode (IDNA 2003 stdlib codec, the one
        # url-normalize 1.4.3 uses); path stays UTF-8 pct-encoded
        ("https://bücher.example/x", "https://xn--bcher-kva.example/x"),
        (
            "https://MÜNCHEN.example:443/straße",
            "https://xn--mnchen-3ya.example/stra%C3%9Fe",
        ),
        # already-punycode and trailing-dot hosts
        ("https://xn--bcher-kva.example/x", "https://xn--bcher-kva.example/x"),
        ("https://café.example./", "https://xn--caf-dma.example/"),
        # IDNA-invalid host (empty label): keep lowercased as-is
        ("https://a..b.example/x", "https://a..b.example/x"),
        # scheme-relative network-path ref → default https scheme
        # (url-normalize provide_url_scheme behavior)
        ("//Example.COM/a/../b", "https://example.com/b"),
        ("//", "//"),
        ("///rooted/path", "///rooted/path"),
        # space in query pct-encoded; '+' kept literal (sub-delim)
        ("https://h.io/p?q=a b", "https://h.io/p?q=a%20b"),
        ("https://h.io/p?q=a+b", "https://h.io/p?q=a+b"),
    ],
)
def test_normalize_url(raw, expected):
    assert normalize_url(raw) == expected


def test_normalize_never_raises():
    for bad in [None, "ht!tp://", "https://", "https://:", "//nohost"]:
        normalize_url(bad)  # must not raise (utils.py:22-29)


# ---------------------------------------------------------------- P2/P3/P4


@pytest.mark.parametrize(
    "url,host,resource",
    [
        ("https://a.io/x/y", "https://a.io", "/x/y"),
        ("https://a.io/", "https://a.io", "/"),
        ("https://a.io", "https://a.io", "/"),  # utils.py:48-49 edge
        ("mailto:joe", "", "/"),  # parse failure ⇒ '' host (utils.py:43-44)
        ("", "", "/"),
    ],
)
def test_host_resource_split(url, host, resource):
    assert host_of(url) == host
    assert resource_of(url) == resource
    if host:
        assert join_host_resource(host, resource) == (
            url if url.endswith(resource) else host + resource
        )


# ---------------------------------------------------------------- P8 truth table (Parser.py:26-46)


@pytest.mark.parametrize(
    "href,expected",
    [
        ("#section", ""),  # pure fragment dropped
        ("/a/b#sec", "https://h.io/a/b"),  # fragment stripped, root-relative
        ("/a/b", "https://h.io/a/b"),
        ("http://x.io/p", "https://x.io/p"),  # http → https rewrite
        ("https://x.io/p", "https://x.io/p"),
        ("sub/page.html", ""),  # relative dropped
        ("mailto:joe@x.com", ""),  # non-http scheme dropped
        ("javascript:void(0)", ""),
        ("", ""),
        ("   ", ""),
        # naive 4-char rewrite bug parity; P1 then adds the '/' empty path
        ("httpx://weird", "httpsx://weird/"),
    ],
)
def test_format_link(href, expected):
    assert format_link(href, "https://h.io") == expected


def test_first_href_token():
    # Parser.py:22 — href.split()[0]
    assert first_href_token("/a b c") == "/a"
    assert first_href_token("  /x  ") == "/x"
    assert first_href_token("   ") is None


# ---------------------------------------------------------------- F1 (Worker.py:13-30)


@pytest.mark.parametrize(
    "url,ok",
    [
        ("https://h.io/doc.pdf", False),
        ("https://h.io/pic.jpeg", False),
        ("https://h.io/pic.tiff", False),
        ("https://h.io/page.html", True),
        # literal last-3 check: 'mycsv' ends in 'csv' without a dot ⇒ rejected
        ("https://h.io/foo.mycsv", False),
        ("https://h.io/data-raw", False),  # ends in literal 'raw'
        ("https://h.io/", True),
        ("pdf", True),  # len(url) <= 3 short-circuits (Worker.py:24)
    ],
)
def test_extension_filter(url, ok):
    assert passes_extension_filter(url) == ok
