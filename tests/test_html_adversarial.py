"""Adversarial / malformed-markup recovery behavior (P6/P7/P9/P11).

The reference parses with BeautifulSoup's ``html.parser`` builder
(Parser.py:9-11); this repo walks the same stdlib ``HTMLParser``
tokenizer directly (htmltools.py). The *tokenizer* is therefore shared
— divergence can only come from tree-building recovery (parent
attribution for text nodes after misnesting). These tests pin the
engine's recovery behavior on the classic malformed constructs so any
future change to the walk is a visible diff, and document per-case
where bs4's recovery could attribute parents differently.

Plus a fuzz section: arbitrary byte soup must never raise and must
keep the output types stable (the crawl executor feeds untrusted web
bytes straight into these functions).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webcrawler_spark.functions.htmltools import (
    decode_html_bytes,
    extract_hrefs,
    page_title,
    visible_text,
)


# ---------------------------------------------------------------------------
# pinned recovery catalogue
# ---------------------------------------------------------------------------
# (name, html, expected_visible_text, expected_hrefs, expected_title)
CASES = [
    (
        "unclosed_tags",
        "<html><body><p>one<p>two<div>three",
        "one two three",
        [],
        None,
    ),
    (
        "stray_end_tags",
        "</div></p>text</span>",
        # text before any open tag is '[document]'-parented → invisible
        # (reference blocklist includes '[document]', Parser.py:67-68)
        "",
        [],
        None,
    ),
    (
        "misnested_inline",
        # <b><i></b></i>: endtag 'b' pops to the matching open 'b'
        # (taking 'i' with it); trailing text is parented by 'p'.
        # bs4's html.parser builder recovers identically here.
        "<p><b>bold<i>both</b>after</p>",
        "bold both after",
        [],
        None,
    ),
    (
        "script_with_lt",
        # CDATA content: '<' inside <script> is raw text of the script
        # element → invisible
        "<script>if (a < b) { x() }</script><p>seen</p>",
        "seen",
        [],
        None,
    ),
    (
        "style_block",
        "<style>p { color: red }</style><p>body</p>",
        "body",
        [],
        None,
    ),
    (
        "unterminated_comment",
        # html.parser treats an unterminated comment as swallowing the
        # rest of the document (same for bs4 on the same tokenizer)
        "<p>before</p><!-- open comment <p>lost</p>",
        "before",
        [],
        None,
    ),
    (
        "unquoted_attrs",
        "<a href=/x>l</a><a href = '/y'>m</a>",
        "l m",
        ["/x", "/y"],
        None,
    ),
    (
        "nested_anchor",
        # nested <a> is illegal; tokenizer still emits both starttags
        "<a href='/outer'>o<a href='/inner'>i</a></a>",
        "o i",
        ["/inner", "/outer"],
        None,
    ),
    (
        "null_bytes_and_controls",
        "<p>a\x00b\x01c</p>",
        "a\x00b\x01c",
        [],
        None,
    ),
    (
        "bad_entity",
        # unknown entity: convert_charrefs leaves '&notit;' semantics
        # to the tokenizer — pin whatever it does ('&not' resolves)
        "<p>x &notit; y</p>",
        "x ¬it; y",
        [],
        None,
    ),
    (
        "title_in_body",
        "<body><title>late</title><p>t</p></body>",
        "t",
        [],
        "late",
    ),
    (
        "two_titles",
        "<title>first</title><title>second</title>",
        "",
        [],
        "first",
    ),
    (
        "void_elements_no_phantom_parent",
        # meta/br/img emit no endtag event; they must not become the
        # parent of later text (the _VOID guard)
        "<meta charset='utf-8'><br><img src=x><p>vis</p>",
        "vis",
        [],
        None,
    ),
    (
        "self_closing_a",
        "<a href='/only' /><p>t</p>",
        "t",
        ["/only"],
        None,
    ),
    (
        "cdata_marked_section",
        # real html.parser surfaces <![CDATA[..]]> as a bogus comment →
        # invisible either way
        "<p>a</p><![CDATA[hidden]]><p>b</p>",
        "a b",
        [],
        None,
    ),
    (
        "whitespace_only_nodes_keep_separator",
        # byte-identical invariant: a whitespace node inside a visible
        # parent strips to '' but still contributes a join separator
        # (Parser.py:71-72); note top-level whitespace ('[document]'
        # parent) is blocklisted instead
        "<div><p>a</p> \n <p>b</p></div>",
        "a  b",
        [],
        None,
    ),
]


@pytest.mark.parametrize(
    "name,html,text,hrefs,title", CASES, ids=[c[0] for c in CASES]
)
def test_malformed_recovery_pinned(name, html, text, hrefs, title):
    assert visible_text(html) == text
    assert extract_hrefs(html) == hrefs
    assert page_title(html) == title


# ---------------------------------------------------------------------------
# fuzz: never raise, stable output types
# ---------------------------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_byte_soup_never_raises(raw):
    s = decode_html_bytes(raw)
    assert isinstance(s, str)
    t = visible_text(s)
    assert isinstance(t, str)
    hs = extract_hrefs(s)
    assert isinstance(hs, list) and all(isinstance(h, str) for h in hs)
    ti = page_title(s)
    assert ti is None or isinstance(ti, str)


@settings(max_examples=100, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>/ab c='\"&#;!-x")), max_size=256
    )
)
def test_tag_soup_never_raises(s):
    visible_text(s)
    extract_hrefs(s)
    page_title(s)
