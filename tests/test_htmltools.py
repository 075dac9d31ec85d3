"""Golden tests for HTML scalar semantics (SURVEY.md §5.2 layer 1).

Goldens encode bs4-`html.parser` behavior as documented at
/root/reference/Parser.py:13-24 (links), 48-55 (first-N words),
57-72 (visible text / tag_visible).
"""

from webcrawler_spark.functions.htmltools import (
    decode_html_bytes,
    extract_hrefs,
    first_n_words,
    page_title,
    visible_text,
)

PAGE = (
    "<html><head><title>My Title</title>"
    "<style>.x{color:red}</style>"
    "<script>var a=1;</script>"
    "<meta charset='utf-8'>"
    "</head><body>"
    "<!-- a comment -->"
    "<p>Hello <b>world</b></p>"
    "<a href='/next'>next page</a>"
    "</body></html>"
)


def test_visible_text_blocks_style_script_head_title_meta_comment():
    # text nodes in order: 'My Title'(title) '.x{..}'(style) 'var a=1;'(script)
    # comment, 'Hello '(p) 'world'(b) 'next page'(a)
    assert visible_text(PAGE) == "Hello world next page"


def test_visible_text_whitespace_nodes_contribute_separators():
    # bs4 keeps whitespace-only nodes; strip() makes them '' but the
    # " ".join still inserts separators — byte-identical invariant.
    html = "<html><body>\n<p>A</p>\n<p>B</p>\n</body></html>"
    assert visible_text(html) == " A  B "


def test_visible_text_meta_is_void():
    # text AFTER a <meta> must not inherit 'meta' as parent
    html = "<html><body><meta charset='x'>after meta</body></html>"
    assert visible_text(html) == "after meta"


def test_visible_text_outside_any_tag_is_document_parent():
    # bare text has parent [document] → blocked (Parser.py:67)
    assert visible_text("no tags at all") == ""


def test_visible_text_stray_end_tag_ignored():
    assert visible_text("<html><body></i>ok</body></html>") == "ok"


def test_extract_hrefs_first_token_and_dedup():
    html = (
        "<html><body>"
        "<a href='/a b'>1</a>"  # multi-token → first token (Parser.py:22)
        "<a href='/x'>2</a>"
        "<a href='/x'>dup</a>"  # set dedup (Parser.py:18)
        "<a href=''>empty</a>"  # blank skipped (Parser.py:21)
        "<a href='   '>ws</a>"  # whitespace-only skipped
        "<a>no href</a>"  # None skipped
        "<a href='#top'>frag kept raw here</a>"  # P8 drops it later, P7 keeps
        "</body></html>"
    )
    assert extract_hrefs(html) == ["#top", "/a", "/x"]


def test_title_and_first_n_words():
    assert page_title(PAGE) == "My Title"
    assert first_n_words("a  b\tc\nd e", 3) == "a b c"
    assert first_n_words("one two", 20) == "one two"


def test_decode_utf8_and_nonutf8():
    assert "café" in decode_html_bytes("<p>café</p>".encode("utf-8"))
    # non-utf8 bytes: the contract is charset_normalizer's best() verbatim
    # (Parser.py:8-11) — deterministic, but its guess on short snippets is
    # the library's business, not ours; we assert determinism + lossless len.
    latin = "<p>ação</p>".encode("iso-8859-1")
    out1, out2 = decode_html_bytes(latin), decode_html_bytes(latin)
    assert out1 == out2 and isinstance(out1, str) and len(out1) > 0


def test_entities_decoded():
    assert visible_text("<html><body><p>a &amp; b</p></body></html>") == "a & b"
