"""Unit tests for the C4 line filter, per-domain cap, and sitemap
parser (the round-3 cleaning/source additions)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.functions.sitemap import extract_sitemap_urls
from webcrawler_spark.operators.cleaning import c4_line_filter
from webcrawler_spark.operators.mixing import domain_cap


# ---------------------------------------------------------------------------
# c4_line_filter
# ---------------------------------------------------------------------------


def _c4(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = c4_line_filter(df, **kw).collect()
    return {r.doc_id: r for r in out}


def test_c4_line_rules(spark):
    rows = [
        # kept: terminal '.', 3 words
        (1, "one two three."),
        # dropped line: no terminal punctuation
        (2, "one two three"),
        # dropped line: only 2 words
        (3, "one two."),
        # dropped line: banned word (case-insensitive)
        (4, "enable JavaScript to view this."),
        # mixed: first kept, second dropped
        (5, "good line stays here.\nshort no."),
    ]
    got = _c4(spark, rows)
    assert got[1].keep and got[1].clean_text == "one two three."
    assert not got[2].keep and got[2].n_kept == 0 and got[2].clean_text == ""
    assert not got[3].keep
    assert not got[4].keep
    assert got[5].keep
    assert got[5].clean_text == "good line stays here."
    assert (got[5].n_lines, got[5].n_kept) == (2, 1)


def test_c4_terminal_variants(spark):
    rows = [(1, 'is it done?'), (2, "yes it is!"), (3, 'she said "stop here"')]
    got = _c4(spark, rows)
    assert got[1].keep and got[2].keep and got[3].keep


def test_c4_doc_bans(spark):
    rows = [
        (1, "lorem ipsum dolor sit amet."),
        (2, "function f() { return 1; } is code."),
        (3, "a perfectly ordinary sentence."),
    ]
    got = _c4(spark, rows)
    assert not got[1].keep and not got[2].keep and got[3].keep
    # ban is doc-level: the lines themselves still counted/kept in clean_text
    assert got[1].n_kept == 1


def test_c4_min_kept_lines(spark):
    rows = [(1, "only one good line here.")]
    got = _c4(spark, rows, min_kept_lines=2)
    assert not got[1].keep and got[1].n_kept == 1


# ---------------------------------------------------------------------------
# domain_cap
# ---------------------------------------------------------------------------


def _cap_df(spark, n_hosts=3, per_host=20):
    rows = [
        (h * 1000 + i, f"h{h}", float((i * 7) % per_host))
        for h in range(n_hosts)
        for i in range(per_host)
    ]
    return spark.createDataFrame(rows, "doc_id long, host string, score double")


def test_domain_cap_law(spark):
    df = _cap_df(spark)
    out = domain_cap(df, host_col="host", k=5, score_col="score").collect()
    by_host = {}
    for r in out:
        by_host.setdefault(r.host, []).append(r)
    assert set(by_host) == {"h0", "h1", "h2"}
    for host, rs in by_host.items():
        assert len(rs) == 5
        ranks = sorted(r.host_rank for r in rs)
        assert ranks == [1, 2, 3, 4, 5]
        # kept docs are exactly the top-5 by (score desc, doc_id)
        full = sorted(
            df.filter(F.col("host") == host).collect(),
            key=lambda r: (-r.score, r.doc_id),
        )[:5]
        assert sorted(r.doc_id for r in rs) == sorted(r.doc_id for r in full)


def test_domain_cap_parallelism_invariant(spark):
    df = _cap_df(spark, n_hosts=4, per_host=17)
    a = domain_cap(df.repartition(1), host_col="host", k=3, score_col="score")
    b = domain_cap(df.repartition(16), host_col="host", k=3, score_col="score")
    ka = sorted((r.host, r.host_rank, r.doc_id) for r in a.collect())
    kb = sorted((r.host, r.host_rank, r.doc_id) for r in b.collect())
    assert ka == kb


def test_domain_cap_under_k_host_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "tiny", 1.0), (2, "tiny", 2.0)], "doc_id long, host string, score double"
    )
    out = domain_cap(df, host_col="host", k=10, score_col="score").collect()
    assert len(out) == 2


# ---------------------------------------------------------------------------
# extract_sitemap_urls
# ---------------------------------------------------------------------------


def _parse(spark, xml, **kw):
    df = spark.createDataFrame([(1, xml)], "sitemap_id long, xml string")
    return extract_sitemap_urls(df, **kw).orderBy("pos").collect()


def test_sitemap_basic_and_trim(spark):
    xml = (
        "<urlset>"
        "<url><loc>  https://a.example/1  </loc></url>"
        "<url><loc>https://a.example/2</loc>"
        "<lastmod>2026-01-05</lastmod></url>"
        "</urlset>"
    )
    rows = _parse(spark, xml)
    assert [(r.pos, r.loc, r.lastmod) for r in rows] == [
        (0, "https://a.example/1", None),
        (1, "https://a.example/2", "2026-01-05"),
    ]


def test_sitemap_multiline_and_missing_loc(spark):
    xml = (
        "<urlset>\n"
        "  <url>\n    <loc>\n      https://b.example/x\n    </loc>\n  </url>\n"
        "  <url><lastmod>2025-12-31</lastmod></url>\n"  # no loc: dropped
        "</urlset>\n"
    )
    rows = _parse(spark, xml)
    assert len(rows) == 1
    assert rows[0].loc == "https://b.example/x"


def test_sitemap_index_blocks(spark):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://c.example/sitemap1.xml</loc></sitemap>"
        "<sitemap><loc>https://c.example/sitemap2.xml</loc>"
        "<lastmod>2026-02-02</lastmod></sitemap>"
        "</sitemapindex>"
    )
    rows = _parse(spark, xml, block="sitemap")
    assert [r.loc for r in rows] == [
        "https://c.example/sitemap1.xml",
        "https://c.example/sitemap2.xml",
    ]
    assert rows[1].lastmod == "2026-02-02"


def test_sitemap_empty_and_garbage(spark):
    assert _parse(spark, "") == []
    assert _parse(spark, "<urlset><url></url></urlset>") == []
    assert _parse(spark, "not xml at all") == []


# ---------------------------------------------------------------------------
# remove_duplicate_spans (Lee et al. 2022 cut step)
# ---------------------------------------------------------------------------

from webcrawler_spark.operators.dedup import remove_duplicate_spans


def _spans(spark, rows, k, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = remove_duplicate_spans(df, k=k, **kw).collect()
    return {r.doc_id: r for r in out}


def test_span_removal_verbatim_duplicate_pair(spark):
    txt = "a b c d e f"
    got = _spans(spark, [(1, txt), (2, txt), (3, "x y z w v u")], k=3)
    # every 3-gram of the duplicated doc occurs twice -> whole doc cut
    assert got[1].clean_text == "" and got[1].n_removed == 6
    assert got[2].clean_text == "" and got[2].n_spans == 1
    # the unique doc is untouched
    assert got[3].clean_text == "x y z w v u" and got[3].n_removed == 0


def test_span_removal_merges_overlapping_windows(spark):
    # docs share the 5-token span "p q r s t": three duplicated
    # 3-gram positions per doc merge into ONE maximal span of 5
    got = _spans(
        spark,
        [(1, "a1 b1 p q r s t c1 d1"), (2, "a2 p q r s t b2 c2 d2")],
        k=3,
    )
    for d in (1, 2):
        assert got[d].n_spans == 1
        assert got[d].n_removed == 5
        assert "p" not in got[d].clean_text.split()
        assert "q r s t".split()[0] not in got[d].clean_text.split()
    assert got[1].clean_text == "a1 b1 c1 d1"
    assert got[2].clean_text == "a2 b2 c2 d2"


def test_span_removal_short_docs_have_no_grams(spark):
    got = _spans(spark, [(1, "a b"), (2, "a b")], k=3)
    assert got[1].clean_text == "a b" and got[1].n_removed == 0


def test_span_removal_parallelism_invariant(spark):
    rows = [(i, f"w{i % 7} common tail span here x{i} y{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = remove_duplicate_spans(df.repartition(1), k=3).collect()
    b = remove_duplicate_spans(df.repartition(16), k=3).collect()
    ka = sorted((r.doc_id, r.clean_text, r.n_removed, r.n_spans) for r in a)
    kb = sorted((r.doc_id, r.clean_text, r.n_removed, r.n_spans) for r in b)
    assert ka == kb


def test_span_removal_native_hash_tier_matches(spark):
    rows = [(i, f"alpha beta gamma delta {i % 5} epsilon zeta") for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = {r.doc_id: r.clean_text for r in remove_duplicate_spans(df, k=3).collect()}
    b = {
        r.doc_id: r.clean_text
        for r in remove_duplicate_spans(df, k=3, native_hash=True).collect()
    }
    assert a == b
