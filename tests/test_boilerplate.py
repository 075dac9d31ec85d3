"""jusText-style boilerplate classification (operators/boilerplate.py):
HTML block segmentation goldens, every context-free rule branch
hand-computed, the context-sensitive smoothing lattice, the composed
extract_content reassembly, and partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.boilerplate import (
    classify_blocks,
    extract_content,
    html_blocks,
)

HTML = (
    "<html><body>"
    "<div class='nav'><a href='/a'>Home page</a> <a href='/b'>About us</a></div>"
    "<p>the cat sat on the mat and looked to the window for a while.</p>"
    "<p>short one</p>"
    "<div>plain block without tags here</div>"
    "<p>see <a href='/x'>this link</a> inside prose</p>"
    "</body></html>"
)


@pytest.fixture(scope="module")
def blocks(spark):
    df = spark.createDataFrame([(1, HTML)], "doc_id long, html string")
    return html_blocks(df).orderBy("pos").collect()


def test_html_blocks_segmentation(blocks):
    texts = [r["text"] for r in blocks]
    assert texts == [
        "Home page About us",
        "the cat sat on the mat and looked to the window for a while.",
        "short one",
        "plain block without tags here",
        "see this link inside prose",
    ]
    assert [r["pos"] for r in blocks] == [0, 1, 2, 3, 4]


def test_html_blocks_link_chars(blocks):
    by_pos = {r["pos"]: r["link_chars"] for r in blocks}
    # nav block: "Home page" (9) + "About us" (8)
    assert by_pos[0] == 17
    # prose block: "this link" (9); plain blocks: none
    assert by_pos[4] == len("this link")
    assert by_pos[1] == by_pos[2] == by_pos[3] == 0


def _blk(doc, pos, text, link=0):
    return (doc, pos, text, link)


STOP_SENT = "the of and to in is on for with a"  # 10 stopwords, 33 chars
FILLER = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 words


@pytest.fixture(scope="module")
def classified(spark):
    rows = [
        # doc 1: every context-free branch, neighbours chosen so the
        # smoothing outcome is forced
        _blk(1, 0, " ".join([STOP_SENT] * 7)),  # 237c, 70w, 70 stop -> good
        _blk(1, 1, STOP_SENT + " " + FILLER),  # 90c, 20w, 10 stop=50% -> neargood
        _blk(1, 2, FILLER + " " + FILLER),  # 113c, 0 stop -> bad
        _blk(1, 3, "tiny block"),  # <70c, no link -> short (bad|bad edge -> drop)
        _blk(1, 4, "tiny linked", 2),  # <70c with link (under 20%) -> bad
        _blk(1, 5, FILLER + " " + FILLER, 40),  # link 40*100 > 20*113 -> bad
        # doc 2: smoothing on both sides
        _blk(2, 0, " ".join([STOP_SENT] * 7)),  # good
        _blk(2, 1, "tiny block"),  # short between goods -> keep
        _blk(2, 2, " ".join([STOP_SENT] * 7)),  # good
        _blk(2, 3, STOP_SENT + " " + FILLER),  # neargood, prev good -> keep
        _blk(2, 4, FILLER + " " + FILLER),  # bad
        _blk(2, 5, STOP_SENT + " " + FILLER),  # neargood, bad|edge -> drop
        # doc 3: short at the document edge next to good -> keep
        _blk(3, 0, "tiny block"),
        _blk(3, 1, " ".join([STOP_SENT] * 7)),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, pos long, text string, link_chars long"
    )
    out = classify_blocks(df).collect()
    return {(r["doc_id"], r["pos"]): r for r in out}


def test_context_free_classes(classified):
    cls = {k: r["cls"] for k, r in classified.items()}
    assert cls[(1, 0)] == "good"
    assert cls[(1, 1)] == "neargood"
    assert cls[(1, 2)] == "bad"
    assert cls[(1, 3)] == "short"
    assert cls[(1, 4)] == "bad"  # short length but linked
    assert cls[(1, 5)] == "bad"  # link density over 20%


def test_feature_columns_hand_computed(classified):
    r = classified[(1, 1)]
    assert (r["n_chars"], r["n_words"], r["stop_cnt"]) == (90, 20, 10)
    r0 = classified[(1, 0)]
    assert (r0["n_chars"], r0["n_words"], r0["stop_cnt"]) == (237, 70, 70)


def test_smoothing_lattice(classified):
    keep = {k: r["keep"] for k, r in classified.items()}
    # doc 1: neargood adjacent to good kept; short between bads dropped
    assert keep[(1, 0)] is True
    assert keep[(1, 1)] is True  # prev certain = good
    assert keep[(1, 2)] is False
    assert keep[(1, 3)] is False  # between bad and bad
    assert keep[(1, 4)] is False and keep[(1, 5)] is False
    # doc 2
    assert keep[(2, 1)] is True  # short between goods
    assert keep[(2, 3)] is True  # neargood, prev good
    assert keep[(2, 5)] is False  # neargood, prev bad, no next
    # doc 3: short at the edge, only certain neighbour is good
    assert keep[(3, 0)] is True


def test_extract_content_reassembles_in_order(spark):
    df = spark.createDataFrame([(7, HTML)], "doc_id long, html string")
    # thresholds relaxed so the prose blocks survive at test sizes
    out = extract_content(df, length_low=5, stop_low_pct=10, stop_high_pct=12,
                          length_high=40).collect()
    assert len(out) == 1
    # only the stopword-dense prose sentence survives (nav and anchor
    # blocks die on link density, the terse blocks on stopword density)
    assert out[0]["content"] == (
        "the cat sat on the mat and looked to the window for a while."
    )
    assert out[0]["n_content_blocks"] == 1


def test_partition_invariance(spark):
    rows = [
        (d, p, f"{STOP_SENT} word{d} word{p} filler text here", (d * p) % 7)
        for d in range(6)
        for p in range(5)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, pos long, text string, link_chars long"
    )
    a = sorted(map(tuple, classify_blocks(df.coalesce(1)).collect()))
    b = sorted(map(tuple, classify_blocks(df.repartition(13)).collect()))
    assert a == b


def test_plan_shape(spark):
    """html_blocks is shuffle-free; classify adds exactly the doc_id
    window exchange."""
    df = spark.createDataFrame([(1, HTML)], "doc_id long, html string")
    seg_plan = html_blocks(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in seg_plan
    cls_plan = (
        classify_blocks(html_blocks(df))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert cls_plan.count("Exchange hashpartitioning(doc_id") == 1
