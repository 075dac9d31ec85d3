"""Crawler-trap detection laws (operators/traps.py)."""

from __future__ import annotations

import pytest

from webcrawler_spark.operators.traps import trap_host_stats


@pytest.fixture(scope="module")
def pages(spark):
    rows = []
    # honest host: 12 urls, 12 distinct pages
    rows += [("good.example", f"https://good.example/p{i}", f"page {i}") for i in range(12)]
    # session-id trap: 20 urls, one page
    rows += [("trap.example", f"https://trap.example/cal?sid={i}", "same page") for i in range(20)]
    # small host: 100% dup but under min_urls -> not flagged
    rows += [("tiny.example", f"https://tiny.example/{i}", "dup") for i in range(3)]
    # refetched url (duplicate rows) must not inflate n_urls
    rows += [("good.example", "https://good.example/p0", "page 0")]
    return spark.createDataFrame(rows, "host string, url string, text string")


def test_trap_flagging(pages):
    out = {r["host"]: r for r in trap_host_stats(pages).collect()}
    assert out["trap.example"]["is_trap"]
    assert out["trap.example"]["n_urls"] == 20
    assert out["trap.example"]["n_contents"] == 1
    assert not out["good.example"]["is_trap"]
    assert out["good.example"]["dup_url_frac"] == 0.0
    assert not out["tiny.example"]["is_trap"]  # min_urls gate


def test_refetch_does_not_count_twice(pages):
    out = {r["host"]: r for r in trap_host_stats(pages).collect()}
    assert out["good.example"]["n_urls"] == 12


def test_thresholds_are_tunable(pages):
    out = {
        r["host"]: r
        for r in trap_host_stats(pages, min_urls=2, dup_threshold=0.6).collect()
    }
    assert out["tiny.example"]["is_trap"]
