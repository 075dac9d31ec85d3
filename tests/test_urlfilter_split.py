"""URL filtering (RefinedWeb-style blocklist + word score) and
cluster-aware leakage-safe splitting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.urlfilter import (
    ancestor_domains,
    url_filter,
    word_score_col,
)
from webcrawler_spark.operators.mixing import leakage_safe_split


def _bl(spark, *domains):
    return spark.createDataFrame([(d,) for d in domains], "domain string")


def test_ancestor_domains(spark):
    df = spark.createDataFrame(
        [("a.b.example.com",), ("example.com",), ("localhost",)], "h string"
    )
    got = {
        r["h"]: r["anc"]
        for r in df.select("h", ancestor_domains(F.col("h")).alias("anc")).collect()
    }
    assert got["a.b.example.com"] == [
        "a.b.example.com",
        "b.example.com",
        "example.com",
    ]
    assert got["example.com"] == ["example.com"]  # never the bare TLD
    assert got["localhost"] == ["localhost"]


def test_url_filter_domain_rules(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://bad.example/x"),          # exact block
            (2, "https://sub.bad.example/x"),      # subdomain block
            (3, "https://deep.sub.bad.example/x"), # deeper subdomain block
            (4, "https://notbad.example/x"),       # suffix of the NAME, not a subdomain
            (5, "https://good.example/x"),
        ],
        "doc_id int, url string",
    )
    out = {
        r["doc_id"]: (r["domain_blocked"], r["keep"])
        for r in url_filter(urls, _bl(spark, "bad.example"), {}).collect()
    }
    assert out[1] == (True, False)
    assert out[2] == (True, False)
    assert out[3] == (True, False)
    assert out[4] == (False, True)
    assert out[5] == (False, True)


def test_url_filter_word_score(spark):
    urls = spark.createDataFrame(
        [
            (1, "https://h.example/CASINO"),        # case-insensitive, 0.5
            (2, "https://h.example/casino-poker"),  # 0.75 >= 0.625 -> drop
            (3, "https://h.example/clean"),
        ],
        "doc_id int, url string",
    )
    out = {
        r["doc_id"]: (r["word_score"], r["keep"])
        for r in url_filter(
            urls, _bl(spark, "other.example"), {"casino": 0.5, "poker": 0.25},
            threshold=0.625,
        ).collect()
    }
    assert out[1] == (0.5, True)
    assert out[2] == (0.75, False)
    assert out[3] == (0.0, True)
    # boundary: score == threshold is a drop (< threshold keeps)
    at = url_filter(
        urls, _bl(spark, "other.example"), {"casino": 0.5}, threshold=0.5
    )
    assert {r["doc_id"]: r["keep"] for r in at.collect()}[1] is False


def test_url_filter_plan_broadcasts_blocklist(spark):
    urls = spark.createDataFrame(
        [(i, f"https://h{i}.example/x") for i in range(10)],
        "doc_id int, url string",
    )
    plan = (
        url_filter(urls, _bl(spark, "bad.example"), {"w": 1.0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_leakage_split_clusters_share_split(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base + " one"),
            (1, base + " two"),          # near-dup of 0
            (2, "totally different words nothing shared here at all xx yy"),
            (3, base + " three"),        # near-dup of 0/1
        ],
        "doc_id long, text string",
    )
    out = leakage_safe_split(docs, threshold=0.2).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 4  # every doc assigned
    comp = {r["doc_id"]: r["component"] for r in out}
    assert comp[0] == comp[1] == comp[3]
    split = {r["doc_id"]: r["split"] for r in out}
    assert split[0] == split[1] == split[3]  # the leakage guarantee
    assert set(split.values()) <= {"train", "val", "test"}


def test_leakage_split_bad_rates_raise(spark):
    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        leakage_safe_split(docs, splits=(("train", 0.5), ("val", 0.1)))
