"""Recrawl-scheduling laws (operators/recrawl.py — Cho &
Garcia-Molina 2003 change-rate estimator).

Hand-computed λ̂ on a pinned history; monotonicity (more observed
changes ⇒ higher rate ⇒ higher staleness at equal age); single-fetch
URLs take the default prior; stats are partition-invariant.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.recrawl import recrawl_priority, url_change_stats


@pytest.fixture(scope="module")
def history(spark):
    rows = [
        # hot: changes on every revisit (4 fetches, 3 intervals, 3 changes)
        ("hot", 0, "a"), ("hot", 2, "b"), ("hot", 4, "c"), ("hot", 6, "d"),
        # cold: never changes (4 fetches, 3 intervals, 0 changes)
        ("cold", 0, "x"), ("cold", 2, "x"), ("cold", 4, "x"), ("cold", 6, "x"),
        # warm: one change in three intervals
        ("warm", 0, "p"), ("warm", 2, "p"), ("warm", 4, "q"), ("warm", 6, "q"),
        # fresh: a single fetch, no intervals yet
        ("fresh", 5, "z"),
    ]
    return spark.createDataFrame(rows, "url string, round int, digest string")


def test_change_stats_hand_computed(history):
    s = {r["url"]: r for r in url_change_stats(history).collect()}
    assert s["hot"]["n_fetches"] == 4
    assert s["hot"]["n_intervals"] == 3
    assert s["hot"]["n_changes"] == 3
    assert s["hot"]["mean_interval"] == pytest.approx(2.0)
    assert s["cold"]["n_changes"] == 0
    assert s["warm"]["n_changes"] == 1
    assert s["fresh"]["n_intervals"] == 0
    assert s["fresh"]["last_round"] == 5


def test_rate_estimator_formula(history):
    p = {r["url"]: r for r in recrawl_priority(history, now_round=8).collect()}
    # λ̂ = -ln((n - X + .5)/(n + .5)) / I with n=3, I=2
    assert p["hot"]["change_rate"] == pytest.approx(-math.log(0.5 / 3.5) / 2)
    assert p["cold"]["change_rate"] == pytest.approx(-math.log(3.5 / 3.5) / 2)
    assert p["warm"]["change_rate"] == pytest.approx(-math.log(2.5 / 3.5) / 2)
    assert p["fresh"]["change_rate"] == pytest.approx(0.1)  # default prior


def test_staleness_ordering(history):
    p = {r["url"]: r for r in recrawl_priority(history, now_round=8).collect()}
    # all three revisited urls share age=2; staleness follows the rate
    assert p["hot"]["age"] == p["cold"]["age"] == p["warm"]["age"] == 2
    assert p["hot"]["p_stale"] > p["warm"]["p_stale"] > p["cold"]["p_stale"]
    assert p["cold"]["p_stale"] == pytest.approx(0.0)
    # poisson law: p = 1 - exp(-λ·age)
    lam = p["hot"]["change_rate"]
    assert p["hot"]["p_stale"] == pytest.approx(1 - math.exp(-lam * 2))


def test_partition_invariance(history):
    a = sorted(map(tuple, url_change_stats(history).collect()))
    b = sorted(map(tuple, url_change_stats(history.repartition(7)).collect()))
    assert a == b
