"""OPIC laws (operators/graph.opic — Abiteboul et al. 2003).

Invariants: total cash is conserved at 1 every round; total history
grows by exactly 1 per round; hand-unrolled rounds on tiny graphs
match; the importance estimate ranks an in-link-heavy node first.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators.graph import opic


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_two_cycle_is_stationary(spark):
    out = opic(_edges(spark, [("a", "b"), ("b", "a")]), n_iter=4)
    rows = {r["node"]: r for r in out.collect()}
    for v in ("a", "b"):
        assert rows[v]["cash"] == pytest.approx(0.5)
        assert rows[v]["history"] == pytest.approx(2.0)  # 4 rounds × 0.5
        assert rows[v]["importance"] == pytest.approx(0.5)


def test_hand_unrolled_dangling_round(spark):
    # a→b, b dangling; n=2, init cash (.5, .5)
    # round 1: hist=(.5,.5); contrib(b)=.5; D=.5; cash=(0+.25, .5+.25)
    out = opic(_edges(spark, [("a", "b")]), n_iter=1)
    rows = {r["node"]: r for r in out.collect()}
    assert rows["a"]["cash"] == pytest.approx(0.25)
    assert rows["b"]["cash"] == pytest.approx(0.75)
    assert rows["a"]["history"] == pytest.approx(0.5)
    assert rows["b"]["history"] == pytest.approx(0.5)
    # importance = (hist + cash) / (T + 1)
    assert rows["b"]["importance"] == pytest.approx((0.5 + 0.75) / 2)


def test_conservation(spark):
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("d", "a"), ("e", "a")]
    out = opic(_edges(spark, pairs), n_iter=7, checkpoint_every=3)
    agg = out.agg(F.sum("cash"), F.sum("history"), F.sum("importance")).collect()[0]
    assert agg[0] == pytest.approx(1.0)
    assert agg[1] == pytest.approx(7.0)
    assert agg[2] == pytest.approx(1.0)


def test_inlink_heavy_node_ranks_first(spark):
    # every spoke points at the hub; hub returns cash to one spoke
    pairs = [(f"s{i}", "hub") for i in range(5)] + [("hub", "s0")]
    out = opic(_edges(spark, pairs), n_iter=10)
    top = out.orderBy(F.col("importance").desc()).first()
    assert top["node"] == "hub"


def test_empty_graph(spark):
    out = opic(_edges(spark, []), n_iter=3)
    assert out.count() == 0
    assert out.columns == ["node", "cash", "history", "importance"]
