"""Graph operators: connected components, duplicate clustering, PageRank."""

from __future__ import annotations

import random

import pytest

from webcrawler_spark.operators import graph


# ---------------------------------------------------------------------------
# reference implementations (pure python)
# ---------------------------------------------------------------------------


def uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """node -> min node id of its component, via union-find."""
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def ref_pagerank(
    edges: list[tuple[int, int]], alpha: float, n_iter: int
) -> dict[int, float]:
    """Same update law as graph.pagerank, dense python floats."""
    edges = sorted(set(edges))
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, d in edges:
        out.setdefault(s, []).append(d)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(rank[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            share = rank[s] / len(ds)
            for d in ds:
                contrib[d] += share
        rank = {
            v: (1.0 - alpha) / n + alpha * (contrib[v] + dangling / n)
            for v in nodes
        }
    return rank


def _cc(spark, edges: list[tuple[int, int]], **kw) -> dict[int, int]:
    df = spark.createDataFrame(edges, "a long, b long")
    rows = graph.connected_components(df, "a", "b", **kw).collect()
    return {r["node"]: r["component"] for r in rows}


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------


def test_cc_two_triangles(spark):
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12)]
    assert _cc(spark, edges) == uf_components(edges)


def test_cc_long_chain_needs_multiple_rounds(spark):
    # diameter 19: exercises the iterate-until-stable loop, not one pass
    edges = [(i, i + 1) for i in range(20)]
    got = _cc(spark, edges)
    assert got == {i: 0 for i in range(21)}


def test_cc_star_hub_is_not_min(spark):
    # hub has the LARGEST id: large-star must still pull spokes to min
    edges = [(100, i) for i in range(5)]
    got = _cc(spark, edges)
    assert got == {**{i: 0 for i in range(5)}, 100: 0}


def test_cc_self_loops_and_duplicates_ignored(spark):
    edges = [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)]
    got = _cc(spark, edges)
    # 3 appears only in a self loop -> not connected to anything; the
    # operator reports nodes of real edges only
    assert got == {1: 1, 2: 1}


def test_cc_empty(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert graph.connected_components(df, "a", "b").count() == 0


def test_cc_random_graphs_match_union_find(spark):
    rng = random.Random(0xC0FFEE)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        assert _cc(spark, edges) == uf_components(edges), f"trial {trial}"


def test_cc_parquet_checkpoint_dir(spark, tmp_path):
    edges = [(i, i + 1) for i in range(10)]
    got = _cc(spark, edges, checkpoint_dir=str(tmp_path))
    assert got == {i: 0 for i in range(11)}


# ---------------------------------------------------------------------------
# duplicate clustering
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy cat tonight"),  # ~0
        (2, "the quick brown fox jumps over the lazy rat tonight"),  # ~0,1
        (3, "spark engines shuffle partitions across the big cluster"),
        (4, "spark engines shuffle partitions across the huge cluster"),  # ~3
        (5, "completely unrelated text with no overlap whatsoever here"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_duplicate_clusters_chain_and_singletons(near_dup_docs):
    got = {
        r["doc_id"]: r["component"]
        for r in graph.duplicate_clusters(near_dup_docs, threshold=0.2).collect()
    }
    assert len(got) == 6
    # 0-1-2 chain into one cluster rooted at 0; 3-4 at 3; 5 singleton
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == got[4] == 3
    assert got[5] == 5


def test_drop_near_duplicates_keeps_cluster_minimum(near_dup_docs):
    kept = sorted(
        r["doc_id"]
        for r in graph.drop_near_duplicates(near_dup_docs, threshold=0.2)
        .select("doc_id")
        .collect()
    )
    assert kept == [0, 3, 5]


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def _pr(spark, edges, **kw) -> dict[int, float]:
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = graph.pagerank(df, **kw).collect()
    return {r["node"]: r["rank"] for r in rows}


def test_pagerank_cycle_is_uniform(spark):
    n = 5
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _pr(spark, edges, n_iter=10)
    for v in got.values():
        assert abs(v - 1.0 / n) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_dangling_mass_conserved(spark):
    # node 3 has no out-edges: its mass must redistribute, total stays 1
    edges = [(1, 2), (2, 3), (1, 3)]
    got = _pr(spark, edges, n_iter=20)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert got[3] > got[2] > got[1]


def test_pagerank_matches_reference_on_random_digraph(spark):
    rng = random.Random(7)
    n = 25
    edges = list(
        {(rng.randrange(n), rng.randrange(n)) for _ in range(80)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    got = _pr(spark, edges, alpha=0.85, n_iter=8, checkpoint_every=3)
    want = ref_pagerank(edges, 0.85, 8)
    assert set(got) == set(want)
    for v in got:
        assert abs(got[v] - want[v]) < 1e-9, v
