"""SemDeDup laws (operators/semdedup.py): exact tier ≡ threshold
graph; clustered scale tier only ever *misses* pairs (candidates are
in-cluster), so its keep-set is a superset of the exact tier's."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from webcrawler_spark.operators import semdedup


@pytest.fixture(scope="module")
def emb(spark):
    # three planted duplicate groups around orthogonal axes + noise
    rng = np.random.default_rng(7)
    rows = []
    for vid in range(60):
        axis = vid % 3
        base = np.zeros(8)
        base[axis] = 1.0
        v = base + rng.normal(0, 0.05, 8)
        rows.append((vid, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def exact_groups(df, threshold):
    out = semdedup.semantic_dedup(df, threshold=threshold, n_clusters=1)
    return {r["vec_id"]: r["group"] for r in out.collect()}


def test_exact_tier_recovers_planted_groups(emb):
    groups = exact_groups(emb, 0.9)
    # every vec groups with the minimum id sharing its axis
    for vid, grp in groups.items():
        assert grp == vid % 3


def test_keeper_is_group_minimum(emb):
    out = semdedup.semantic_dedup(emb, threshold=0.9, n_clusters=1)
    kept = {r["vec_id"] for r in out.where("keep").collect()}
    assert kept == {0, 1, 2}


def test_high_threshold_keeps_everything(emb):
    out = semdedup.semantic_dedup(emb, threshold=1.1, n_clusters=1)
    assert out.where("keep").count() == 60


def test_clustered_tier_keep_superset(emb):
    exact_kept = {
        r["vec_id"]
        for r in semdedup.semantic_dedup(emb, threshold=0.9, n_clusters=1)
        .where("keep")
        .collect()
    }
    clustered_kept = {
        r["vec_id"]
        for r in semdedup.semantic_dedup(emb, threshold=0.9, n_clusters=6)
        .where("keep")
        .collect()
    }
    # clustering can only split groups (miss cross-cluster pairs),
    # never merge them -> at least as many survivors
    assert exact_kept <= clustered_kept


def test_clustered_pairs_subset_of_exact(emb):
    from webcrawler_spark.operators.ivf import train_centroids
    from webcrawler_spark.operators.semdedup import in_cluster_pairs
    from webcrawler_spark.operators.ivf import assign_centroids

    exact = {
        (r["a"], r["b"])
        for r in in_cluster_pairs(
            emb.withColumn("centroid_id", F.lit(0)), 0.9
        ).collect()
    }
    cents = train_centroids(emb, n_centroids=6, sample_rows=60)
    clustered = {
        (r["a"], r["b"])
        for r in in_cluster_pairs(assign_centroids(emb, cents), 0.9).collect()
    }
    assert clustered <= exact
    # k matched to the planted structure recovers every pair
    cents3 = train_centroids(emb, n_centroids=3, sample_rows=60)
    matched = {
        (r["a"], r["b"])
        for r in in_cluster_pairs(assign_centroids(emb, cents3), 0.9).collect()
    }
    assert matched == exact


def test_drop_semantic_duplicates_joins_back(emb):
    surv = semdedup.drop_semantic_duplicates(emb, threshold=0.9)
    assert {r["vec_id"] for r in surv.collect()} == {0, 1, 2}
    assert surv.columns == ["vec_id", "embedding"]
