"""IVF ANN — determinism, pruning, recall → 1 with n_probe."""

from __future__ import annotations

import numpy as np
import pytest

from webcrawler_spark.operators import ivf, similarity


@pytest.fixture(scope="module")
def vectors(spark):
    """60 vectors in 4 well-separated clusters of 15, dim 8."""
    rng = np.random.RandomState(11)
    anchors = np.eye(4).repeat(2, axis=1)  # 4 orthogonal directions, dim 8
    rows = []
    for i in range(60):
        c = i % 4
        v = anchors[c] + 0.05 * rng.rand(8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).cache()


def test_centroids_deterministic(vectors):
    c1 = ivf.train_centroids(vectors, n_centroids=4, sample_rows=60)
    c2 = ivf.train_centroids(vectors, n_centroids=4, sample_rows=60)
    assert np.array_equal(c1, c2)
    assert c1.shape == (4, 8)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_assignment_matches_clusters(vectors):
    """Well-separated clusters ⇒ every member of a planted cluster gets
    the same centroid_id (k-means recovers the planted structure)."""
    cent = ivf.train_centroids(vectors, n_centroids=4, sample_rows=60)
    assigned = ivf.assign_centroids(vectors, cent).collect()
    by_cluster = {}
    for r in assigned:
        by_cluster.setdefault(r["vec_id"] % 4, set()).add(r["centroid_id"])
    assert all(len(cids) == 1 for cids in by_cluster.values())
    assert len({next(iter(c)) for c in by_cluster.values()}) == 4


def test_single_probe_finds_in_cluster_neighbors(vectors):
    cent = ivf.train_centroids(vectors, n_centroids=4, sample_rows=60)
    q = vectors.filter("vec_id = 0").first()["embedding"]
    got = ivf.ivf_topk(vectors, cent, q, k=5, n_probe=1).collect()
    ids = [r["neighbor_id"] for r in got]
    assert ids[0] == 0
    assert all(i % 4 == 0 for i in ids)  # probe-1 stays inside cluster 0


def test_full_probe_equals_exact(vectors):
    """n_probe == k centroids ⇒ IVF degenerates to the exact scan —
    identical (id, sim, rank) rows. This is the oracle-checked path."""
    cent = ivf.train_centroids(vectors, n_centroids=4, sample_rows=60)
    q = vectors.filter("vec_id = 1").first()["embedding"]
    exact = similarity.cosine_topk(vectors, q, k=7).collect()
    full = ivf.ivf_topk(vectors, cent, q, k=7, n_probe=4).collect()
    assert [tuple(r) for r in full] == [tuple(r) for r in exact]


def test_recall_grows_with_probes(vectors):
    """recall(n_probe=4) ≥ recall(n_probe=1), and full probe = 1.0 —
    the scan-cost/recall dial IVF exists to provide."""
    cent = ivf.train_centroids(vectors, n_centroids=4, sample_rows=60)
    # query between clusters 0 and 1 so single-probe misses some truth
    v0 = np.array(vectors.filter("vec_id = 0").first()["embedding"])
    v1 = np.array(vectors.filter("vec_id = 1").first()["embedding"])
    q = [float(x) for x in (0.6 * v0 + 0.4 * v1)]
    truth = {
        r["neighbor_id"]
        for r in similarity.cosine_topk(vectors, q, k=10).collect()
    }
    rec = {}
    for p in (1, 2, 4):
        got = {
            r["neighbor_id"]
            for r in ivf.ivf_topk(vectors, cent, q, k=10, n_probe=p).collect()
        }
        rec[p] = len(got & truth) / len(truth)
    assert rec[1] <= rec[2] <= rec[4] == 1.0


def test_probe_ids_pure_driver():
    cent = np.eye(3)
    assert ivf.probe_ids(cent, [0.1, 0.9, 0.2], 2) == [1, 2]
    assert ivf.probe_ids(cent, [1.0, 0.0, 0.0], 1) == [0]


def test_sample_smaller_than_k_raises(vectors):
    with pytest.raises(ValueError):
        ivf.train_centroids(vectors.limit(2), n_centroids=4, sample_rows=60)
