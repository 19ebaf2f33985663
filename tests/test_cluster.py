"""Spectral clustering (apps/cluster.py)."""

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.apps.cluster import (
    rbf_affinity,
    spectral_cluster,
)


def _accuracy(labels, truth, k):
    """Best label-permutation accuracy (clustering labels are arbitrary)."""
    from itertools import permutations

    labels = np.asarray(labels)
    best = 0.0
    for perm in permutations(range(k)):
        mapped = np.asarray([perm[c] for c in labels])
        best = max(best, float(np.mean(mapped == truth)))
    return best


class TestSpectralCluster:
    def test_two_moons(self):
        sklearn_datasets = pytest.importorskip("sklearn.datasets")
        x, y = sklearn_datasets.make_moons(n_samples=400, noise=0.05,
                                           random_state=0)
        res = spectral_cluster(x, n_clusters=2, affinity="knn", seed=0)
        assert _accuracy(res.labels, y, 2) > 0.99
        # full-RBF with a tuned bandwidth also separates, less robustly
        res_rbf = spectral_cluster(x, n_clusters=2, gamma=10.0, seed=0)
        assert _accuracy(res_rbf.labels, y, 2) > 0.95

    def test_gaussian_blobs_three_way(self):
        rng = np.random.default_rng(1)
        centers = np.asarray([[0.0, 0.0], [6.0, 0.0], [0.0, 6.0]])
        truth = np.repeat(np.arange(3), 120)
        x = centers[truth] + 0.5 * rng.standard_normal((360, 2))
        res = spectral_cluster(x, n_clusters=3, seed=0)
        assert _accuracy(res.labels, truth, 3) > 0.98

    def test_precomputed_block_affinity(self):
        """A two-block affinity matrix must split exactly."""
        n = 60
        w = np.zeros((2 * n, 2 * n))
        w[:n, :n] = 1.0
        w[n:, n:] = 1.0
        np.fill_diagonal(w, 0.0)
        truth = np.repeat([0, 1], n)
        res = spectral_cluster(w, n_clusters=2, affinity="precomputed",
                               seed=0)
        assert _accuracy(res.labels, truth, 2) == 1.0

    def test_embedding_shape_and_normalization(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((100, 3))
        res = spectral_cluster(x, n_clusters=4, seed=0)
        assert res.embedding.shape == (100, 4)
        norms = np.linalg.norm(np.asarray(res.embedding), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-6)
        assert set(np.unique(np.asarray(res.labels))) <= set(range(4))

    def test_affinity_properties(self):
        rng = np.random.default_rng(3)
        x = rng.standard_normal((50, 2))
        w = np.asarray(rbf_affinity(x))
        np.testing.assert_allclose(w, w.T, atol=1e-12)
        np.testing.assert_allclose(np.diag(w), 0.0)
        assert np.all(w >= 0) and np.all(w <= 1)

    def test_randomized_solver_on_gapped_graph(self):
        """Compact well-separated blobs give the normalized affinity a
        real spectral gap — the regime where the randomized eigensolver
        path is safe."""
        rng = np.random.default_rng(5)
        centers = np.asarray([[0.0, 0.0], [8.0, 0.0]])
        truth = np.repeat(np.arange(2), 100)
        x = centers[truth] + 0.4 * rng.standard_normal((200, 2))
        res = spectral_cluster(x, n_clusters=2, eig_solver="randomized",
                               seed=0)
        assert _accuracy(res.labels, truth, 2) > 0.99

    def test_unknown_affinity_raises(self):
        with pytest.raises(ValueError):
            spectral_cluster(np.zeros((4, 2)), 2, affinity="cosine")
        with pytest.raises(ValueError):
            spectral_cluster(np.zeros((4, 2)), 2, eig_solver="arpack")
