"""Kernel PCA (apps/kpca.py): sklearn parity (exact solver), randomized
solver agreement, transform/score consistency, kernel algebra."""

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.apps.kpca import (
    KernelPCA,
    kernel_matrix,
    rff_features,
)


def _two_rings(n, seed=0):
    """Classic nonlinearly-separable data: two concentric rings."""
    rng = np.random.default_rng(seed)
    theta = rng.uniform(0, 2 * np.pi, n)
    r = np.where(np.arange(n) % 2 == 0, 1.0, 3.0)
    pts = np.stack([r * np.cos(theta), r * np.sin(theta)], axis=1)
    return pts + 0.05 * rng.standard_normal((n, 2))


class TestKernelMatrix:
    @pytest.mark.parametrize("kernel,kw", [
        ("rbf", dict(gamma=0.7)),
        ("linear", {}),
        ("poly", dict(gamma=0.5, degree=2, coef0=1.5)),
    ])
    def test_matches_sklearn(self, kernel, kw):
        from sklearn.metrics.pairwise import pairwise_kernels

        rng = np.random.default_rng(1)
        x, y = rng.standard_normal((40, 5)), rng.standard_normal((25, 5))
        got = np.asarray(kernel_matrix(x, y, kernel, **kw))
        want = pairwise_kernels(x, y, metric=kernel, **kw)
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


class TestKernelPCA:
    def test_exact_matches_sklearn(self):
        from sklearn.decomposition import KernelPCA as SkKPCA

        x = _two_rings(120, seed=2)
        ours = KernelPCA(4, kernel="rbf", gamma=0.8, solver="exact").fit(x)
        sk = SkKPCA(n_components=4, kernel="rbf", gamma=0.8).fit(x)
        np.testing.assert_allclose(np.asarray(ours.eigenvalues_),
                                   sk.eigenvalues_, rtol=1e-6)
        # scores match up to per-component sign
        z_ours = np.asarray(ours.scores_)
        z_sk = sk.transform(x)
        for j in range(4):
            d = min(np.abs(z_ours[:, j] - z_sk[:, j]).max(),
                    np.abs(z_ours[:, j] + z_sk[:, j]).max())
            assert d < 1e-6, (j, d)

    def test_transform_of_train_equals_scores(self):
        x = _two_rings(80, seed=3)
        kp = KernelPCA(3, kernel="rbf", gamma=0.5, solver="exact").fit(x)
        np.testing.assert_allclose(np.asarray(kp.transform(x)),
                                   np.asarray(kp.scores_),
                                   rtol=1e-5, atol=1e-8)

    def test_randomized_agrees_with_exact(self):
        x = _two_rings(200, seed=4)
        exact = KernelPCA(4, kernel="rbf", gamma=0.8, solver="exact").fit(x)
        rand = KernelPCA(4, kernel="rbf", gamma=0.8, solver="randomized",
                         p=16).fit(x)
        np.testing.assert_allclose(np.asarray(rand.eigenvalues_),
                                   np.asarray(exact.eigenvalues_),
                                   rtol=1e-5)
        a, b = np.asarray(exact.alphas_), np.asarray(rand.alphas_)
        overlap = np.abs(np.diag(a.T @ b))
        assert overlap.min() > 0.999

    def test_nystrom_one_pass_is_close(self):
        # the ONE-pass sketch is biased low on slow spectra; generous
        # oversampling brings it within a percent — the documented trade
        x = _two_rings(200, seed=4)
        exact = KernelPCA(4, kernel="rbf", gamma=0.8, solver="exact").fit(x)
        ny = KernelPCA(4, kernel="rbf", gamma=0.8, solver="nystrom",
                       p=64).fit(x)
        np.testing.assert_allclose(np.asarray(ny.eigenvalues_),
                                   np.asarray(exact.eigenvalues_),
                                   rtol=1e-2)

    def test_rings_separate_in_kernel_space(self):
        # linear PCA cannot separate the rings; RBF kernel PCA's first
        # component should split them nearly perfectly
        x = _two_rings(150, seed=5)
        labels = np.arange(150) % 2
        z = KernelPCA(1, kernel="rbf", gamma=0.5).fit(x)
        z0 = np.asarray(z.scores_)[:, 0]
        thr = np.median(z0)
        acc = max(np.mean((z0 > thr) == labels),
                  np.mean((z0 > thr) != labels))
        assert acc > 0.95

    def test_rank_deficient_components_are_zero(self):
        # centered linear kernel of 2-D data has rank <= 2; asking for 10
        # components must yield ZERO scores/transforms past the rank, not
        # 1/sqrt(eps) garbage
        rng = np.random.default_rng(8)
        x = rng.standard_normal((30, 2))
        kp = KernelPCA(10, kernel="linear", solver="exact").fit(x)
        lam = np.asarray(kp.eigenvalues_)
        assert np.all(lam[3:] == 0.0)
        z = np.asarray(kp.transform(x[:5]))
        assert np.all(np.isfinite(z))
        assert np.abs(z[:, 3:]).max() == 0.0
        assert np.abs(z[:, :2]).max() > 0.1   # real components still live

    def test_unknown_kernel_or_solver_raises(self):
        x = _two_rings(30)
        with pytest.raises(ValueError):
            KernelPCA(2, kernel="sigmoidish").fit(x)
        with pytest.raises(ValueError):
            KernelPCA(2, solver="magic").fit(x)


class TestRFF:
    def test_inner_products_approximate_rbf_kernel(self):
        rng = np.random.default_rng(9)
        x = rng.standard_normal((60, 4))
        gamma = 0.3
        z = np.asarray(rff_features(x, n_features=8192, gamma=gamma,
                                    seed=0))
        approx = z @ z.T
        exact = np.asarray(kernel_matrix(x, x, "rbf", gamma=gamma))
        assert np.abs(approx - exact).max() < 0.05

    def test_deterministic_and_shaped(self):
        x = np.random.default_rng(10).standard_normal((7, 3))
        z1 = np.asarray(rff_features(x, n_features=64, gamma=1.0, seed=5))
        z2 = np.asarray(rff_features(x, n_features=64, gamma=1.0, seed=5))
        assert z1.shape == (7, 64)
        np.testing.assert_array_equal(z1, z2)


class TestNystromFeatures:
    def test_exact_on_landmark_subspace(self):
        from rsvd_kamaneh_raganato_terrana_tpu.apps.kpca import (
            nystrom_features,
        )

        # with ALL points as landmarks the approximation is exact:
        # Z Z^T = K(X,X) K(X,X)^+ K(X,X) = K
        x = _two_rings(60, seed=20)
        z = np.asarray(nystrom_features(x, x, gamma=0.5))
        exact = np.asarray(kernel_matrix(x, x, "rbf", gamma=0.5))
        np.testing.assert_allclose(z @ z.T, exact, atol=1e-5)

    def test_subset_landmarks_approximate(self):
        from rsvd_kamaneh_raganato_terrana_tpu.apps.kpca import (
            nystrom_features,
        )

        rng = np.random.default_rng(21)
        # clustered data: a modest landmark set covers it well
        centers = rng.standard_normal((5, 3)) * 3
        x = np.concatenate([c + 0.1 * rng.standard_normal((40, 3))
                            for c in centers])
        lm = x[::8]                                  # 25 landmarks
        z = np.asarray(nystrom_features(x, lm, gamma=0.5))
        exact = np.asarray(kernel_matrix(x, x, "rbf", gamma=0.5))
        err = np.abs(z @ z.T - exact).max()
        assert err < 0.05, err

    def test_unknown_kernel_raises(self):
        from rsvd_kamaneh_raganato_terrana_tpu.apps.kpca import (
            nystrom_features,
        )

        with pytest.raises(ValueError):
            nystrom_features(np.zeros((4, 2)), np.zeros((2, 2)),
                             kernel="nope")
