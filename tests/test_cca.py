"""Randomized CCA (rsvd/cca.py)."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.cca import cca


def _correlated_views(n=500, p=10, q=8, rho=(0.9, 0.6), seed=0):
    """Two views sharing len(rho) latent factors with known canonical
    correlations rho; remaining directions independent noise."""
    rng = np.random.default_rng(seed)
    k = len(rho)
    z = rng.standard_normal((n, k))
    ex = rng.standard_normal((n, p))
    ey = rng.standard_normal((n, q))
    x = ex.copy()
    y = ey.copy()
    for i, r in enumerate(rho):
        # view-specific unit-variance mixtures of shared + private noise
        x[:, i] = np.sqrt(r) * z[:, i] + np.sqrt(1 - r) * ex[:, i]
        y[:, i] = np.sqrt(r) * z[:, i] + np.sqrt(1 - r) * ey[:, i]
    return x, y


class TestCca:
    def test_recovers_known_correlations(self):
        x, y = _correlated_views(n=20000, rho=(0.9, 0.6), seed=0)
        res = cca(jnp.asarray(x), jnp.asarray(y), k=3)
        corr = np.asarray(res.correlations)
        np.testing.assert_allclose(corr[0], 0.9, atol=0.03)
        np.testing.assert_allclose(corr[1], 0.6, atol=0.05)
        assert corr[2] < 0.2          # no third shared factor

    def test_projections_have_claimed_correlation(self):
        x, y = _correlated_views(n=5000, rho=(0.8,), seed=1)
        res = cca(jnp.asarray(x), jnp.asarray(y), k=1)
        u = (x - np.asarray(res.x_mean)) @ np.asarray(res.x_weights)[:, 0]
        v = (y - np.asarray(res.y_mean)) @ np.asarray(res.y_weights)[:, 0]
        emp = np.corrcoef(u, v)[0, 1]
        np.testing.assert_allclose(abs(emp),
                                   float(res.correlations[0]), atol=1e-6)

    def test_successive_pairs_uncorrelated(self):
        x, y = _correlated_views(n=8000, rho=(0.9, 0.7), seed=2)
        res = cca(jnp.asarray(x), jnp.asarray(y), k=2)
        u = (x - np.asarray(res.x_mean)) @ np.asarray(res.x_weights)
        cu = np.corrcoef(u.T)
        assert abs(cu[0, 1]) < 0.05

    def test_matches_exact_eig_solution(self):
        """Against the textbook generalized-eig CCA on a small problem."""
        x, y = _correlated_views(n=3000, rho=(0.85, 0.5), seed=3)
        res = cca(jnp.asarray(x), jnp.asarray(y), k=2, reg=0.0)
        xc = x - x.mean(0)
        yc = y - y.mean(0)
        n = x.shape[0]
        cxx, cyy = xc.T @ xc / (n - 1), yc.T @ yc / (n - 1)
        cxy = xc.T @ yc / (n - 1)
        m = (np.linalg.inv(np.linalg.cholesky(cxx)) @ cxy
             @ np.linalg.inv(np.linalg.cholesky(cyy)).T)
        s_ref = np.linalg.svd(m, compute_uv=False)[:2]
        np.testing.assert_allclose(np.asarray(res.correlations), s_ref,
                                   atol=1e-8)

    def test_rsvd_path_for_wide_views(self):
        rng = np.random.default_rng(4)
        z = rng.standard_normal((600, 2))
        x = np.concatenate([z, rng.standard_normal((600, 300))], axis=1)
        y = np.concatenate([z + 0.3 * rng.standard_normal((600, 2)),
                            rng.standard_normal((600, 280))], axis=1)
        res = cca(jnp.asarray(x), jnp.asarray(y), k=2, reg=1e-3)
        corr = np.asarray(res.correlations)
        assert corr[0] > 0.8
        assert np.all(corr <= 1.0) and np.all(corr >= 0.0)

    def test_mismatched_rows_raise(self):
        import pytest

        with pytest.raises(ValueError):
            cca(jnp.zeros((10, 3)), jnp.zeros((11, 3)))
