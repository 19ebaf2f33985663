"""GP regression with HODLR-compressed kernels (apps/gp.py) +
hodlr_solve (rsvd/hodlr.py)."""

from functools import partial
import pytest

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.apps.gp import GP, rbf_kernel
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import (
    hodlr_build,
    hodlr_solve,
)

KERN = partial(rbf_kernel, lengthscale=0.05)   # matched to the 9 pi component


def _spd_kernel_matrix(n, ell=0.1, ridge=0.1):
    x = np.linspace(0, 1, n)
    k = np.exp(-((x[:, None] - x[None, :]) ** 2) / (2 * ell * ell))
    return k + ridge * np.eye(n)


class TestHodlrSolve:
    @pytest.mark.slow
    def test_matches_dense_solve(self):
        a = _spd_kernel_matrix(512)
        h = hodlr_build(jnp.asarray(a), levels=4, k=20)
        b = np.random.default_rng(0).standard_normal(512)
        x_h = np.asarray(hodlr_solve(h, jnp.asarray(b)))
        x_d = np.linalg.solve(a, b)
        assert np.linalg.norm(x_h - x_d) < 1e-5 * np.linalg.norm(x_d)

    def test_residual_small(self):
        a = _spd_kernel_matrix(256, ell=0.05)
        h = hodlr_build(jnp.asarray(a), levels=3, k=16)
        b = np.random.default_rng(1).standard_normal(256)
        x = np.asarray(hodlr_solve(h, jnp.asarray(b)))
        assert np.linalg.norm(a @ x - b) < 1e-6 * np.linalg.norm(b)


def _toy_data(n=1024, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    x = np.sort(rng.random(n))
    y = np.sin(2 * np.pi * x) + 0.3 * np.sin(9 * np.pi * x)
    return x[:, None], y + noise * rng.standard_normal(n)


class TestGP:
    @pytest.mark.slow
    def test_hodlr_matches_dense_posterior(self):
        x, y = _toy_data(n=1024)
        xt = np.linspace(0.05, 0.95, 40)[:, None]
        gp_d = GP(noise=0.05, solver="dense").fit(x, y)
        gp_h = GP(noise=0.05, solver="hodlr", levels=3, rank=32).fit(x, y)
        assert gp_h.solver_used_.startswith("hodlr")
        m_d = np.asarray(gp_d.predict(jnp.asarray(xt)))
        m_h = np.asarray(gp_h.predict(jnp.asarray(xt)))
        np.testing.assert_allclose(m_h, m_d, atol=1e-4 * np.abs(m_d).max())

    @pytest.mark.slow
    def test_predicts_smooth_function(self):
        x, y = _toy_data(n=600, noise=0.01)
        gp = GP(kernel=KERN, noise=0.03, solver="auto").fit(x, y)
        xt = np.linspace(0.1, 0.9, 50)[:, None]
        pred = np.asarray(gp.predict(jnp.asarray(xt)))
        truth = np.sin(2 * np.pi * xt[:, 0]) + 0.3 * np.sin(9 * np.pi * xt[:, 0])
        assert np.sqrt(np.mean((pred - truth) ** 2)) < 0.05

    @pytest.mark.slow
    def test_variance_shrinks_near_data(self):
        x, y = _toy_data(n=300)
        gp = GP(noise=0.05, solver="dense").fit(x, y)
        m, v = gp.predict(jnp.asarray([[0.5], [1.8]]), return_var=True)
        v = np.asarray(v)
        assert v[0] < v[1]          # extrapolation point is less certain
        assert np.all(v >= 0)

    def test_log_marginal_likelihood_prefers_true_noise(self):
        x, y = _toy_data(n=256, noise=0.05, seed=2)
        lmls = [GP(kernel=KERN, noise=s, solver="dense").fit(x, y)
                .log_marginal_likelihood() for s in (0.005, 0.05, 0.5)]
        assert lmls[1] > lmls[0] and lmls[1] > lmls[2]

    def test_auto_small_uses_dense(self):
        x, y = _toy_data(n=128)
        gp = GP(solver="auto").fit(x, y)
        assert gp.solver_used_ == "dense"

    def test_exhausted_jitter_escalation_raises(self, monkeypatch):
        """If every jitter escalation still yields non-finite alpha, fit()
        must raise rather than return silently with metadata claiming a
        jitter that was never installed (round-5 advisor finding)."""
        from rsvd_kamaneh_raganato_terrana_tpu.apps import gp as gp_mod

        x, y = _toy_data(n=256)
        nan_alpha = jnp.full(256, jnp.nan)
        monkeypatch.setattr(gp_mod, "hodlr_solve",
                            lambda h, b, **kw: nan_alpha)
        with pytest.raises(FloatingPointError, match="jitter escalation"):
            GP(noise=0.05, solver="hodlr", levels=2, rank=16).fit(x, y)


@pytest.mark.slow
def test_implicit_fit_matches_dense_hodlr():
    """Forcing the implicit path (implicit_threshold below n): the
    never-materialize-K fit must reproduce the dense-built HODLR fit's
    predictions, and the matrix-free SLQ log-ML must agree with the
    dense-K SLQ to estimator noise."""
    import numpy as np

    from rsvd_kamaneh_raganato_terrana_tpu.apps.gp import GP

    rng = np.random.default_rng(5)
    x = np.sort(rng.uniform(0, 6, 1024))
    y = np.sin(2 * x) + 0.05 * rng.standard_normal(1024)
    xt = np.linspace(0.2, 5.8, 40)

    gp_d = GP(noise=0.05).fit(x, y)                      # dense-built hodlr
    gp_i = GP(noise=0.05, implicit_threshold=256).fit(x, y)
    assert gp_i.solver_used_.endswith("implicit)")
    assert not gp_d.solver_used_.endswith("implicit)")
    m_d, v_d = gp_d.predict(xt, return_var=True)
    m_i, v_i = gp_i.predict(xt, return_var=True)
    np.testing.assert_allclose(np.asarray(m_i), np.asarray(m_d),
                               rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v_i), np.asarray(v_d),
                               rtol=1e-2, atol=1e-3)
    lml_d = gp_d.log_marginal_likelihood(num_probes=16, steps=40)
    lml_i = gp_i.log_marginal_likelihood(num_probes=16, steps=40)
    # SLQ probe noise ~ O(1/sqrt(probes)) relative on logdet; the two
    # estimates run different operators (dense vs compressed) — agree
    # within a few percent of magnitude
    assert abs(lml_i - lml_d) < 0.05 * abs(lml_d) + 5.0
