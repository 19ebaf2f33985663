"""Randomized trace / diagonal estimation (rsvd/trace.py): unbiasedness,
the Rademacher exactness identities, and Hutch++'s variance reduction."""

import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.trace import (
    diag_estimate,
    hutchinson,
    hutchpp,
)


def _sym(n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((n, n)).astype(dtype)
    return (a + a.T) / 2


def _psd_low_rank(n, r, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    b = rng.standard_normal((n, r)).astype(dtype)
    return b @ b.T


class TestHutchinson:
    def test_diagonal_matrix_is_exact(self):
        # Rademacher probes: g_i^2 = 1, so g^T D g = tr(D) exactly
        d = np.diag(np.linspace(-3.0, 5.0, 100))
        est, se = hutchinson(d, seed=0, num_samples=4)
        np.testing.assert_allclose(float(est), np.trace(d), rtol=1e-12)
        assert float(se) < 1e-10

    def test_within_stderr_of_truth(self):
        a = _sym(200, seed=1)
        est, se = hutchinson(a, seed=2, num_samples=256)
        assert abs(float(est) - np.trace(a)) < 5 * float(se)

    def test_seed_changes_estimate_gaussian(self):
        a = _sym(60, seed=3)
        e1, _ = hutchinson(a, seed=0, num_samples=16, kind="gaussian")
        e2, _ = hutchinson(a, seed=1, num_samples=16, kind="gaussian")
        assert float(e1) != float(e2)
        e1b, _ = hutchinson(a, seed=0, num_samples=16, kind="gaussian")
        assert float(e1) == float(e1b)


class TestHutchPP:
    def test_exact_on_low_rank_psd(self):
        # budget//3 = 32 probe columns >= rank 8: Q spans range(A) and the
        # residual term vanishes — estimate is exact to roundoff
        a = _psd_low_rank(300, 8, seed=4)
        est = hutchpp(a, seed=0, budget=96)
        np.testing.assert_allclose(float(est), np.trace(a), rtol=1e-8)

    def test_beats_hutchinson_on_decaying_spectrum(self):
        # PSD with power-law decay: Hutch++'s error scales with the tail
        # energy, Hutchinson's with the full ||A||_F
        n = 400
        rng = np.random.default_rng(5)
        q, _ = np.linalg.qr(rng.standard_normal((n, n)))
        lam = 1.0 / np.arange(1, n + 1) ** 2
        a = (q * lam[None, :]) @ q.T
        t = np.trace(a)
        budget = 60
        err_pp = [abs(float(hutchpp(a, seed=s, budget=budget)) - t)
                  for s in range(8)]
        err_h = [abs(float(hutchinson(a, seed=s, num_samples=budget)[0]) - t)
                 for s in range(8)]
        assert np.median(err_pp) < 0.2 * np.median(err_h)


# module-level stable callable; the operator's data arrives as a traced
# operand, never a closure (the trace.py matrix-free convention)
def _gram_apply(x, b):
    """A x = B (B^T x) — A never formed."""
    return b @ (b.T @ x)


class TestMatrixFree:
    def test_hutchinson_operator_matches_dense(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(20)
        b = rng.standard_normal((120, 10))
        a = b @ b.T
        bj = jnp.asarray(b)
        e_dense, _ = hutchinson(a, seed=3, num_samples=64)
        e_op, _ = hutchinson(_gram_apply, seed=3, num_samples=64, n=120,
                             dtype=bj.dtype, operands=(bj,))
        np.testing.assert_allclose(float(e_dense), float(e_op), rtol=1e-6)

    def test_hutchpp_operator_matches_dense(self):
        import jax.numpy as jnp

        rng = np.random.default_rng(21)
        b = rng.standard_normal((100, 8))
        a = b @ b.T
        bj = jnp.asarray(b)
        e_dense = hutchpp(a, seed=0, budget=48)
        e_op = hutchpp(_gram_apply, seed=0, budget=48, n=100,
                       dtype=bj.dtype, operands=(bj,))
        np.testing.assert_allclose(float(e_dense), float(e_op), rtol=1e-6)

    def test_operand_change_no_retrace(self):
        # same callable + new operand values must hit the same jit cache
        # entry (operands are traced, the callable is the static key)
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.trace import (
            _hutchinson_op,
        )

        rng = np.random.default_rng(22)
        b1 = jnp.asarray(rng.standard_normal((50, 4)))
        b2 = jnp.asarray(rng.standard_normal((50, 4)))
        hutchinson(_gram_apply, n=50, num_samples=8, dtype=b1.dtype,
                   operands=(b1,))
        before = _hutchinson_op._cache_size()
        hutchinson(_gram_apply, n=50, num_samples=8, dtype=b2.dtype,
                   operands=(b2,))
        assert _hutchinson_op._cache_size() == before

    def test_operator_needs_n(self):
        import pytest

        with pytest.raises(ValueError):
            hutchinson(lambda x: x)
        with pytest.raises(ValueError):
            hutchpp(lambda x: x)
        with pytest.raises(ValueError):
            diag_estimate(lambda x: x)


class TestDiagEstimate:
    def test_diagonal_matrix_is_exact(self):
        d = np.diag(np.linspace(0.1, 9.0, 64))
        est, se = diag_estimate(d, seed=0, num_samples=4)
        np.testing.assert_allclose(np.asarray(est), np.diag(d), rtol=1e-12)
        assert float(np.max(np.asarray(se))) < 1e-10

    def test_general_matrix_within_stderr(self):
        a = _sym(150, seed=6)
        est, se = diag_estimate(a, seed=1, num_samples=512)
        err = np.abs(np.asarray(est) - np.diag(a))
        # 5-sigma per entry; allow a couple of outliers out of 150
        assert np.sum(err > 5 * np.asarray(se)) <= 2
