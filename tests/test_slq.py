"""Stochastic Lanczos quadrature (rsvd/slq.py): tridiagonal correctness,
tr(f(A)) against exact spectral sums, log-det parity with slogdet."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.slq import (
    lanczos_tridiag,
    logdet_psd,
    slq_trace,
)


def _op_matvec(v, mat):
    return mat @ v


def _spd(n, cond=100.0, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    lam = np.logspace(0, -np.log10(cond), n)
    return (q * lam[None, :]) @ q.T, lam


class TestLanczos:
    def test_full_steps_recover_spectrum(self):
        a, lam = _spd(24, cond=50.0, seed=1)
        v0 = np.random.default_rng(2).standard_normal(24)
        al, be = lanczos_tridiag(jnp.asarray(a), jnp.asarray(v0), 24)
        t = np.diag(np.asarray(al)) + np.diag(np.asarray(be), 1) \
            + np.diag(np.asarray(be), -1)
        np.testing.assert_allclose(np.sort(np.linalg.eigvalsh(t)),
                                   np.sort(lam), rtol=1e-8)

    def test_breakdown_is_benign(self):
        # rank-2 matrix: Lanczos breaks down after 2 steps; quadrature on
        # the padded tridiagonal must still integrate f correctly
        rng = np.random.default_rng(3)
        b = rng.standard_normal((30, 2))
        a = b @ b.T
        est = slq_trace(jnp.asarray(a), lambda x: x, seed=0,
                        num_probes=32, steps=12)
        assert np.isfinite(float(est))
        assert abs(float(est) - np.trace(a)) < 0.35 * np.trace(a)


class TestSLQ:
    def test_identity_function_is_trace(self):
        a, _ = _spd(150, seed=4)
        est = slq_trace(jnp.asarray(a), lambda x: x, seed=1,
                        num_probes=64, steps=20)
        true = np.trace(a)
        assert abs(float(est) - true) < 0.1 * true

    def test_logdet_matches_slogdet(self):
        a, _ = _spd(200, cond=1e3, seed=5)
        true = np.linalg.slogdet(a)[1]
        est = float(logdet_psd(jnp.asarray(a), seed=0, num_probes=48,
                               steps=40))
        assert abs(est - true) < 0.05 * abs(true), (est, true)

    def test_resolvent_trace(self):
        a, lam = _spd(120, cond=100.0, seed=6)
        mu = 0.5
        true = np.sum(1.0 / (lam + mu))
        est = float(slq_trace(jnp.asarray(a), lambda x: 1.0 / (x + mu),
                              seed=2, num_probes=48, steps=25))
        assert abs(est - true) < 0.05 * true

    def test_logdet_does_not_retrace_per_call(self):
        # logdet_psd's fn is a static jit arg: repeated calls with the
        # same shift must reuse one cache entry, not grow the jit cache
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.slq import _slq_dense

        a, _ = _spd(40, seed=8)
        aj = jnp.asarray(a)
        logdet_psd(aj, num_probes=2, steps=4)
        before = _slq_dense._cache_size()
        logdet_psd(aj, num_probes=2, steps=4)
        logdet_psd(aj, num_probes=2, steps=4)
        assert _slq_dense._cache_size() == before

    def test_matrix_free_operator_matches_dense(self):
        a, _ = _spd(80, seed=9)
        aj = jnp.asarray(a)
        # the operator's matrix arrives as a traced OPERAND, not a
        # closure (rsvd/trace.py matrix-free convention)
        dense = float(slq_trace(aj, jnp.exp, seed=4, num_probes=8,
                                steps=15))
        op = float(slq_trace(_op_matvec, jnp.exp, seed=4, num_probes=8,
                             steps=15, n=80, dtype=aj.dtype,
                             operands=(aj,)))
        assert abs(dense - op) < 1e-8 * abs(dense)

    def test_matrix_free_needs_n(self):
        import pytest

        with pytest.raises(ValueError):
            slq_trace(lambda v: v, jnp.exp)

    def test_seed_determinism(self):
        a, _ = _spd(60, seed=7)
        e1 = float(slq_trace(jnp.asarray(a), jnp.exp, seed=3,
                             num_probes=8, steps=10))
        e2 = float(slq_trace(jnp.asarray(a), jnp.exp, seed=3,
                             num_probes=8, steps=10))
        assert e1 == e2
