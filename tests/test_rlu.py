"""Randomized LU decomposition (rsvd/rlu.py).

Beyond-parity extension: accuracy vs the optimal SVD tail, trapezoidal
structure contracts, the factor-based solver, and sharding-
obliviousness on the virtual CPU mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh, shard_rows
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.rlu import (
    rlu,
    rlu_reconstruct,
    rlu_solve,
)


def _decaying(m, n, decay=0.5, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((m, m)))
    w, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = decay ** np.arange(min(m, n))
    return (q[:, : min(m, n)] * s) @ w[: min(m, n), :], s


class TestRlu:
    def test_error_matches_range_finder(self):
        a, s = _decaying(120, 90)
        res = rlu(jnp.asarray(a), k=20, p=10)
        err = np.linalg.norm(a - np.asarray(rlu_reconstruct(res)))
        opt = np.linalg.norm(s[30:])          # rank-l optimal, l = k+p
        assert err <= 3.0 * opt + 1e-12

    def test_exact_on_lowrank(self):
        rng = np.random.default_rng(3)
        a = rng.standard_normal((80, 15)) @ rng.standard_normal((15, 60))
        res = rlu(jnp.asarray(a), k=15, p=5)
        err = np.linalg.norm(a - np.asarray(rlu_reconstruct(res)))
        assert err < 1e-9 * np.linalg.norm(a)

    def test_factor_structure(self):
        a, _ = _decaying(100, 70, seed=4)
        res = rlu(jnp.asarray(a), k=16, p=8)
        l_f = np.asarray(res.l_factor)
        u_f = np.asarray(res.u_factor)
        assert l_f.shape == (100, 24) and u_f.shape == (24, 70)
        # L strictly lower-trapezoidal above the diagonal, U upper with
        # unit diagonal (the rank-revealing LU contract)
        assert np.abs(np.triu(l_f, 1)).max() == 0.0
        assert np.abs(np.tril(u_f, -1)).max() == 0.0
        np.testing.assert_allclose(np.diag(u_f), 1.0)
        # permutations are permutations
        assert sorted(np.asarray(res.perm_rows)) == list(range(100))
        assert sorted(np.asarray(res.perm_cols)) == list(range(70))

    def test_wide_input(self):
        a, s = _decaying(60, 140, seed=5)
        res = rlu(jnp.asarray(a), k=18, p=6)
        err = np.linalg.norm(a - np.asarray(rlu_reconstruct(res)))
        assert err <= 3.0 * np.linalg.norm(s[24:]) + 1e-12

    def test_solve_consistent_system(self):
        rng = np.random.default_rng(6)
        a = rng.standard_normal((90, 12)) @ rng.standard_normal((12, 70))
        x_true = rng.standard_normal(70)
        b = a @ x_true
        res = rlu(jnp.asarray(a), k=12, p=6)
        x = np.asarray(rlu_solve(res, jnp.asarray(b)))
        assert np.linalg.norm(a @ x - b) < 1e-8 * np.linalg.norm(b)

    def test_guards(self):
        with pytest.raises(ValueError):
            rlu(jnp.zeros((4,)), k=2)
        with pytest.raises(ValueError):
            rlu(jnp.zeros((4, 4)), k=0)
        with pytest.raises(ValueError):
            rlu(jnp.zeros((4, 4), dtype=jnp.complex64), k=2)

    def test_sharded_input_matches_replicated(self):
        a, _ = _decaying(96, 64, seed=7)
        a = jnp.asarray(a)
        r0 = rlu(a, k=12, p=6)
        mesh = make_mesh()
        r1 = rlu(shard_rows(a, mesh), k=12, p=6)
        np.testing.assert_array_equal(np.asarray(r0.perm_rows),
                                      np.asarray(r1.perm_rows))
        np.testing.assert_allclose(np.asarray(r0.l_factor),
                                   np.asarray(r1.l_factor), atol=1e-10)
        np.testing.assert_allclose(np.asarray(r0.u_factor),
                                   np.asarray(r1.u_factor), atol=1e-10)


def test_rlu_solve_ill_conditioned_spectrum(rng):
    """The factored pseudo-inverse (ADVICE r2): solving through
    l_factor's Gram squares cond(u2) — at cond(A) ~ 1e8 in f64 the old
    path loses ~16 digits and can NaN; the per-factor path (Gram only on
    the orthonormal panel's LU trapezoid, triangular solve against u2)
    stays backward-stable."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.rlu import rlu, rlu_solve

    n = 80
    u0, _ = np.linalg.qr(rng.standard_normal((n, n)))
    v0, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sig = np.logspace(0, -8, n)
    a = jnp.asarray((u0 * sig[None, :]) @ v0.T)
    res = rlu(a, k=n - 10, p=10)  # l = n: exact factorization regime
    x_true = rng.standard_normal((n,))
    b = np.asarray(a) @ x_true
    x = np.asarray(rlu_solve(res, jnp.asarray(b)))
    assert np.all(np.isfinite(x))
    # residual-based check (x itself is ill-determined at cond 1e8)
    resid = np.linalg.norm(np.asarray(a) @ x - b) / np.linalg.norm(b)
    assert resid < 1e-6
