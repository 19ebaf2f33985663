"""Randomized UTV / powerURV (rsvd/utv.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.utv import rutv, rutv_reconstruct


def _spectrum_matrix(m, n, s, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    return u @ np.diag(s) @ v.T


class TestRutv:
    def test_factors_structure(self):
        a = jnp.asarray(np.random.default_rng(0).standard_normal((80, 60)))
        u, t, v = rutv(a, k=12, p=8)
        l = 20
        assert u.shape == (80, l) and t.shape == (l, l) and v.shape == (60, l)
        np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(l), atol=1e-9)
        np.testing.assert_allclose(np.asarray(v.T @ v), np.eye(l), atol=1e-9)
        # upper triangular with positive diagonal
        np.testing.assert_allclose(np.asarray(jnp.tril(t, -1)), 0.0,
                                   atol=1e-9)
        assert np.all(np.asarray(jnp.diag(t)) > 0)

    def test_exact_on_low_rank(self):
        s = np.concatenate([np.geomspace(1, 0.1, 8), np.zeros(42)])
        a = jnp.asarray(_spectrum_matrix(100, 50, s, seed=1))
        u, t, v = rutv(a, k=8, p=8)
        err = np.linalg.norm(np.asarray(a - rutv_reconstruct(u, t, v)))
        assert err < 1e-8

    def test_diag_tracks_singular_values(self):
        """|T_ii| approximates sigma_i after power iteration (powerURV's
        rank-revealing property).  The per-entry contamination scales as
        (sigma_{i+1}/sigma_i)^(2q+1), so tight tracking needs decaying
        gaps: ratio ~0.29 here -> ~0.2% at q=2."""
        s = np.concatenate([np.geomspace(1, 1e-6, 12), np.full(28, 1e-7)])
        a = jnp.asarray(_spectrum_matrix(120, 40, s, seed=2))
        u, t, v = rutv(a, k=0, p=16, q=2)
        d = np.asarray(jnp.diag(t))[:6]
        np.testing.assert_allclose(d, s[:6], rtol=0.05)
        # and on slow decay it still reveals the rank ORDER of magnitude
        s2 = np.geomspace(1, 1e-4, 40)
        a2 = jnp.asarray(_spectrum_matrix(120, 40, s2, seed=3))
        _, t2, _ = rutv(a2, k=0, p=12, q=2)
        d2 = np.asarray(jnp.diag(t2))[:8]
        assert np.all(d2 < 2.0 * s2[:8]) and np.all(d2 > 0.3 * s2[:8])

    def test_truncation_near_optimal(self):
        s = np.geomspace(1, 1e-3, 60)
        a_np = _spectrum_matrix(90, 60, s, seed=3)
        a = jnp.asarray(a_np)
        k = 10
        u, t, v = rutv(a, k=k, p=10, q=2)
        err = np.linalg.norm(a_np - np.asarray(rutv_reconstruct(u, t, v, k)))
        opt = np.sqrt(np.sum(s[k:] ** 2))
        assert err < 1.5 * opt

    def test_matches_rsvd_error(self):
        """Same range-finder power: UTV truncation error comparable to the
        rSVD driver's at equal (k, p, q)."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            reconstruction_error,
            rsvd,
        )

        rng = np.random.default_rng(4)
        a_np = (rng.standard_normal((100, 70, 12)) @
                rng.standard_normal((12,)))  # rank-12 + none
        a_np = a_np + 1e-3 * rng.standard_normal((100, 70))
        a = jnp.asarray(a_np)
        k = 12
        u, t, v = rutv(a, k=k, p=10, q=2)
        e_utv = np.linalg.norm(
            a_np - np.asarray(rutv_reconstruct(u, t, v, k)))
        uu, ss, vv = rsvd(a, k=k, p=10, q=2, method="eigh")
        e_rsvd = float(reconstruction_error(a, uu, ss, vv))
        assert e_utv < 1.2 * e_rsvd + 1e-12

    def test_differentiable(self):
        a = jnp.asarray(_spectrum_matrix(
            40, 30, np.geomspace(1, 1e-2, 30), seed=5))

        def loss(a):
            u, t, v = rutv(a, k=5, p=5, q=1)
            return jnp.sum(jnp.diag(t)[:5])

        g = jax.grad(loss)(a)
        assert bool(jnp.all(jnp.isfinite(g)))
