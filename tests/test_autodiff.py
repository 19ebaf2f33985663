"""End-to-end differentiability of the factorization pipeline.

Beyond-parity, and only possible because the whole compute path is
functional JAX: `jax.grad` flows through sketch -> power iteration ->
CholeskyQR -> eigh tail, so the factorization can sit inside a trained
model (low-rank layers, learned preconditioners, compression-aware
losses).  The reference's imperative C++/MPI pipeline has no analogue.

Gradient support holds for the `eigh`/differentiable tails; the Jacobi
while_loop tails are forward-only (documented in USAGE.md).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.rsvd import reconstruct, rsvd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_with_omega


def _well_separated(m, n, seed=0, lo=1e-2):
    """Matrix with a well-separated spectrum (SVD grads are smooth away
    from degeneracies)."""
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    s = np.geomspace(1.0, lo, min(m, n))
    return jnp.asarray(u @ np.diag(s) @ v.T)


class TestGradThroughRsvd:
    def test_grad_matches_finite_difference(self):
        a = _well_separated(60, 40, seed=0)

        def loss(a):
            u, s, v = rsvd(a, k=8, p=8, q=2, method="eigh")
            return jnp.sum(s * s) + 0.1 * jnp.sum(reconstruct(u, s, v) ** 2)

        g = jax.grad(loss)(a)
        assert bool(jnp.all(jnp.isfinite(g)))
        rng = np.random.default_rng(1)
        d = jnp.asarray(rng.standard_normal(a.shape))
        eps = 1e-6
        fd = (loss(a + eps * d) - loss(a - eps * d)) / (2 * eps)
        np.testing.assert_allclose(float(jnp.vdot(g, d)), float(fd),
                                   rtol=1e-6)

    def test_singular_value_gradient_is_rank_one(self):
        """d sigma_max / dA = u_1 v_1^T (exact for simple sigma_1).  Needs
        a near-exactly-captured subspace — with a heavy spectral tail the
        rSVD *approximation error's* gradient shows up too (that case is
        covered by the finite-difference test above)."""
        rng = np.random.default_rng(2)
        u, _ = np.linalg.qr(rng.standard_normal((50, 30)))
        v, _ = np.linalg.qr(rng.standard_normal((30, 30)))
        s = np.concatenate([[1.0, 0.7, 0.5, 0.3], np.full(26, 1e-5)])
        a = jnp.asarray(u @ np.diag(s) @ v.T)

        def top_sigma(a):
            _, s, _ = rsvd(a, k=4, p=6, q=2, method="eigh")
            return s[0]

        g = jax.grad(top_sigma)(a)
        u0, s0, v0t = np.linalg.svd(np.asarray(a))
        expected = np.outer(u0[:, 0], v0t[0])
        np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)

    def test_compression_aware_loss_descends(self):
        """One gradient step on ||A - A_k||_F^2 w.r.t. A reduces it."""
        rng = np.random.default_rng(3)
        a = jnp.asarray(rng.standard_normal((40, 40)))

        def resid(a):
            u, s, v = rsvd(a, k=5, p=5, q=1, method="eigh")
            return jnp.sum((a - reconstruct(u, s, v)) ** 2)

        val, g = jax.value_and_grad(resid)(a)
        assert float(resid(a - 1e-2 * g)) < float(val)

    @pytest.mark.slow
    def test_grad_through_explicit_omega(self):
        """Grads also flow w.r.t. the sketch matrix itself (learned
        sketches)."""
        a = _well_separated(40, 30, seed=4)
        rng = np.random.default_rng(5)
        omega = jnp.asarray(rng.standard_normal((30, 10)))

        def loss(omega):
            u, s, v = rsvd_with_omega(a, omega, q=1, k=6, method="eigh")
            return jnp.sum((a - reconstruct(u, s, v)) ** 2)

        g = jax.grad(loss)(omega)
        assert g.shape == omega.shape
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_vmapped_grad(self):
        """Batched gradients (a stack of matrices) — vmap(grad(.))."""
        stack = jnp.stack([_well_separated(24, 16, seed=s) for s in (6, 7)])

        def loss(a):
            _, s, _ = rsvd(a, k=3, p=5, q=1, method="eigh")
            return jnp.sum(s)

        gs = jax.vmap(jax.grad(loss))(stack)
        assert gs.shape == stack.shape
        assert bool(jnp.all(jnp.isfinite(gs)))

    def test_jvp_forward_mode(self):
        a = _well_separated(30, 20, seed=8)
        d = jnp.asarray(np.random.default_rng(9).standard_normal(a.shape))

        def sigmas(a):
            _, s, _ = rsvd(a, k=4, p=4, q=1, method="eigh")
            return s

        _, tangent = jax.jvp(sigmas, (a,), (d,))
        assert tangent.shape == (4,)
        assert bool(jnp.all(jnp.isfinite(tangent)))


class TestGradExtensions:
    def test_grad_through_nystrom(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import nystrom_psd

        rng = np.random.default_rng(10)
        b = rng.standard_normal((30, 30))
        a = jnp.asarray(b @ b.T + 30 * np.eye(30))

        def loss(a):
            u, lam = nystrom_psd(a, k=6)
            return jnp.sum(lam)

        g = jax.grad(loss)(a)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_grad_through_deim_interpolation(self):
        """DEIM online stage is linear in f — grads flow to the sampled
        values (indices are integer/non-differentiable, as expected)."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            deim_fit,
            deim_interpolate,
        )

        rng = np.random.default_rng(11)
        snaps = jnp.asarray(rng.standard_normal((50, 4)))
        d = deim_fit(snaps, m=4, p=0)

        def loss(f):
            return jnp.sum(deim_interpolate(d, f) ** 2)

        g = jax.grad(loss)(snaps[:, 0])
        assert bool(jnp.all(jnp.isfinite(g)))
        # gradient is supported ONLY on the sampled rows
        nz = np.nonzero(np.asarray(g))[0]
        assert set(nz).issubset(set(np.asarray(d.indices)))
