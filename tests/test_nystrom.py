"""Nystrom PSD approximation and randomized eigendecomposition.

Beyond-parity extensions (rsvd/nystrom.py): correctness vs the exact
eigendecomposition, orthonormality contracts, and sharding-obliviousness
on the virtual CPU mesh.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh, shard_rows
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
    nystrom_psd,
    nystrom_reconstruct,
    reigh,
)


def _orth(n, seed):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    return q


def _psd(n, seed=0, decay=0.5, dtype="float64"):
    q = _orth(n, seed)
    lam = decay ** np.arange(n)
    return (q * lam[None, :]) @ q.T, lam.astype(dtype)


class TestNystromPSD:
    def test_recovers_top_eigenpairs(self):
        a, lam = _psd(96, seed=1)
        u, w = nystrom_psd(jnp.asarray(a), k=12, p=10)
        # single-pass Nystrom eigenvalues are biased low by O(tail energy):
        # ~1e-3 relative here (no power iterations; reigh is the exact-er
        # multi-pass route)
        np.testing.assert_allclose(np.asarray(w), lam[:12], rtol=5e-3)
        # eigenvector subspace: |u_i . q_i| ~ 1 up to sign
        q = _orth(96, 1)
        overlap = np.abs(np.einsum("ij,ij->j", np.asarray(u), q[:, :12]))
        assert overlap.min() > 1.0 - 1e-5

    def test_reconstruction_near_optimal(self):
        a, lam = _psd(80, seed=2, decay=0.7)
        k = 10
        u, w = nystrom_psd(jnp.asarray(a), k=k, p=10)
        err = np.linalg.norm(a - np.asarray(nystrom_reconstruct(u, w)))
        opt = np.linalg.norm(lam[k:])
        assert err <= 3.0 * opt + 1e-10

    def test_orthonormal_u(self):
        a, _ = _psd(64, seed=3)
        u, _ = nystrom_psd(jnp.asarray(a), k=8)
        g = np.asarray(u).T @ np.asarray(u)
        np.testing.assert_allclose(g, np.eye(8), atol=1e-8)

    def test_rank_deficient_input(self):
        # numerically rank-5 PSD matrix: the stabilizing shift must keep
        # the Cholesky finite and the spurious eigenvalues ~0
        rng = np.random.default_rng(4)
        b = rng.standard_normal((64, 5))
        a = b @ b.T
        u, w = nystrom_psd(jnp.asarray(a), k=8, p=8)
        assert np.all(np.isfinite(np.asarray(u)))
        w = np.asarray(w)
        true = np.linalg.eigvalsh(a)[::-1][:8]
        np.testing.assert_allclose(w[:5], true[:5], rtol=1e-6)
        assert np.all(w[5:] <= 1e-6 * w[0])

    def test_rejects_rectangular(self):
        with pytest.raises(ValueError):
            nystrom_psd(jnp.zeros((4, 5)), k=2)

    def test_sharded_input_matches_replicated(self):
        a, _ = _psd(64, seed=5)
        a = jnp.asarray(a)
        u0, w0 = nystrom_psd(a, k=6)
        mesh = make_mesh()
        u1, w1 = nystrom_psd(shard_rows(a, mesh), k=6)
        np.testing.assert_allclose(np.asarray(w0), np.asarray(w1),
                                   rtol=1e-10)
        np.testing.assert_allclose(np.asarray(u0), np.asarray(u1),
                                   atol=1e-10)


class TestNystromPCG:
    """Randomized Nystrom preconditioned CG (FTU 2023)."""

    def _kernel_system(self, n=160, mu=1e-4, seed=11):
        # RBF-style kernel matrix: fast spectral decay, huge cond(A+mu I)
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((n, 2))
        d2 = ((x[:, None, :] - x[None, :, :]) ** 2).sum(-1)
        a = np.exp(-d2 / 2.0)
        b = rng.standard_normal(n)
        return a, b, mu

    def test_solves_to_working_precision(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            nystrom_pcg,
        )

        a, b, mu = self._kernel_system()
        x = np.asarray(nystrom_pcg(jnp.asarray(a), jnp.asarray(b), mu,
                                   rank=60, iters=30))
        ref = np.linalg.solve(a + mu * np.eye(a.shape[0]), b)
        np.testing.assert_allclose(x, ref, rtol=1e-7, atol=1e-9)

    def test_beats_unpreconditioned_cg(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import _pcg_scan
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            nystrom_pcg,
        )

        a, b, mu = self._kernel_system()
        aj, bj = jnp.asarray(a), jnp.asarray(b)
        iters = 15
        x_pre = np.asarray(nystrom_pcg(aj, bj, mu, rank=60, iters=iters))
        x_plain = np.asarray(_pcg_scan(
            lambda p: aj @ p + mu * p, lambda r: r, bj[:, None],
            iters))[:, 0]
        sys = a + mu * np.eye(a.shape[0])
        res_pre = np.linalg.norm(sys @ x_pre - b)
        res_plain = np.linalg.norm(sys @ x_plain - b)
        assert res_pre < 1e-3 * res_plain

    def test_multiple_rhs(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            nystrom_pcg,
        )

        a, _, mu = self._kernel_system(n=96)
        rng = np.random.default_rng(12)
        b = rng.standard_normal((96, 3))
        x = np.asarray(nystrom_pcg(jnp.asarray(a), jnp.asarray(b), mu,
                                   rank=50, iters=30))
        ref = np.linalg.solve(a + mu * np.eye(96), b)
        np.testing.assert_allclose(x, ref, rtol=1e-6, atol=1e-8)

    def test_guards(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            nystrom_pcg,
        )

        with pytest.raises(ValueError):
            nystrom_pcg(jnp.zeros((4, 5)), jnp.zeros(4), 1e-3)
        with pytest.raises(ValueError):
            nystrom_pcg(jnp.eye(4), jnp.zeros(4), 0.0)

    def test_preconditioner_conditioning(self):
        # P^{-1}(A + mu I) should be O(1)-conditioned when the sketch
        # captures the spectrum above mu
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            nystrom_preconditioner, nystrom_psd,
        )

        a, _, mu = self._kernel_system(n=128)
        u, lam = nystrom_psd(jnp.asarray(a), k=80, p=0)
        precond = nystrom_preconditioner(u, lam, mu)
        sys = a + mu * np.eye(128)
        pinv_sys = np.asarray(precond(jnp.asarray(sys)))
        cond_pre = np.linalg.cond(pinv_sys)
        cond_raw = np.linalg.cond(sys)
        assert cond_pre < 1e-3 * cond_raw
        assert cond_pre < 50.0


class TestReigh:
    def test_signed_spectrum(self):
        # indefinite: eigenvalues alternate in sign, magnitudes decay
        n = 96
        q = _orth(n, 6)
        lam = (0.6 ** np.arange(n)) * np.where(np.arange(n) % 2, -1.0, 1.0)
        a = (q * lam[None, :]) @ q.T
        w, u = reigh(jnp.asarray(a), k=10, p=10, q=2)
        np.testing.assert_allclose(np.asarray(w), lam[:10], rtol=1e-8)
        g = np.asarray(u).T @ np.asarray(u)
        np.testing.assert_allclose(g, np.eye(10), atol=1e-8)

    def test_matches_nystrom_on_psd(self):
        a, lam = _psd(64, seed=7)
        w_r, _ = reigh(jnp.asarray(a), k=6)
        w_n = nystrom_psd(jnp.asarray(a), k=6)[1]
        np.testing.assert_allclose(np.asarray(w_r), np.asarray(w_n),
                                   rtol=5e-3)

    def test_rejects_rectangular(self):
        with pytest.raises(ValueError):
            reigh(jnp.zeros((4, 5)), k=2)


class TestGeneralizedEigh:
    def test_matches_scipy_generalized(self):
        from scipy.linalg import eigh as scipy_eigh

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            reigh_generalized,
        )

        n, k = 80, 6
        q = _orth(n, 8)
        lam = 0.7 ** np.arange(n)
        a = (q * lam[None, :]) @ q.T
        rng = np.random.default_rng(9)
        c = rng.standard_normal((n, n)) / np.sqrt(n)
        b = c @ c.T + np.eye(n)            # SPD mass matrix
        w, v = reigh_generalized(jnp.asarray(a), jnp.asarray(b), k=k)
        w_true = scipy_eigh(a, b, eigvals_only=True)[::-1]
        np.testing.assert_allclose(np.asarray(w), w_true[:k], rtol=1e-6)
        # B-orthonormality: V^T B V = I
        g = np.asarray(v).T @ b @ np.asarray(v)
        np.testing.assert_allclose(g, np.eye(k), atol=1e-6)
        # residual: A v = w B v
        res = a @ np.asarray(v) - (b @ np.asarray(v)) * np.asarray(w)[None, :]
        assert np.linalg.norm(res) < 1e-6

    def test_identity_b_reduces_to_reigh(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            reigh_generalized,
        )

        a, lam = _psd(64, seed=10)
        w_g, _ = reigh_generalized(jnp.asarray(a), jnp.eye(64), k=5)
        w_r, _ = reigh(jnp.asarray(a), k=5)
        np.testing.assert_allclose(np.asarray(w_g), np.asarray(w_r),
                                   rtol=1e-9)

    def test_shape_guard(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
            reigh_generalized,
        )

        with pytest.raises(ValueError):
            reigh_generalized(jnp.zeros((4, 4)), jnp.zeros((5, 5)), k=2)
