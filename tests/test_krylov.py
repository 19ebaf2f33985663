"""Block-Krylov rSVD (rsvd/krylov.py): accuracy vs the power-iteration
range finder, exactness on low rank, and basis orthonormality."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    reconstruction_error,
    rsvd,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.krylov import (
    krylov_basis,
    rsvd_krylov,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import generate_omega


def _spectrum_matrix(m, n, sing, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    return (u * np.asarray(sing)[None, :]) @ v.T


def test_exact_on_low_rank():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((120, 16)) @ rng.standard_normal((16, 90))
    u, s, v = rsvd_krylov(jnp.asarray(a), k=16, p=8, q=1)
    err = float(reconstruction_error(a, u, s, v))
    assert err < 1e-8 * np.linalg.norm(a)


def test_beats_power_iteration_on_slow_decay():
    """The reference's family-A regime: slowly decaying spectrum, where
    its rSVD 'converges only at k ~ n' (report p.13-14).  At equal
    passes over A, the Krylov range finder must beat subspace
    iteration."""
    n = 160
    sing = 1.0 / np.arange(1, n + 1) ** 0.5          # very slow decay
    a = _spectrum_matrix(n, n, sing, seed=1)
    k, p, q = 12, 4, 2
    u_k, s_k, v_k = rsvd_krylov(jnp.asarray(a), k=k, p=p, q=q)
    u_p, s_p, v_p = rsvd(jnp.asarray(a), k=k, p=p, q=q, method="eigh")
    err_k = float(reconstruction_error(a, u_k, s_k, v_k))
    err_p = float(reconstruction_error(a, u_p, s_p, v_p))
    opt = float(np.linalg.norm(sing[k:]))
    assert err_k <= err_p * (1 + 1e-9)
    # and the Krylov error must be near-optimal in this regime
    assert err_k < 1.02 * opt + 1e-12


def test_singular_value_accuracy_slow_decay():
    n = 120
    sing = 1.0 / np.arange(1, n + 1)
    a = _spectrum_matrix(n, n, sing, seed=2)
    _, s, _ = rsvd_krylov(jnp.asarray(a), k=10, p=6, q=3)
    np.testing.assert_allclose(np.asarray(s), sing[:10], rtol=1e-5)


def test_basis_orthonormal():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((100, 80)))
    omega = generate_omega(0, 80, 8, a.dtype)
    q_mat = krylov_basis(a, omega, q=2)
    assert q_mat.shape == (100, 24)
    g = np.asarray(q_mat).T @ np.asarray(q_mat)
    np.testing.assert_allclose(g, np.eye(24), atol=1e-10)


def test_k_zero_returns_all():
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.standard_normal((60, 40)))
    u, s, v = rsvd_krylov(a, k=0, p=8, q=1)
    assert u.shape == (60, 8) and s.shape == (8,) and v.shape == (40, 8)
