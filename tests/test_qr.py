"""QR kernel tests vs the NumPy oracle (reference protocol:
python/test_run_QR.py + compare_QR.py — reduced QR over every input .mtx,
checking ||A - QR|| and orthogonality)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import shard_rows
from rsvd_kamaneh_raganato_terrana_tpu.linalg import qr as qrlib


def _check_qr(a, q, r, tol=1e-10):
    m, n = a.shape
    np.testing.assert_allclose(np.asarray(q @ r), a, atol=tol * max(1.0, np.abs(a).max()))
    ortho = np.asarray(q.T @ q) - np.eye(n)
    assert np.linalg.norm(ortho) < tol
    # R upper triangular
    assert np.allclose(np.tril(np.asarray(r), -1), 0.0, atol=tol)


@pytest.mark.parametrize("method", ["cholqr2", "cholqr3", "householder",
                                    "robust", "robust1"])
def test_qr_reduced_random(method, rng):
    a = rng.standard_normal((200, 24))
    q, r = qrlib.qr_reduced(jnp.asarray(a), method)
    _check_qr(a, q, r)


def test_qr_reduced_reference_inputs(input_matrices):
    for name, a in input_matrices.items():
        q, r = qrlib.qr_reduced(jnp.asarray(a), "householder")
        _check_qr(a, q, r, tol=1e-9)


def test_cholqr2_ill_conditioned(rng):
    """Shift guard: cond(A) ~ 1e9 would break plain CholeskyQR in f64^0.5
    territory; the shifted retry must keep Q orthonormal."""
    u, _ = np.linalg.qr(rng.standard_normal((300, 20)))
    v, _ = np.linalg.qr(rng.standard_normal((20, 20)))
    s = np.logspace(0, -9, 20)
    a = u * s @ v.T
    q, r = qrlib.cholesky_qr3(jnp.asarray(a))
    ortho = np.linalg.norm(np.asarray(q.T @ q) - np.eye(20))
    assert np.isfinite(np.asarray(q)).all()
    assert ortho < 1e-8
    np.testing.assert_allclose(np.asarray(q @ r), a, atol=1e-10)


def test_cholqr2_rank_deficient_stays_finite(rng):
    a = np.outer(rng.standard_normal(100), rng.standard_normal(8))  # rank 1
    q, r = qrlib.cholesky_qr2(jnp.asarray(a))
    assert np.isfinite(np.asarray(q)).all()
    np.testing.assert_allclose(np.asarray(q @ r), a, atol=1e-6)


def test_qr_full(rng):
    a = rng.standard_normal((30, 12))
    q, r = qrlib.qr_full(jnp.asarray(a))
    assert q.shape == (30, 30) and r.shape == (30, 12)
    np.testing.assert_allclose(np.asarray(q @ r), a, atol=1e-12)


def test_cholqr2_sharded(mesh8, rng):
    """Row-sharded tall-skinny QR: the Gram psum + replicated tail path."""
    a = rng.standard_normal((512, 16))
    a_sh = shard_rows(jnp.asarray(a), mesh8)
    q, r = jax.jit(qrlib.cholesky_qr2)(a_sh)
    _check_qr(a, q, r)


def test_qr_oracle_comparison(rng):
    """compare_QR.py protocol: sign-invariant mean abs diff vs np.linalg.qr."""
    a = rng.standard_normal((100, 100))
    q, r = qrlib.qr_reduced(jnp.asarray(a), "cholqr2")
    qn, rn = np.linalg.qr(a, mode="reduced")
    # Match column signs (QR unique up to diag(+-1))
    signs = np.sign(np.diagonal(np.asarray(r))) * np.sign(np.diagonal(rn))
    diff_q = np.abs(np.abs(np.asarray(q)) - np.abs(qn)).mean()
    diff_r = np.abs(np.abs(np.asarray(r)) - np.abs(rn)).mean()
    assert diff_q < 1e-8 and diff_r < 1e-8


def test_robust1_falls_back_on_rank_deficiency(rng):
    """Single-pass robust QR must detect a rank-deficient input and route
    to Householder, keeping Q orthonormal (basis completion)."""
    b = rng.standard_normal((120, 4))
    a = b @ rng.standard_normal((4, 16))  # rank 4 < 16 columns
    q, r = qrlib.qr_reduced(jnp.asarray(a), "robust1")
    ortho = np.asarray(q.T @ q) - np.eye(16)
    assert np.linalg.norm(ortho) < 1e-8
    np.testing.assert_allclose(np.asarray(q @ r), a, atol=1e-8)


def test_interior_qr_pipeline_accuracy(rng):
    """interior_qr='robust1' must not change rSVD reconstruction accuracy
    (interior bases only need conditioning, not full orthogonality)."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        generate_omega, rsvd_with_omega)

    a = (rng.standard_normal((300, 10)) @
         rng.standard_normal((10, 250)))
    a_dev = jnp.asarray(a)
    omega = generate_omega(0, 250, 18, a_dev.dtype)
    errs = {}
    for iq in (None, "robust1"):
        u, s, v = rsvd_with_omega(a_dev, omega, q=2, k=10, method="eigh",
                                  interior_qr=iq)
        errs[iq] = float(jnp.linalg.norm(a_dev - (u * s[None, :]) @ v.T))
    assert errs["robust1"] <= max(errs[None] * 1.5, 1e-9 * np.linalg.norm(a))


def test_cholqr1_minimum_depth_variant(rng):
    """cholqr1: pure single-pass CholeskyQR — exact (Q, R) contract on
    well-conditioned input, NaN (no graceful fallback) on rank-deficient
    input (the documented serving trade)."""
    import jax.numpy as jnp
    import numpy as np

    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced

    a = jnp.asarray(rng.standard_normal((200, 24)))
    q, r = qr_reduced(a, "cholqr1")
    np.testing.assert_allclose(np.asarray(q.T @ q), np.eye(24), atol=1e-8)
    np.testing.assert_allclose(np.asarray(q @ r), np.asarray(a),
                               atol=1e-10)
    assert np.allclose(np.asarray(jnp.tril(r, -1)), 0.0)
    # rank-deficient: documented NaN, not silent garbage
    bad = jnp.concatenate([a[:, :12], a[:, :12]], axis=1)
    qb, _ = qr_reduced(bad, "cholqr1")
    assert not bool(jnp.all(jnp.isfinite(qb)))
