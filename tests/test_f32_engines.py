"""float32 engine coverage — the TPU-default dtype.  The rest of the suite
runs under x64, which masked a block-Jacobi f32 convergence failure once;
these tests pin the f32 contracts explicitly (inputs stay f32 even with
x64 enabled)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import jacobi_svd
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd import reconstruction_error, rsvd


def test_block_jacobi_f32_large_n(rng):
    """The auto-selected ParallelJacobi engine at n > 256 in f32 (the
    regression that motivated this file: limit-cycled at U-ortho ~10)."""
    a = rng.standard_normal((300, 300)).astype(np.float32)
    u, s, v = svd(jnp.asarray(a), "parallel_jacobi")
    assert u.dtype == jnp.float32
    uo = np.linalg.norm(np.asarray(u.T @ u) - np.eye(300))
    assert uo < 1e-3, uo
    s_np = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, atol=2e-4 * s_np[0])


@pytest.mark.parametrize("apply", ["scatter", "gemm"])
def test_scalar_engines_f32(apply, rng):
    a = rng.standard_normal((96, 96)).astype(np.float32)
    u, s, v = jacobi_svd(jnp.asarray(a), apply=apply)
    s_np = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, atol=1e-4 * s_np[0])
    assert np.linalg.norm(np.asarray(u.T @ u) - np.eye(96)) < 1e-4


def test_equal_norm_columns_f32():
    """sign(0) regression: constant matrix needs a 45-degree rotation."""
    u, s, v = jacobi_svd(jnp.ones((4, 4), jnp.float32))
    np.testing.assert_allclose(np.asarray(s), [4.0, 0, 0, 0], atol=1e-5)
    u, s, v = svd(jnp.full((8, 8), 3.0, jnp.float32), "parallel_jacobi")
    np.testing.assert_allclose(float(s[0]), 24.0, rtol=1e-6)


def test_rsvd_f32_low_rank(rng):
    a = (rng.standard_normal((256, 12)) @
         rng.standard_normal((12, 200))).astype(np.float32)
    u, s, v = rsvd(jnp.asarray(a), k=12, p=8, q=2)
    err = float(reconstruction_error(a, u, s, v))
    assert err < 1e-3 * np.linalg.norm(a)
