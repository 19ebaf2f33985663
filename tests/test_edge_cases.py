"""Degenerate-shape and pathological-input edge cases across the public
API (vectors, 1x1, zero matrices, tiny sketches)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.linalg import (
    cholesky_qr2,
    jacobi_svd,
    qr_reduced,
    svd,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd


def test_svd_one_by_one():
    u, s, v = svd(jnp.asarray([[3.0]]), "jacobi")
    assert float(s[0]) == pytest.approx(3.0)
    assert abs(float(u[0, 0])) == pytest.approx(1.0)


def test_svd_column_vector(rng):
    a = rng.standard_normal((20, 1))
    u, s, v = svd(jnp.asarray(a), "parallel_jacobi")
    assert float(s[0]) == pytest.approx(np.linalg.norm(a), rel=1e-10)


def test_svd_row_vector(rng):
    a = rng.standard_normal((1, 15))
    u, s, v = svd(jnp.asarray(a), "jacobi")
    assert float(s[0]) == pytest.approx(np.linalg.norm(a), rel=1e-10)


def test_svd_zero_matrix():
    a = jnp.zeros((10, 6))
    for method in ("jacobi", "eigh"):
        u, s, v = svd(a, method)
        assert np.allclose(np.asarray(s), 0.0)
        assert np.isfinite(np.asarray(u)).all()


def test_qr_single_column(rng):
    a = rng.standard_normal((30, 1))
    q, r = qr_reduced(jnp.asarray(a), "robust")
    np.testing.assert_allclose(np.asarray(q @ r), a, atol=1e-12)
    assert float(jnp.linalg.norm(q)) == pytest.approx(1.0, rel=1e-10)


def test_qr_zero_matrix_stays_finite():
    q, r = cholesky_qr2(jnp.zeros((12, 4)))
    assert np.isfinite(np.asarray(q)).all()
    assert np.allclose(np.asarray(q) @ np.asarray(r), 0.0)


def test_rsvd_sketch_larger_than_matrix(rng):
    a = rng.standard_normal((10, 8))
    u, s, v = rsvd(jnp.asarray(a), k=0, p=50, q=1)  # l clamps to min dim
    assert s.shape[0] == 8
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-6)


def test_rsvd_k_equals_min_dim(rng):
    a = rng.standard_normal((12, 9))
    u, s, v = rsvd(jnp.asarray(a), k=9, p=4, q=2)
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-6)


def test_jacobi_tiny_blocks(rng):
    a = rng.standard_normal((10, 6))
    u, s, v = jacobi_svd(jnp.asarray(a), apply="block", block_size=2)
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-9)


def test_constant_matrix(rng):
    a = jnp.full((16, 12), 7.0)  # rank 1
    u, s, v = svd(a, "jacobi")
    assert float(s[0]) == pytest.approx(7.0 * np.sqrt(16 * 12), rel=1e-9)
    assert np.all(np.asarray(s)[1:] < 1e-9 * float(s[0]))

class TestComplexRejection:
    """The pipeline is real-only (plain transposes, like the reference's
    Eigen::MatrixXd stack); complex input must be REFUSED, not silently
    mis-factorized (measured: rank-5 'factorization' of a complex 40x30
    had error above the optimal rank-5 residual before this guard)."""

    def test_rsvd_rejects_complex(self):
        import jax.numpy as jnp
        import numpy as np
        import pytest

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        a = jnp.asarray(np.ones((8, 6)) + 1j * np.ones((8, 6)))
        with pytest.raises(TypeError, match="real"):
            rsvd(a, k=2)

    def test_svd_engines_reject_complex_but_xla_works(self):
        import jax.numpy as jnp
        import numpy as np
        import pytest

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.standard_normal((8, 6))
                        + 1j * rng.standard_normal((8, 6)))
        with pytest.raises(TypeError, match="real-only"):
            svd(a, "jacobi")
        u, s, v = svd(a, "xla")
        rec = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v).conj().T
        np.testing.assert_allclose(rec, np.asarray(a), atol=1e-10)
