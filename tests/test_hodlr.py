"""HODLR hierarchical low-rank compression (rsvd/hodlr.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import (
    hodlr_build,
    hodlr_compression_ratio,
    hodlr_matvec,
    hodlr_reconstruct,
)


def _rbf_kernel(n, ell=0.1, seed=0):
    """Gaussian kernel on 1D points: full-rank diagonal behavior, smooth
    (numerically low-rank) off-diagonal interactions — the HODLR case."""
    x = np.linspace(0, 1, n)
    k = np.exp(-((x[:, None] - x[None, :]) ** 2) / (2 * ell * ell))
    return k + 0.1 * np.eye(n)


class TestHodlr:
    def test_reconstruction_accuracy(self):
        a = _rbf_kernel(256)
        h = hodlr_build(jnp.asarray(a), levels=3, k=16)
        rec = np.asarray(hodlr_reconstruct(h))
        assert np.linalg.norm(rec - a) < 1e-6 * np.linalg.norm(a)

    @pytest.mark.slow
    def test_matvec_matches_dense(self):
        a = _rbf_kernel(512, ell=0.05)
        h = hodlr_build(jnp.asarray(a), levels=4, k=20)
        x = np.random.default_rng(1).standard_normal(512)
        y_h = np.asarray(hodlr_matvec(h, jnp.asarray(x)))
        y_d = a @ x
        assert np.linalg.norm(y_h - y_d) < 1e-6 * np.linalg.norm(y_d)

    def test_matvec_consistent_with_reconstruction(self):
        a = _rbf_kernel(128)
        h = hodlr_build(jnp.asarray(a), levels=2, k=12)
        x = np.random.default_rng(2).standard_normal(128)
        y_h = np.asarray(hodlr_matvec(h, jnp.asarray(x)))
        y_r = np.asarray(hodlr_reconstruct(h)) @ x
        np.testing.assert_allclose(y_h, y_r, atol=1e-8 * np.abs(y_r).max())

    @pytest.mark.slow
    def test_compression_ratio(self):
        a = _rbf_kernel(1024, ell=0.2)
        h = hodlr_build(jnp.asarray(a), levels=5, k=8)
        ratio = hodlr_compression_ratio(h)
        assert ratio > 4.0
        # and still accurate: ell=0.2 off-diagonals are very low-rank
        x = np.random.default_rng(3).standard_normal(1024)
        y_h = np.asarray(hodlr_matvec(h, jnp.asarray(x)))
        assert (np.linalg.norm(y_h - a @ x)
                < 1e-5 * np.linalg.norm(a @ x))

    def test_full_rank_diagonal_is_exact(self):
        """Leaves are stored dense, so a block-diagonal matrix (zero
        off-diagonal) reconstructs exactly regardless of k."""
        rng = np.random.default_rng(4)
        blocks = [rng.standard_normal((32, 32)) for _ in range(4)]
        a = np.zeros((128, 128))
        for i, b in enumerate(blocks):
            a[i * 32:(i + 1) * 32, i * 32:(i + 1) * 32] = b
        h = hodlr_build(jnp.asarray(a), levels=2, k=2)
        np.testing.assert_allclose(np.asarray(hodlr_reconstruct(h)), a,
                                   atol=1e-10)

    def test_invalid_inputs_raise(self):
        with pytest.raises(ValueError):
            hodlr_build(jnp.zeros((10, 12)), levels=1)
        with pytest.raises(ValueError):
            hodlr_build(jnp.zeros((100, 100)), levels=3)

    def test_deterministic(self):
        a = _rbf_kernel(128)
        h1 = hodlr_build(jnp.asarray(a), levels=2, k=8, seed=7)
        h2 = hodlr_build(jnp.asarray(a), levels=2, k=8, seed=7)
        np.testing.assert_array_equal(np.asarray(h1.u_upper[0]),
                                      np.asarray(h2.u_upper[0]))
