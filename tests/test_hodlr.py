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


class TestImplicitBuild:
    """hodlr_build_implicit: compression without materializing A —
    the build path for sizes where dense A exceeds HBM
    (bench_results/hodlr_sweep.csv: 65536^2 f32 = 17 GB)."""

    def test_matches_dense_build_reconstruction(self):
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            hodlr_build,
            hodlr_build_implicit,
            hodlr_matvec,
            hodlr_reconstruct,
        )

        n = 256
        x = np.linspace(0.0, 1.0, n)
        a_np = np.exp(-8.0 * np.abs(x[:, None] - x[None, :])).astype(
            np.float32)

        def block_fn(i0, j0, rows, cols):
            return a_np[i0:i0 + rows, j0:j0 + cols]

        hi = hodlr_build_implicit(block_fn, n, levels=3, k=8)
        hd = hodlr_build(a_np, levels=3, k=8)
        rec_i = np.asarray(hodlr_reconstruct(hi))
        rec_d = np.asarray(hodlr_reconstruct(hd))
        # both compress the same smooth kernel to the same accuracy
        err_i = np.linalg.norm(rec_i - a_np) / np.linalg.norm(a_np)
        err_d = np.linalg.norm(rec_d - a_np) / np.linalg.norm(a_np)
        assert err_i < 1e-4 and err_d < 1e-4
        # and agree with each other through the matvec
        import jax.numpy as jnp

        v = jnp.asarray(np.random.default_rng(0).standard_normal(n),
                        jnp.float32)
        np.testing.assert_allclose(np.asarray(hodlr_matvec(hi, v)),
                                   np.asarray(hodlr_matvec(hd, v)),
                                   rtol=1e-3, atol=1e-3)

    def test_device_block_fn_and_validation(self):
        import numpy as np
        import pytest

        import jax
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            hodlr_build_implicit,
            hodlr_matvec,
        )

        n = 128
        xs = jnp.linspace(0.0, 1.0, n)

        @jax.jit
        def kernel_block(xi, xj):
            return jnp.exp(-4.0 * jnp.abs(xi[:, None] - xj[None, :]))

        def block_fn(i0, j0, rows, cols):
            return kernel_block(jax.lax.dynamic_slice(xs, (i0,), (rows,)),
                                jax.lax.dynamic_slice(xs, (j0,), (cols,)))

        h = hodlr_build_implicit(block_fn, n, levels=2, k=8)
        y = hodlr_matvec(h, jnp.ones(n, jnp.float32))
        a_np = np.exp(-4.0 * np.abs(np.asarray(xs)[:, None]
                                    - np.asarray(xs)[None, :]))
        np.testing.assert_allclose(np.asarray(y), a_np.sum(axis=1),
                                   rtol=1e-3)
        with pytest.raises(ValueError):
            hodlr_build_implicit(block_fn, 130, levels=2, k=8)

    def test_implicit_build_is_dtype_agnostic(self):
        """An f64 block_fn must yield f64 sketches/factors and exact
        parity with the dense f64 build (round-5 advisor finding:
        the implicit sketch dtype was hardcoded to f32)."""
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            hodlr_build,
            hodlr_build_implicit,
        )

        n = 128
        x = np.linspace(0.0, 1.0, n)
        a_np = np.exp(-8.0 * np.abs(x[:, None] - x[None, :]))
        assert a_np.dtype == np.float64

        def block_fn(i0, j0, rows, cols):
            return a_np[i0:i0 + rows, j0:j0 + cols]

        hi = hodlr_build_implicit(block_fn, n, levels=2, k=8)
        hd = hodlr_build(a_np, levels=2, k=8)
        assert hi.u_upper[0].dtype == hd.u_upper[0].dtype == np.float64
        for fi, fd in zip(hi.u_upper, hd.u_upper):
            np.testing.assert_array_equal(np.asarray(fi), np.asarray(fd))
        for fi, fd in zip(hi.v_lower, hd.v_lower):
            np.testing.assert_array_equal(np.asarray(fi), np.asarray(fd))
