"""Pallas kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
    fused_sketch_matmul,
    quantize_uint8,
)


def test_fused_sketch_statistics(rng):
    """Y = A Omega with in-kernel Omega: verify by recovering Omega via
    A = I, then checking normality + determinism."""
    n, l = 256, 16
    eye = jnp.eye(n, dtype=jnp.float32)
    omega = np.asarray(fused_sketch_matmul(eye, l, seed=1, block_m=128,
                                           block_k=128, interpret=True))
    assert omega.shape == (n, l)
    assert abs(omega.mean()) < 0.1
    assert 0.85 < omega.std() < 1.15
    # deterministic
    omega2 = np.asarray(fused_sketch_matmul(eye, l, seed=1, block_m=128,
                                            block_k=128, interpret=True))
    np.testing.assert_array_equal(omega, omega2)
    # different seed -> different draw
    omega3 = np.asarray(fused_sketch_matmul(eye, l, seed=2, block_m=128,
                                            block_k=128, interpret=True))
    assert not np.array_equal(omega, omega3)


def test_fused_sketch_is_matmul(rng):
    """Y must equal A @ Omega with the same Omega (recovered via identity)."""
    n, l = 256, 8
    a = rng.standard_normal((128, n)).astype(np.float32)
    eye = jnp.eye(n, dtype=jnp.float32)
    kw = dict(l=l, seed=3, block_m=128, block_k=128, interpret=True)
    omega = np.asarray(fused_sketch_matmul(eye, **kw))
    y = np.asarray(fused_sketch_matmul(jnp.asarray(a), **kw))
    np.testing.assert_allclose(y, a @ omega, rtol=1e-4, atol=1e-4)


def test_fused_sketch_in_rsvd_pipeline(rng):
    """Full rSVD using the fused sketch: reconstruction quality matches the
    threefry-sketch pipeline on a low-rank matrix."""
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_with_omega

    a = (rng.standard_normal((256, 12)) @
         rng.standard_normal((12, 256))).astype(np.float32)
    a_dev = jnp.asarray(a)
    y = fused_sketch_matmul(a_dev, 24, seed=0, block_m=128, block_k=128,
                            interpret=True)
    # finish the pipeline manually from Y
    q = orthonormal_basis(y.astype(jnp.float32))
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd as small_svd

    b = q.T @ a_dev
    u_t, s, v = small_svd(b, "jacobi")
    u = q @ u_t
    recon = np.asarray((u * s[None, :]) @ v.T)
    rel = np.linalg.norm(recon - a) / np.linalg.norm(a)
    assert rel < 1e-4


def test_fused_sketch_ragged_dims(rng):
    """Dims with large odd prime factors pad up to block multiples instead
    of collapsing to 1-wide blocks (ADVICE round 1); padding must be exact
    and must not perturb the draw for in-range rows."""
    n, l = 257, 8  # 257 is prime
    a = rng.standard_normal((300, n)).astype(np.float32)  # 300 = 4*3*25
    eye = jnp.eye(n, dtype=jnp.float32)
    kw = dict(l=l, seed=3, block_m=128, block_k=128, interpret=True)
    omega = np.asarray(fused_sketch_matmul(eye, **kw))
    y = np.asarray(fused_sketch_matmul(jnp.asarray(a), **kw))
    assert y.shape == (300, l)
    np.testing.assert_allclose(y, a @ omega, rtol=1e-4, atol=1e-4)


def test_quantize_uint8_ragged(rng):
    """Odd sizes and 1-D inputs go through the tiled path unchanged."""
    for shape in ((37, 53), (1000,), (3, 5, 7)):
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32)) * 3.0
        q, scale, lo = quantize_uint8(x, interpret=True)
        assert q.shape == x.shape
        back = np.asarray(q, dtype=np.float64) * float(scale) + float(lo)
        assert np.abs(back - np.asarray(x)).max() <= float(scale) * 0.51 + 1e-6


def test_quantize_uint8(rng):
    x = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32)) * 5.0
    q, scale, lo = quantize_uint8(x, interpret=True)
    assert q.dtype == jnp.uint8
    back = np.asarray(q, dtype=np.float64) * float(scale) + float(lo)
    assert np.abs(back - np.asarray(x)).max() <= float(scale) * 0.51 + 1e-6


def test_eigh_small_matches_numpy(rng):
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
        eigh_small,
    )

    n = 24
    b = rng.standard_normal((n, 3 * n)).astype(np.float32)
    g = b @ b.T
    lam, v = eigh_small(jnp.asarray(g), interpret=True)
    lam_ref = np.linalg.eigvalsh(g.astype(np.float64))
    assert np.abs(np.asarray(lam, np.float64) - lam_ref).max() \
        / lam_ref.max() < 1e-4
    vv = np.asarray(v)
    assert np.abs(vv.T @ vv - np.eye(n)).max() < 1e-3
    rec = (vv * np.asarray(lam)[None, :]) @ vv.T
    assert np.linalg.norm(rec - g) / np.linalg.norm(g) < 1e-4


def test_eigh_small_padding_and_rank_deficiency(rng):
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
        eigh_small,
    )

    n, r = 21, 6  # odd size forces padding; rank 6 < n
    b = rng.standard_normal((n, r)).astype(np.float32)
    g = b @ b.T
    lam, v = eigh_small(jnp.asarray(g), interpret=True)
    lam = np.asarray(lam, np.float64)
    assert lam.shape == (n,)
    # pad eigenpairs must not leak in: all returned eigs >= ~0
    assert lam.min() > -1e-3
    lam_ref = np.linalg.eigvalsh(g.astype(np.float64))
    assert np.abs(np.sort(lam) - lam_ref).max() / lam_ref.max() < 1e-4


class TestStochasticQuantizer:
    def test_within_one_step_of_deterministic(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
            quantize_uint8,
        )

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((30, 20)).astype(np.float32))
        qd, sc, lo = quantize_uint8(x)
        qs, sc2, lo2 = quantize_uint8(x, stochastic=True, seed=1)
        assert float(sc) == float(sc2) and float(lo) == float(lo2)
        diff = np.abs(np.asarray(qs, np.int32) - np.asarray(qd, np.int32))
        assert diff.max() <= 1

    def test_mean_unbiased(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
            quantize_uint8,
        )

        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.random((20, 16)).astype(np.float32))
        n = 200
        acc = np.zeros(x.shape, np.float64)
        for s in range(n):
            q, sc, lo = quantize_uint8(x, stochastic=True, seed=s)
            acc += np.asarray(q, np.float64) * float(sc) + float(lo)
        bias = np.abs(acc / n - np.asarray(x))
        # per-entry stderr = scale/2/sqrt(n); allow 6 sigma on the max
        assert bias.max() < 6.0 * float(sc) / 2.0 / np.sqrt(n)

    def test_grid_values_exact(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
            quantize_uint8,
        )

        # values exactly on the quantization grid have frac = 0: the
        # stochastic path must reproduce them deterministically
        x = jnp.asarray(np.linspace(0, 255, 256, dtype=np.float32))
        q, sc, lo = quantize_uint8(x, stochastic=True, seed=3)
        np.testing.assert_allclose(
            np.asarray(q, np.float64) * float(sc) + float(lo),
            np.asarray(x), atol=1e-5)
