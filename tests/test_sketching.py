"""Sparse sign embeddings (ops/sketching.py): norm preservation in
expectation, subspace-embedding quality, linearity/determinism, and the
sparse-sketch path of the preconditioned solver."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.ops.sketching import countsketch_apply


class TestCountSketch:
    def test_norm_preserved_in_expectation(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((300, 5)))
        norms = [float(jnp.sum(countsketch_apply(s, x, 128) ** 2))
                 for s in range(30)]
        true = float(jnp.sum(x * x))
        assert abs(np.mean(norms) - true) < 0.1 * true

    def test_subspace_embedding_quality(self):
        # orthonormal Q (m x n): singular values of S Q must concentrate
        # around 1 for s = 4n, t = 8 (the solver regime)
        rng = np.random.default_rng(1)
        m, n = 2000, 25
        q = np.linalg.qr(rng.standard_normal((m, n)))[0]
        sq = np.asarray(countsketch_apply(0, jnp.asarray(q), 4 * n))
        sv = np.linalg.svd(sq, compute_uv=False)
        assert 0.5 < sv[-1] and sv[0] < 1.5, (sv[0], sv[-1])

    def test_linear_and_deterministic(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((100, 4)))
        y = jnp.asarray(rng.standard_normal((100, 4)))
        sx = countsketch_apply(7, x, 64)
        sy = countsketch_apply(7, y, 64)
        sxy = countsketch_apply(7, x + 2.0 * y, 64)
        np.testing.assert_allclose(np.asarray(sxy),
                                   np.asarray(sx + 2.0 * sy), atol=1e-10)
        np.testing.assert_allclose(np.asarray(countsketch_apply(7, x, 64)),
                                   np.asarray(sx))

    def test_vector_input(self):
        v = jnp.asarray(np.random.default_rng(3).standard_normal(50))
        out = countsketch_apply(0, v, 16)
        assert out.shape == (16,)


class TestSparseLstsq:
    def test_sparse_kind_matches_numpy(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import sketch_lstsq

        rng = np.random.default_rng(4)
        u, _ = np.linalg.qr(rng.standard_normal((1200, 20)))
        v, _ = np.linalg.qr(rng.standard_normal((20, 20)))
        s = np.logspace(0, -6, 20)          # cond 1e6
        a = (u * s[None, :]) @ v.T
        b = rng.standard_normal(1200)
        x = np.asarray(sketch_lstsq(a, b, kind="sparse", seed=0))
        x_np = np.linalg.lstsq(a, b, rcond=None)[0]
        np.testing.assert_allclose(x, x_np, rtol=1e-6, atol=1e-8)
