"""Randomized tensor-train (rsvd/tt.py): exact recovery at true TT ranks,
reconstruction-error decay, adaptive rank selection, ratio accounting."""

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.tt import (
    tt_adaptive,
    tt_compression_ratio,
    tt_decompose,
    tt_ranks,
    tt_reconstruct,
)


def _tt_tensor(shape, ranks, seed=0, noise=0.0):
    """Build an exact TT tensor with the given internal ranks."""
    rng = np.random.default_rng(seed)
    rs = (1,) + tuple(ranks) + (1,)
    cores = [rng.standard_normal((rs[i], n, rs[i + 1]))
             for i, n in enumerate(shape)]
    out = cores[0]
    for c in cores[1:]:
        out = np.tensordot(out, c, axes=((out.ndim - 1,), (0,)))
    t = out[0, ..., 0]
    if noise:
        t = t + noise * rng.standard_normal(shape)
    return t


class TestTT:
    def test_exact_recovery_at_true_ranks(self):
        shape, ranks = (8, 9, 7, 6), (3, 4, 2)
        t = _tt_tensor(shape, ranks, seed=0)
        cores = tt_decompose(t, ranks, q=1, seed=0)
        assert tt_ranks(cores) == ranks
        rec = np.asarray(tt_reconstruct(cores))
        assert np.linalg.norm(rec - t) / np.linalg.norm(t) < 1e-10

    def test_core_shapes_and_boundary_ranks(self):
        t = _tt_tensor((5, 6, 7), (2, 3), seed=1)
        cores = tt_decompose(t, (2, 3))
        assert cores[0].shape == (1, 5, 2)
        assert cores[1].shape == (2, 6, 3)
        assert cores[2].shape == (3, 7, 1)

    def test_error_decreases_with_rank(self):
        t = _tt_tensor((10, 10, 10), (6, 6), seed=2, noise=0.02)
        errs = []
        for r in (2, 4, 6):
            rec = np.asarray(tt_reconstruct(tt_decompose(t, (r, r))))
            errs.append(np.linalg.norm(rec - t))
        assert errs[0] > errs[1] > errs[2]

    def test_wrong_rank_count_raises(self):
        with pytest.raises(ValueError):
            tt_decompose(np.zeros((3, 3, 3)), (2,))

    def test_pythagorean_identity(self):
        # TT-SVD is also a composition of orthogonal projections, so
        # ||A - TT||^2 = ||A||^2 - ||TT||^2 exactly (same telescoping
        # argument as Tucker's) — holds for ANY ranks, randomized or not
        t = np.random.default_rng(9).standard_normal((10, 9, 8, 7))
        cores = tt_decompose(t, (3, 4, 3), seed=1)
        rec = np.asarray(tt_reconstruct(cores))
        lhs = np.linalg.norm(t - rec) ** 2
        rhs = np.linalg.norm(t) ** 2 - np.linalg.norm(rec) ** 2
        np.testing.assert_allclose(lhs, rhs, rtol=1e-9)

    def test_quantized_reshape_compresses_smooth_signal(self):
        # the classic QTT use case: a smooth 1-D signal reshaped to
        # 2x2x...x2 has tiny TT ranks
        x = np.linspace(0, 1, 2 ** 8)
        sig = np.exp(-3 * x) * np.sin(7 * np.pi * x)
        t = sig.reshape((2,) * 8)
        cores, ranks = tt_adaptive(t, tol=1e-8, rank_cap=16)
        rec = np.asarray(tt_reconstruct(cores)).reshape(-1)
        assert np.linalg.norm(rec - sig) / np.linalg.norm(sig) < 1e-7
        assert tt_compression_ratio(cores) > 2.0
        assert max(ranks) <= 16


class TestTTAdaptive:
    def test_meets_tolerance_near_true_ranks(self):
        t = _tt_tensor((12, 10, 8, 6), (3, 4, 2), seed=3, noise=1e-10)
        cores, ranks = tt_adaptive(t, tol=1e-6)
        rec = np.asarray(tt_reconstruct(cores))
        rel = np.linalg.norm(rec - t) / np.linalg.norm(t)
        assert rel <= 1e-6
        assert all(r <= tr + 2 for r, tr in zip(ranks, (3, 4, 2)))
