"""Randomized Tucker / ST-HOSVD (rsvd/tucker.py): exact recovery at full
multilinear rank, factor orthonormality, adaptive rank selection, and the
unfold/fold/mode_dot algebra."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.tucker import (
    _fold,
    _unfold,
    mode_dot,
    tucker,
    tucker_adaptive,
    tucker_reconstruct,
)


def _low_mlrank_tensor(shape, ranks, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    core = rng.standard_normal(ranks)
    t = core
    for mode, (n, r) in enumerate(zip(shape, ranks)):
        u = np.linalg.qr(rng.standard_normal((n, r)))[0]
        t = np.moveaxis(np.tensordot(u, np.moveaxis(t, mode, 0),
                                     axes=(1, 0)), 0, mode)
    if noise:
        t = t + noise * rng.standard_normal(shape)
    return t.astype(np.float64)


class TestAlgebra:
    def test_unfold_fold_roundtrip(self):
        t = jnp.asarray(np.random.default_rng(0).standard_normal((3, 4, 5)))
        for mode in range(3):
            np.testing.assert_array_equal(
                np.asarray(_fold(_unfold(t, mode), mode, t.shape)),
                np.asarray(t))

    def test_mode_dot_matches_numpy(self):
        rng = np.random.default_rng(1)
        t = rng.standard_normal((3, 4, 5))
        m = rng.standard_normal((7, 4))
        got = np.asarray(mode_dot(jnp.asarray(t), jnp.asarray(m), 1))
        want = np.einsum("ijk,qj->iqk", t, m)
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestTucker:
    def test_exact_at_full_multilinear_rank(self):
        shape, ranks = (20, 16, 12), (4, 3, 5)
        t = _low_mlrank_tensor(shape, ranks, seed=2)
        core, factors = tucker(t, ranks, q=1, seed=0)
        assert core.shape == ranks
        rec = np.asarray(tucker_reconstruct(core, factors))
        assert np.linalg.norm(rec - t) / np.linalg.norm(t) < 1e-10

    def test_factors_orthonormal(self):
        t = _low_mlrank_tensor((18, 14, 10), (3, 4, 2), seed=3, noise=0.01)
        _, factors = tucker(t, (3, 4, 2), seed=1)
        for u in factors:
            g = np.asarray(u).T @ np.asarray(u)
            np.testing.assert_allclose(g, np.eye(u.shape[1]), atol=1e-10)

    def test_4d_and_rank_clipping(self):
        t = np.random.default_rng(4).standard_normal((6, 5, 4, 3))
        core, factors = tucker(t, (10, 2, 2, 2))  # rank > dim clips to 6
        assert core.shape == (6, 2, 2, 2)
        assert [f.shape for f in factors] == [(6, 6), (5, 2), (4, 2), (3, 2)]

    def test_error_decreases_with_rank(self):
        t = _low_mlrank_tensor((24, 20, 16), (6, 6, 6), seed=5, noise=0.05)
        errs = []
        for r in (2, 4, 6):
            core, factors = tucker(t, (r, r, r), seed=0)
            rec = np.asarray(tucker_reconstruct(core, factors))
            errs.append(np.linalg.norm(rec - t))
        assert errs[0] > errs[1] > errs[2]

    def test_wrong_rank_count_raises(self):
        with pytest.raises(ValueError):
            tucker(np.zeros((3, 3, 3)), (2, 2))

    def test_pythagorean_identity(self):
        # the reconstruction is a composition of orthogonal projections,
        # so ||A - rec||^2 = ||A||^2 - ||core||^2 EXACTLY (each residual
        # is orthogonal to everything later projections keep) — a sharp
        # all-paths correctness invariant, no randomness involved
        t = np.random.default_rng(9).standard_normal((14, 12, 10))
        core, factors = tucker(t, (5, 4, 3), seed=0)
        rec = np.asarray(tucker_reconstruct(core, factors))
        lhs = np.linalg.norm(t - rec) ** 2
        rhs = np.linalg.norm(t) ** 2 - np.linalg.norm(np.asarray(core)) ** 2
        np.testing.assert_allclose(lhs, rhs, rtol=1e-9)

    def test_over_asked_ranks_clip_consistently(self):
        # mode 0's unfolding shrinks to 2x2=4 columns once the other two
        # modes are contracted first — the returned core/factors must
        # agree on the clipped rank, never silently mismatch
        t = np.random.default_rng(8).standard_normal((6, 50, 50))
        core, factors = tucker(t, (30, 2, 2))
        assert core.shape == (4, 2, 2)
        assert [f.shape for f in factors] == [(6, 4), (50, 2), (50, 2)]


class TestVideoTucker:
    def test_temporal_redundancy_beats_per_frame(self):
        # synthetic slowly-varying video: 4 spatial modes with smooth
        # temporal coefficients -> multilinear rank (4, 4, 4)
        from rsvd_kamaneh_raganato_terrana_tpu.apps.image import (
            compress_video,
            compress_video_tucker,
            reconstruct_video,
            reconstruct_video_tucker,
        )

        rng = np.random.default_rng(10)
        t_len, h, w, r = 32, 48, 40, 4
        us = np.linalg.qr(rng.standard_normal((h, r)))[0]
        vs = np.linalg.qr(rng.standard_normal((w, r)))[0]
        tt = np.linspace(0, 1, t_len)[:, None]
        coef = np.cos(tt * np.arange(1, r + 1) * np.pi)       # smooth in t
        frames = np.einsum("tr,ir,jr->tij", coef, us, vs)

        core, factors = compress_video_tucker(frames, (r, r, r),
                                              dtype=jnp.float64)
        rec_t = reconstruct_video_tucker(core, factors)
        err_t = np.linalg.norm(rec_t - frames) / np.linalg.norm(frames)
        assert err_t < 1e-8

        u, s, v = compress_video(frames, k=r, dtype=jnp.float64)
        rec_f = reconstruct_video(u, s, v)
        err_f = np.linalg.norm(rec_f - frames) / np.linalg.norm(frames)

        storage_t = core.size + sum(f.size for f in factors)
        storage_f = u.size + s.size + v.size
        # same error class, a fraction of the storage
        assert err_t < max(err_f, 1e-8) * 10
        assert storage_t < 0.2 * storage_f


class TestTuckerAdaptive:
    def test_meets_tolerance(self):
        t = _low_mlrank_tensor((25, 20, 15), (5, 4, 3), seed=6, noise=1e-9)
        core, factors, ranks = tucker_adaptive(t, tol=1e-6)
        rec = np.asarray(tucker_reconstruct(core, factors))
        rel = np.linalg.norm(rec - t) / np.linalg.norm(t)
        assert rel <= 1e-6
        # ranks should be near the true multilinear rank, not the caps
        assert all(r <= tr + 2 for r, tr in zip(ranks, (5, 4, 3)))

    def test_rank_cap_respected(self):
        t = np.random.default_rng(7).standard_normal((20, 20, 20))
        _, factors, ranks = tucker_adaptive(t, tol=1e-12,
                                            rank_cap=(4, 5, 6))
        assert ranks == (4, 5, 6)
        assert [f.shape[1] for f in factors] == [4, 5, 6]
