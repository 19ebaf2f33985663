"""CP-ALS (rsvd/cp.py): recovery of synthetic CP tensors, factor
conventions, Khatri-Rao/unfolding consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.cp import (
    cp_decompose,
    cp_reconstruct,
    khatri_rao,
)


def _cp_tensor(shape, rank, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    factors = [rng.standard_normal((n, rank)) for n in shape]
    w = np.sort(rng.uniform(1.0, 3.0, rank))[::-1]
    subs = "".join(chr(ord("a") + i) for i in range(len(shape)))
    ein = ",".join(f"{c}z" for c in subs) + ",z->" + subs
    t = np.einsum(ein, *factors, w)
    if noise:
        t = t + noise * rng.standard_normal(shape)
    return t


class TestKhatriRao:
    def test_matches_unfolded_outer_products(self):
        rng = np.random.default_rng(1)
        b, c = rng.standard_normal((4, 3)), rng.standard_normal((5, 3))
        kr = np.asarray(khatri_rao([jnp.asarray(b), jnp.asarray(c)]))
        want = np.stack([np.outer(b[:, r], c[:, r]).reshape(-1)
                         for r in range(3)], axis=1)
        np.testing.assert_allclose(kr, want, atol=1e-12)


class TestCP:
    def test_recovers_exact_cp_tensor(self):
        t = _cp_tensor((12, 10, 8), 3, seed=2)
        w, factors = cp_decompose(t, 3, iters=30, seed=0)
        rec = np.asarray(cp_reconstruct(w, factors))
        assert np.linalg.norm(rec - t) / np.linalg.norm(t) < 1e-6

    def test_conventions(self):
        t = _cp_tensor((9, 7, 6), 2, seed=3)
        w, factors = cp_decompose(t, 2, iters=20)
        w = np.asarray(w)
        assert w[0] >= w[1] > 0
        for f in factors:
            np.testing.assert_allclose(np.linalg.norm(np.asarray(f), axis=0),
                                       1.0, rtol=1e-6)

    def test_4way_noisy(self):
        t = _cp_tensor((8, 7, 6, 5), 2, seed=4, noise=1e-3)
        w, factors = cp_decompose(t, 2, iters=30, seed=1)
        rec = np.asarray(cp_reconstruct(w, factors))
        assert np.linalg.norm(rec - t) / np.linalg.norm(t) < 5e-3

    def test_matrix_case_matches_svd_energy(self):
        # d=2 CP is just a low-rank matrix factorization
        rng = np.random.default_rng(5)
        a = rng.standard_normal((20, 4)) @ rng.standard_normal((4, 15))
        w, factors = cp_decompose(a, 4, iters=30)
        rec = np.asarray(cp_reconstruct(w, factors))
        assert np.linalg.norm(rec - a) / np.linalg.norm(a) < 1e-8

    def test_zero_tensor_yields_zero_weights_not_nan(self):
        w, factors = cp_decompose(np.zeros((6, 5, 4)), 2, iters=5)
        assert np.all(np.isfinite(np.asarray(w)))
        np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-12)
        for f in factors:
            assert np.all(np.isfinite(np.asarray(f)))

    def test_ndim_guard(self):
        with pytest.raises(ValueError):
            cp_decompose(np.zeros(5), 2)
        with pytest.raises(ValueError):
            cp_decompose(np.zeros((3, 3)), 2, method="magic")


class TestCPRAND:
    def test_fiber_sampled_recovers_cp_tensor(self):
        t = _cp_tensor((16, 14, 12), 3, seed=6)
        w, factors = cp_decompose(t, 3, iters=60, seed=0, method="rand",
                                  num_samples=96)
        rec = np.asarray(cp_reconstruct(w, factors))
        assert np.linalg.norm(rec - t) / np.linalg.norm(t) < 1e-3

    def test_rand_conventions_match_als(self):
        t = _cp_tensor((10, 9, 8), 2, seed=7)
        w, factors = cp_decompose(t, 2, iters=40, method="rand")
        w = np.asarray(w)
        assert w[0] >= w[1] > 0
        for f in factors:
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(f), axis=0), 1.0, rtol=1e-5)
