"""Randomized interpolative (ID) and CUR decompositions (rsvd/interp.py)."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.interp import (
    column_id,
    cur,
    cur_reconstruct,
    id_reconstruct,
    row_id,
)


def _low_rank(m, n, k, seed=0, noise=0.0):
    rng = np.random.default_rng(seed)
    a = rng.standard_normal((m, k)) @ rng.standard_normal((k, n))
    if noise:
        a = a + noise * rng.standard_normal((m, n))
    return a


class TestColumnID:
    def test_exact_on_low_rank(self):
        a = _low_rank(120, 90, 8, seed=0)
        cols, x = column_id(jnp.asarray(a), k=8, p=8)
        err = np.linalg.norm(a - np.asarray(id_reconstruct(a, cols, x)))
        assert err < 1e-8 * np.linalg.norm(a)

    def test_pivots_unique_and_in_range(self):
        a = _low_rank(64, 48, 6, seed=1, noise=1e-3)
        cols, _ = column_id(jnp.asarray(a), k=6)
        cols = np.asarray(cols)
        assert len(np.unique(cols)) == 6
        assert cols.min() >= 0 and cols.max() < 48

    def test_selected_columns_represent_themselves(self):
        a = _low_rank(80, 60, 5, seed=2)
        cols, x = column_id(jnp.asarray(a), k=5)
        sub = np.asarray(x)[:, np.asarray(cols)]
        np.testing.assert_allclose(sub, np.eye(5), atol=1e-8)

    def test_near_optimal_on_noisy(self):
        a = _low_rank(100, 100, 10, seed=3, noise=1e-4)
        cols, x = column_id(jnp.asarray(a), k=10, p=10)
        err = np.linalg.norm(a - np.asarray(id_reconstruct(a, cols, x)))
        s = np.linalg.svd(a, compute_uv=False)
        opt = np.sqrt(np.sum(s[10:] ** 2))
        # ID on a sketch is within a modest factor of the optimal rank-k
        assert err < 20.0 * opt

    def test_deterministic(self):
        a = _low_rank(64, 48, 6, seed=4, noise=1e-3)
        c1, x1 = column_id(jnp.asarray(a), k=6, seed=7)
        c2, x2 = column_id(jnp.asarray(a), k=6, seed=7)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2))


class TestRowIDAndCUR:
    def test_row_id_exact_on_low_rank(self):
        a = _low_rank(90, 120, 7, seed=5)
        rows, x = row_id(jnp.asarray(a), k=7, p=8)
        rec = np.asarray(x) @ a[np.asarray(rows), :]
        assert np.linalg.norm(a - rec) < 1e-8 * np.linalg.norm(a)

    def test_cur_exact_on_low_rank(self):
        a = _low_rank(100, 80, 6, seed=6)
        cols, rows, u = cur(jnp.asarray(a), k=6, p=8)
        rec = np.asarray(cur_reconstruct(a, cols, rows, u))
        assert np.linalg.norm(a - rec) < 1e-7 * np.linalg.norm(a)

    def test_cur_noisy_bounded(self):
        a = _low_rank(100, 80, 8, seed=7, noise=1e-4)
        cols, rows, u = cur(jnp.asarray(a), k=8, p=10)
        rec = np.asarray(cur_reconstruct(a, cols, rows, u))
        s = np.linalg.svd(a, compute_uv=False)
        opt = np.sqrt(np.sum(s[8:] ** 2))
        assert np.linalg.norm(a - rec) < 50.0 * opt


class TestLeverage:
    def test_scores_match_exact_subspace(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.interp import (
            leverage_scores,
        )

        rng = np.random.default_rng(40)
        u = np.linalg.qr(rng.standard_normal((80, 4)))[0]
        a = u @ rng.standard_normal((4, 50))
        s = np.asarray(leverage_scores(a, 4, seed=1))
        np.testing.assert_allclose(s, (u ** 2).sum(axis=1), atol=1e-8)
        np.testing.assert_allclose(s.sum(), 4.0, rtol=1e-9)

    def test_column_axis(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.interp import (
            leverage_scores,
        )

        rng = np.random.default_rng(41)
        v = np.linalg.qr(rng.standard_normal((30, 3)))[0]
        a = rng.standard_normal((50, 3)) @ v.T
        s = np.asarray(leverage_scores(a, 3, axis=1, seed=2))
        np.testing.assert_allclose(s, (v ** 2).sum(axis=1), atol=1e-8)

    def test_sampling_distinct_and_importance_weighted(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.interp import (
            leverage_sample,
        )

        rng = np.random.default_rng(42)
        # one row carries almost all the rank-1 energy
        a = np.outer(np.r_[10.0, 0.1 * np.ones(99)],
                     rng.standard_normal(20))
        a += 1e-6 * rng.standard_normal(a.shape)
        idx, scores = leverage_sample(a, 1, 5, seed=0)
        idx = np.asarray(idx)
        assert len(set(idx.tolist())) == 5          # distinct
        assert 0 in idx.tolist()                    # dominant row sampled
