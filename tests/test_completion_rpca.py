"""Matrix completion (rsvd/completion.py) and robust PCA (rsvd/rpca.py)."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.completion import complete_lowrank
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.rpca import rpca


def _low_rank(m, n, k, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    return scale * (rng.standard_normal((m, k)) / np.sqrt(k)
                    ) @ rng.standard_normal((k, n))


class TestCompletion:
    def test_recovers_low_rank_from_partial_entries(self):
        rng = np.random.default_rng(1)
        a = _low_rank(80, 60, 4, seed=1)
        mask = rng.random((80, 60)) < 0.5
        res = complete_lowrank(jnp.asarray(a), jnp.asarray(mask), k=4,
                               iters=40)
        x = np.asarray(res.u) @ np.diag(np.asarray(res.s)) @ np.asarray(res.v).T
        rel = np.linalg.norm(x - a) / np.linalg.norm(a)
        assert rel < 1e-3         # full-matrix recovery, unobserved included

    def test_unobserved_values_never_read(self):
        rng = np.random.default_rng(2)
        a = _low_rank(60, 50, 3, seed=2)
        mask = rng.random((60, 50)) < 0.6
        a_poisoned = np.where(mask, a, 1e6)      # garbage off-mask
        res = complete_lowrank(jnp.asarray(a_poisoned), jnp.asarray(mask),
                               k=3, iters=40)
        x = np.asarray(res.u) @ np.diag(np.asarray(res.s)) @ np.asarray(res.v).T
        assert np.linalg.norm(x - a) / np.linalg.norm(a) < 1e-3

    def test_rmse_trace_decreases(self):
        rng = np.random.default_rng(3)
        a = _low_rank(50, 50, 5, seed=3)
        mask = rng.random((50, 50)) < 0.7
        res = complete_lowrank(jnp.asarray(a), jnp.asarray(mask), k=5,
                               iters=25)
        rmse = np.asarray(res.obs_rmse)
        assert rmse[-1] < 1e-4 * rmse[0]
        assert np.all(np.isfinite(rmse))

    def test_factor_shapes(self):
        a = _low_rank(40, 30, 2, seed=4)
        mask = np.ones((40, 30), bool)
        res = complete_lowrank(jnp.asarray(a), jnp.asarray(mask), k=2,
                               iters=5)
        assert res.u.shape == (40, 2)
        assert res.s.shape == (2,)
        assert res.v.shape == (30, 2)


class TestTuckerCompletion:
    def _low_multilinear(self, shape=(30, 40, 50), ranks=(3, 4, 5), seed=0):
        rng = np.random.default_rng(seed)
        core = rng.standard_normal(ranks)
        t = core
        for mode, (n, r) in enumerate(zip(shape, ranks)):
            u, _ = np.linalg.qr(rng.standard_normal((n, r)))
            t = np.moveaxis(np.tensordot(u, np.moveaxis(t, mode, 0),
                                         axes=((1,), (0,))), 0, mode)
        return t

    def test_recovers_tensor_from_partial_entries(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.completion import (
            complete_tucker,
        )
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.tucker import (
            tucker_reconstruct,
        )

        t = self._low_multilinear()
        rng = np.random.default_rng(1)
        mask = rng.random(t.shape) < 0.4
        res = complete_tucker(jnp.asarray(t), jnp.asarray(mask),
                              ranks=(3, 4, 5), iters=40)
        x = np.asarray(tucker_reconstruct(res.core, res.factors))
        assert np.linalg.norm(x - t) < 1e-3 * np.linalg.norm(t)
        rmse = np.asarray(res.obs_rmse)
        assert rmse[-1] < 1e-3 * rmse[0]

    def test_unobserved_never_read(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.completion import (
            complete_tucker,
        )
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.tucker import (
            tucker_reconstruct,
        )

        t = self._low_multilinear(seed=2)
        rng = np.random.default_rng(3)
        mask = rng.random(t.shape) < 0.5
        poisoned = np.where(mask, t, 1e6)
        res = complete_tucker(jnp.asarray(poisoned), jnp.asarray(mask),
                              ranks=(3, 4, 5), iters=40)
        x = np.asarray(tucker_reconstruct(res.core, res.factors))
        assert np.linalg.norm(x - t) < 1e-3 * np.linalg.norm(t)


class TestRpca:
    def _corrupted(self, m=80, n=70, k=4, frac=0.05, mag=10.0, seed=5):
        rng = np.random.default_rng(seed)
        low = _low_rank(m, n, k, seed=seed)
        sp = np.zeros((m, n))
        idx = rng.random((m, n)) < frac
        sp[idx] = mag * rng.standard_normal(idx.sum())
        return low, sp

    def test_separates_low_rank_and_sparse(self):
        low, sp = self._corrupted()
        res = rpca(jnp.asarray(low + sp), k_max=8, iters=50)
        rel_l = (np.linalg.norm(np.asarray(res.low_rank) - low)
                 / np.linalg.norm(low))
        rel_s = (np.linalg.norm(np.asarray(res.sparse) - sp)
                 / np.linalg.norm(sp))
        assert rel_l < 5e-3
        assert rel_s < 5e-3
        assert int(res.rank) == 4

    def test_residual_converges(self):
        low, sp = self._corrupted(seed=6)
        res = rpca(jnp.asarray(low + sp), k_max=8, iters=50)
        r = np.asarray(res.resid)
        assert r[-1] < 1e-6
        assert r[-1] < r[0]

    def test_clean_input_gives_zero_sparse(self):
        low = _low_rank(60, 60, 3, seed=7)
        res = rpca(jnp.asarray(low), k_max=6, iters=40)
        assert (np.linalg.norm(np.asarray(res.sparse))
                < 1e-3 * np.linalg.norm(low))
        assert (np.linalg.norm(np.asarray(res.low_rank) - low)
                < 1e-3 * np.linalg.norm(low))
