"""DEIM/Q-DEIM index selection + POD-DEIM nonlinear ROM (rsvd/deim.py,
apps/advdiff.py::solve_fom_reaction, apps/rom.py::solve_rom_deim)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff, rom
from rsvd_kamaneh_raganato_terrana_tpu.core.config import AdvDiffConfig
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.deim import (
    Deim,
    deim_condition,
    deim_fit,
    deim_indices,
    deim_interpolate,
    deim_projector,
)


def _orthonormal_basis(n, m, seed=0):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.standard_normal((n, m)))
    return jnp.asarray(q)


class TestIndices:
    @pytest.mark.parametrize("method", ["qdeim", "deim"])
    def test_distinct_and_in_range(self, method):
        u = _orthonormal_basis(200, 12, seed=1)
        idx = np.asarray(deim_indices(u, method))
        assert len(np.unique(idx)) == 12
        assert idx.min() >= 0 and idx.max() < 200

    @pytest.mark.parametrize("method", ["qdeim", "deim"])
    def test_exact_in_span(self, method):
        """Interpolation projector reproduces any f in span(U) exactly."""
        u = _orthonormal_basis(150, 8, seed=2)
        idx = deim_indices(u, method)
        proj = deim_projector(u, idx)
        f = u @ jnp.asarray(np.random.default_rng(3).standard_normal(8))
        f_hat = proj @ f[idx]
        np.testing.assert_allclose(np.asarray(f_hat), np.asarray(f),
                                   atol=1e-10)

    @pytest.mark.parametrize("method", ["qdeim", "deim"])
    def test_condition_bounded(self, method):
        u = _orthonormal_basis(300, 10, seed=4)
        idx = deim_indices(u, method)
        cond = float(deim_condition(u, idx))
        # selection exists precisely to keep this factor small; random
        # orthonormal bases give O(1..tens)
        assert np.isfinite(cond) and cond < 100.0

    def test_single_vector_basis(self):
        u = _orthonormal_basis(50, 1, seed=5)
        for method in ("qdeim", "deim"):
            idx = np.asarray(deim_indices(u, method))
            assert idx.shape == (1,)
            # both pick a max-magnitude row of the single vector
            assert abs(np.asarray(u)[idx[0], 0]) >= (
                np.abs(np.asarray(u)[:, 0]).max() - 1e-12)

    def test_unknown_method_raises(self):
        u = _orthonormal_basis(20, 3)
        with pytest.raises(ValueError):
            deim_indices(u, "nope")


class TestFit:
    def test_fit_reconstructs_heldout(self):
        """Snapshots of a smooth nonlinear field: DEIM built from rank-m
        rSVD of the snapshots approximates a held-out snapshot."""
        x = np.linspace(0, 1, 400)
        mus = np.linspace(0.5, 2.0, 25)
        snaps = np.stack([np.exp(np.sin(np.pi * m * x)) - 1 for m in mus],
                         axis=1)
        d = deim_fit(jnp.asarray(snaps), m=10)
        f_new = jnp.asarray(np.exp(np.sin(np.pi * 1.23 * x)) - 1)
        err = np.linalg.norm(np.asarray(deim_interpolate(d, f_new) - f_new))
        assert err < 1e-4 * np.linalg.norm(np.asarray(f_new))

    def test_interpolate_batch(self):
        u = _orthonormal_basis(80, 6, seed=7)
        idx = deim_indices(u)
        d = Deim(u, idx, deim_projector(u, idx))
        fb = u @ jnp.asarray(
            np.random.default_rng(8).standard_normal((6, 5)))
        np.testing.assert_allclose(np.asarray(deim_interpolate(d, fb)),
                                   np.asarray(fb), atol=1e-10)


CFG = AdvDiffConfig(N=99, deltat=2e-3, T=0.2, theta=1.0,
                    beta=1.0, u0_choice=0, amplitude=1.0, sample_every=2)


class TestReactionFOM:
    def test_zero_reaction_matches_linear(self):
        lin = advdiff.solve_fom(CFG, 0.1)
        non = advdiff.solve_fom_reaction(CFG, 0.1, 0.0, kind="cubic")
        np.testing.assert_allclose(np.asarray(non.solution),
                                   np.asarray(lin.solution), atol=1e-12)

    @pytest.mark.parametrize("kind", ["cubic", "expm1"])
    def test_reaction_damps_solution(self, kind):
        """A positive reaction g(u) with g(u) u >= 0 removes energy:
        final norm below the linear run's."""
        lin = advdiff.solve_fom_reaction(CFG, 0.05, 0.0, kind=kind)
        non = advdiff.solve_fom_reaction(CFG, 0.05, 5.0, kind=kind)
        n_lin = np.linalg.norm(np.asarray(lin.solution))
        n_non = np.linalg.norm(np.asarray(non.solution))
        assert n_non < n_lin
        assert np.all(np.isfinite(np.asarray(non.solution)))

    def test_snapshot_shape(self):
        res = advdiff.solve_fom_reaction(CFG, 0.1, 1.0)
        assert res.snapshots.shape == (101, CFG.n_steps // 2)


class TestPodDeimRom:
    def _setup(self, c_react=4.0, kind="cubic"):
        mus = np.linspace(0.05, 0.25, 4)
        snaps = []
        for m in mus:
            snaps.append(np.asarray(
                advdiff.solve_fom_reaction(CFG, m, c_react,
                                           kind=kind).snapshots))
        s = jnp.asarray(np.concatenate(snaps, axis=1))
        # POD modes of the state; DEIM basis from the (free) nodewise
        # g-snapshots
        u, _, _ = np.linalg.svd(np.asarray(s), full_matrices=False)
        modes = jnp.asarray(u[:, :8])
        g_snaps = advdiff.reaction(s, kind, c_react)
        d = deim_fit(g_snaps, m=10)
        return modes, d

    def test_deim_matches_full_nonlinear_rom(self):
        modes, d = self._setup()
        mu = 0.12
        u_fom = advdiff.solve_fom_reaction(CFG, mu, 4.0).solution
        u_full = rom.solve_rom_reaction_full(CFG, mu, modes, 4.0)
        u_deim = rom.solve_rom_deim(CFG, mu, modes, d, 4.0)
        e_full = rom.relative_l2_error(u_fom, u_full)
        e_deim = rom.relative_l2_error(u_fom, u_deim)
        assert e_full < 5e-3                      # ROM captures the FOM
        assert e_deim < max(2.0 * e_full, 1e-2)   # DEIM adds little error
        # and the two ROM trajectories agree closely with each other
        assert rom.relative_l2_error(u_full, u_deim) < 5e-3

    def test_deim_rom_expm1(self):
        modes, d = self._setup(c_react=2.0, kind="expm1")
        mu = 0.1
        u_fom = advdiff.solve_fom_reaction(CFG, mu, 2.0,
                                           kind="expm1").solution
        u_deim = rom.solve_rom_deim(CFG, mu, modes, d, 2.0, kind="expm1")
        assert rom.relative_l2_error(u_fom, u_deim) < 1e-2
