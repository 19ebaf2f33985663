"""Dynamic Mode Decomposition (rsvd/dmd.py)."""

import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.dmd import (
    dmd,
    dmd_predict,
    dmd_reconstruction_error,
)


def _two_mode_signal(n=200, m=60, dt=0.1, seed=0, noise=0.0):
    """x(t) = Re(phi1 e^{w1 t} + phi2 e^{w2 t}): two spatial modes with
    known continuous-time eigenvalues (decaying oscillations)."""
    rng = np.random.default_rng(seed)
    xs = np.linspace(0, 1, n)
    phi1 = np.sin(2 * np.pi * xs) + 1j * 0.3 * np.cos(2 * np.pi * xs)
    phi2 = np.sin(5 * np.pi * xs) - 1j * 0.2 * np.sin(np.pi * xs)
    w1, w2 = -0.2 + 2.0j, -0.5 + 5.0j
    t = np.arange(m + 1) * dt
    snaps = np.real(np.outer(phi1, np.exp(w1 * t))
                    + np.outer(phi2, np.exp(w2 * t)))
    if noise:
        snaps = snaps + noise * rng.standard_normal(snaps.shape)
    return snaps, (w1, w2), dt


class TestDmd:
    def test_recovers_continuous_eigenvalues(self):
        snaps, (w1, w2), dt = _two_mode_signal()
        res = dmd(snaps, k=4, dt=dt)
        # each true eigenvalue (and conjugate) appears among omega
        for w in (w1, np.conj(w1), w2, np.conj(w2)):
            assert np.min(np.abs(res.omega - w)) < 1e-6

    def test_reconstruction_and_forecast(self):
        snaps, _, dt = _two_mode_signal()
        res = dmd(snaps, k=4, dt=dt)
        assert dmd_reconstruction_error(res, snaps) < 1e-8
        # forecast 20 steps past the training window
        t_future = (snaps.shape[1] + 19) * dt
        pred = dmd_predict(res, t_future)
        truth = _two_mode_signal(m=snaps.shape[1] + 19)[0][:, -1]
        assert (np.linalg.norm(pred - truth)
                < 1e-6 * max(np.linalg.norm(truth), 1.0))

    def test_noise_robust_rank_truncation(self):
        snaps, (w1, w2), dt = _two_mode_signal(noise=1e-6, seed=1)
        res = dmd(snaps, k=4, dt=dt)
        for w in (w1, w2):
            assert np.min(np.abs(res.omega - w)) < 1e-3

    def test_predict_shapes(self):
        snaps, _, dt = _two_mode_signal(n=50, m=20)
        res = dmd(snaps, k=4, dt=dt)
        assert dmd_predict(res, 0.5).shape == (50,)
        assert dmd_predict(res, [0.0, 0.5, 1.0]).shape == (50, 3)

    def test_advdiff_snapshots_decay_modes(self):
        """DMD of the POD pipeline's own FOM snapshots: u0_choice 0 decays
        like e^{-t} (exact solution family), so the dominant DMD
        eigenvalue must sit near omega = -1."""
        from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff
        from rsvd_kamaneh_raganato_terrana_tpu.core.config import (
            AdvDiffConfig,
        )

        cfg = AdvDiffConfig(N=99, T=0.4, deltat=2e-3, theta=0.5, beta=0.2,
                            u0_choice=0, amplitude=1.0, sample_every=1)
        res_fom = advdiff.solve_fom(cfg, 0.1, include_initial=True)
        snaps = np.asarray(res_fom.snapshots)
        res = dmd(snaps, k=3, dt=cfg.deltat)
        i = int(np.argmax(np.abs(res.amplitudes)))
        assert abs(res.omega[i].real - (-1.0)) < 5e-2
        assert abs(res.omega[i].imag) < 1e-6
        assert dmd_reconstruction_error(res, snaps) < 1e-4
