"""Dynamic Mode Decomposition (exact DMD) on the randomized engine.

Beyond-parity extension completing the snapshot-analysis family: POD
(apps/pod.py) gives the energy-optimal SPATIAL basis of a snapshot
matrix; DMD (Tu, Rowley et al. 2014) gives the TEMPORAL structure — a
best-fit linear operator Y ~ A X over snapshot pairs, whose eigenpairs
are growth/decay rates + frequencies and spatially coherent modes.  The
same advection-diffusion snapshot matrices the POD pipeline produces
(apps/advdiff.py::snapshot_matrix) feed it directly.

TPU split: all O(n·m) work — the rank-k truncated SVD of X (this
framework's rSVD) and the projections building the k x k operator
A_tilde = U^T Y V S^{-1} — is jitted GEMM work on device; the k x k
NON-symmetric eigendecomposition has no TPU/XLA kernel (complex
Schur is host-only in every backend), so that tail runs on host NumPy —
the same replicated-small-tail structure as the rest of the framework,
k x k instead of l x n.

`dmd_predict` reconstructs/forecasts x(t) = Phi exp(Omega t) b.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm, rsvd


class DmdResult(NamedTuple):
    modes: np.ndarray        # n x k complex — exact DMD modes Phi
    eigs: np.ndarray         # k complex — discrete-time eigenvalues
    omega: np.ndarray        # k complex — continuous-time log(eigs)/dt
    amplitudes: np.ndarray   # k complex — b = Phi^+ x_0
    singular_values: np.ndarray   # k — of the snapshot matrix X
    dt: float


@partial(jax.jit, static_argnames=("k", "p", "q"))
def _dmd_device_part(x, y, k: int, p: int, q: int, seed: int):
    """Everything up to (and around) the small eig: rank-k SVD of X and
    the projected operator A_tilde — one jitted program."""
    u, s, v = rsvd(x, k=k, p=p, q=q, seed=seed, method="eigh")
    yv_sinv = _mm(y, v) / s[None, :]             # n x k
    atilde = _mm(u.T, yv_sinv)                   # k x k
    return s, yv_sinv, atilde


def dmd(
    snapshots,
    k: int,
    dt: float = 1.0,
    p: int = 10,
    q: int = 2,
    seed: int = 0,
) -> DmdResult:
    """Exact DMD of a time-ordered snapshot matrix (n x (m+1) columns
    x_0 ... x_m, uniform spacing dt).  Rank-k via the rSVD driver."""
    snapshots = jnp.asarray(snapshots)
    x, y = snapshots[:, :-1], snapshots[:, 1:]
    s, yv_sinv, atilde = _dmd_device_part(x, y, k, p, q, seed)

    lam, w = np.linalg.eig(np.asarray(atilde, dtype=np.float64))
    # exact DMD modes (Tu et al. Thm 1): Phi = Y V S^{-1} W
    phi = np.asarray(yv_sinv, dtype=np.float64) @ w
    omega = np.log(lam.astype(np.complex128)) / dt
    x0 = np.asarray(snapshots[:, 0], dtype=np.float64)
    b, *_ = np.linalg.lstsq(phi, x0, rcond=None)
    return DmdResult(phi, lam, omega, b,
                     np.asarray(s, dtype=np.float64), float(dt))


def dmd_predict(res: DmdResult, t) -> np.ndarray:
    """x(t) = Re( Phi diag(exp(omega t)) b ) for scalar or vector t —
    reconstruction on the training window, forecast beyond it."""
    t = np.atleast_1d(np.asarray(t, dtype=np.float64))
    dynamics = np.exp(np.outer(res.omega, t)) * res.amplitudes[:, None]
    out = np.real(res.modes @ dynamics)          # n x len(t)
    return out[:, 0] if t.shape == (1,) else out


def dmd_reconstruction_error(res: DmdResult, snapshots) -> float:
    """Relative Frobenius error of the DMD reconstruction over the full
    training window."""
    snaps = np.asarray(snapshots, dtype=np.float64)
    times = np.arange(snaps.shape[1]) * res.dt
    recon = dmd_predict(res, times)
    return float(np.linalg.norm(recon - snaps) / np.linalg.norm(snaps))
