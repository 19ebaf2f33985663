"""Proper Orthogonal Decomposition.

TPU counterpart of the reference POD class
(POD/ParametricDiffusion1D/src/POD.cpp:1-800): four algorithms selected by
constructor overloads there, factory functions here, all returning modes W
and singular values sigma:

- ``naive_pod``    — SVD directly on the snapshot matrix (POD.cpp:116-133).
- ``standard_pod`` — Quarteroni Alg. 6.1: eigenproblem on C = S^T S when
  ns <= Nh else K = S S^T, modes W_i = S V_i / sigma_i, energy-criterion
  truncation (POD.cpp:153-220).
- ``energy_pod``   — Alg. 6.2: energy inner product X_h; C~ = S^T X_h S via
  X_h^(1/2) (POD.cpp:272-304).
- ``weight_pod``   — Alg. 6.3: adds quadrature weights D; S~ = S D^(1/2)
  (POD.cpp:356-434).

``perform_svd`` keeps the reference's svd_type 0-5 dispatch
(POD.cpp:42-114): 0/1/2 full SVD {Power, Jacobi, ParallelJacobi},
3/4/5 rSVD with the same tail engines.

TPU notes: symmetric square roots use `eigh` (MXU-dense) instead of
Eigen operatorSqrt; the X_h^(1/2)-solve uses the eigendecomposition
directly rather than per-column CG (reference POD.cpp:296-304) — exact,
batched, and one less iterative loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as full_svd
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

_SVD_TYPE_METHOD = {
    0: SVDMethod.Power,
    1: SVDMethod.Jacobi,
    2: SVDMethod.ParallelJacobi,
    3: SVDMethod.Power,
    4: SVDMethod.Jacobi,
    5: SVDMethod.ParallelJacobi,
}


def perform_svd(a, svd_type: int, rank: int = 0):
    """Reference perform_SVD dispatch (POD.cpp:42-114)."""
    method = _SVD_TYPE_METHOD[int(svd_type)]
    if svd_type >= 3:
        return rsvd(a, k=rank, method=method)
    return full_svd(a, method, rank)


def _energy_truncate(sigma, tol: float, max_rank: int) -> int:
    """Smallest N with relative retained energy >= 1 - tol^2, capped at
    max_rank (reference POD.cpp:206-220)."""
    s2 = np.asarray(sigma, dtype=np.float64) ** 2
    total = s2.sum()
    if total == 0:
        return 1
    cum = np.cumsum(s2) / total
    n = int(np.searchsorted(cum, 1.0 - tol * tol) + 1)
    return max(1, min(n, max_rank, len(s2)))


@dataclass
class POD:
    """POD result: modes W (Nh x N), singular values, retained rank."""

    modes: jax.Array
    sigma: jax.Array
    rank: int
    algorithm: str

    @property
    def W(self):  # reference accessor name
        return self.modes[:, : self.rank]

    def project(self, x):
        """Reduced coordinates W^T x."""
        return jnp.matmul(self.W.T, x, precision=DOT_PRECISION)

    def expand(self, xr):
        """Back to FOM space W xr."""
        return jnp.matmul(self.W, xr, precision=DOT_PRECISION)


def naive_pod(s, rank: int, svd_type: int = 1, tol: float = 0.0) -> POD:
    """SVD of S directly (reference naive_POD, POD.cpp:116-133)."""
    s = jnp.asarray(s)
    u, sig, _ = perform_svd(s, svd_type, rank if svd_type >= 3 else 0)
    r = min(rank, u.shape[1])
    if tol > 0:
        r = min(r, _energy_truncate(sig, tol, rank))
    return POD(u[:, :rank], sig[:rank], r, "naive")


def standard_pod(s, rank: int, tol: float = 1e-12, svd_type: int = 1) -> POD:
    """Quarteroni Alg. 6.1 (reference standard_POD, POD.cpp:153-220)."""
    s = jnp.asarray(s)
    nh, ns = s.shape
    if ns <= nh:
        c = jnp.matmul(s.T, s, precision=DOT_PRECISION)      # ns x ns
        v, lam, _ = perform_svd(c, svd_type, rank if svd_type >= 3 else 0)
        sig = jnp.sqrt(jnp.maximum(lam, 0.0))
        safe = jnp.maximum(sig, jnp.finfo(s.dtype).tiny)
        w = jnp.matmul(s, v, precision=DOT_PRECISION) / safe[None, :]
        w = jnp.where(sig[None, :] > 0, w, 0.0)
    else:
        k = jnp.matmul(s, s.T, precision=DOT_PRECISION)      # nh x nh
        w, lam, _ = perform_svd(k, svd_type, rank if svd_type >= 3 else 0)
        sig = jnp.sqrt(jnp.maximum(lam, 0.0))
    r = _energy_truncate(sig, tol, rank)
    keep = min(rank, w.shape[1])
    return POD(w[:, :keep], sig[:keep], r, "standard")


def _spd_sqrt(xh):
    """X_h^(1/2) and X_h^(-1/2) via eigh (reference used Eigen
    SelfAdjointEigenSolver::operatorSqrt, POD.cpp:272-279)."""
    lam, q = jnp.linalg.eigh(xh)
    lam = jnp.maximum(lam, 0.0)
    root = jnp.sqrt(lam)
    inv_root = jnp.where(root > 0, 1.0 / jnp.maximum(root, jnp.finfo(xh.dtype).tiny), 0.0)
    xh_half = (q * root[None, :]) @ q.T
    xh_inv_half = (q * inv_root[None, :]) @ q.T
    return xh_half, xh_inv_half


def energy_pod(s, xh, rank: int, tol: float = 1e-12, svd_type: int = 1) -> POD:
    """Quarteroni Alg. 6.2 with energy matrix X_h (reference energy_POD,
    POD.cpp:240-330)."""
    s = jnp.asarray(s)
    xh = jnp.asarray(xh, dtype=s.dtype)
    nh, ns = s.shape
    xh_half, xh_inv_half = _spd_sqrt(xh)
    if ns <= nh:
        # C~ = S^T X_h S  (ns x ns)
        c = jnp.matmul(s.T, jnp.matmul(xh, s, precision=DOT_PRECISION),
                       precision=DOT_PRECISION)
        v, lam, _ = perform_svd(c, svd_type, rank if svd_type >= 3 else 0)
        sig = jnp.sqrt(jnp.maximum(lam, 0.0))
        safe = jnp.maximum(sig, jnp.finfo(s.dtype).tiny)
        w = jnp.matmul(s, v, precision=DOT_PRECISION) / safe[None, :]
        w = jnp.where(sig[None, :] > 0, w, 0.0)
    else:
        # K~ = X_h^(1/2) S S^T X_h^(1/2)  (nh x nh)
        shat = jnp.matmul(xh_half, s, precision=DOT_PRECISION)
        k = jnp.matmul(shat, shat.T, precision=DOT_PRECISION)
        u, lam, _ = perform_svd(k, svd_type, rank if svd_type >= 3 else 0)
        sig = jnp.sqrt(jnp.maximum(lam, 0.0))
        # back-solve X_h^(1/2) W = U (reference CG loop, POD.cpp:296-304)
        w = jnp.matmul(xh_inv_half, u, precision=DOT_PRECISION)
    r = _energy_truncate(sig, tol, rank)
    keep = min(rank, w.shape[1])
    return POD(w[:, :keep], sig[:keep], r, "energy")


def weight_pod(s, xh, d, rank: int, tol: float = 1e-12,
               svd_type: int = 1) -> POD:
    """Quarteroni Alg. 6.3: quadrature-weighted snapshots S~ = S D^(1/2)
    (reference weight_POD, POD.cpp:335-434)."""
    s = jnp.asarray(s)
    d = jnp.asarray(d, dtype=s.dtype)
    d_half = jnp.sqrt(jnp.maximum(jnp.diagonal(d) if d.ndim == 2 else d, 0.0))
    s_tilde = s * d_half[None, :]
    pod = energy_pod(s_tilde, xh, rank, tol, svd_type)
    return POD(pod.modes, pod.sigma, pod.rank, "weight")


def incremental_pod(snapshot_batches, rank: int, tol: float = 0.0) -> POD:
    """Streaming POD: feed snapshot batches as they are produced (e.g.
    one FOM parameter at a time) and keep a rank-capped factorization
    via Brand column appends — the working version of the reference's
    commented-out incremental-SVD intent (POD.cpp:464-799).  Memory is
    O(Nh * rank) regardless of the total snapshot count."""
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.incremental import (
        IncrementalSVD,
    )

    inc = IncrementalSVD(rank=rank)
    for batch in snapshot_batches:
        inc.update(jnp.asarray(batch))
    u, sig, _ = inc.factors()
    r = _energy_truncate(sig, tol, rank) if tol > 0 else min(rank, sig.shape[0])
    return POD(u[:, :rank], sig[:rank], r, "incremental")


def make_pod(pod_type: int, s, rank: int, tol: float, svd_type: int,
             xh=None, d=None) -> POD:
    """pod_type dispatch as in the reference driver (Diff1D.cpp:170-218):
    0 naive, 1 standard, 2 energy, 3 weight.  For 2/3 the driver builds the
    tridiagonal X_h = [-1, 2, -1] and D = 0.1 I inline; we default to the
    same when not supplied."""
    s = jnp.asarray(s)
    nh, ns = s.shape
    if pod_type in (2, 3) and xh is None:
        xh = (jnp.diag(jnp.full(nh, 2.0, s.dtype))
              + jnp.diag(jnp.full(nh - 1, -1.0, s.dtype), 1)
              + jnp.diag(jnp.full(nh - 1, -1.0, s.dtype), -1))
    if pod_type == 3 and d is None:
        d = jnp.full(ns, 0.1, s.dtype)
    if pod_type == 0:
        return naive_pod(s, rank, svd_type, tol)
    if pod_type == 1:
        return standard_pod(s, rank, tol, svd_type)
    if pod_type == 2:
        return energy_pod(s, xh, rank, tol, svd_type)
    if pod_type == 3:
        return weight_pod(s, xh, d, rank, tol, svd_type)
    raise ValueError(f"unknown pod_type {pod_type}")
