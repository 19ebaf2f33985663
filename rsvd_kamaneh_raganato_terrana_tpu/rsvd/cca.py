"""Randomized canonical correlation analysis (CCA).

Beyond-parity extension rounding out the statistics family (PCA /
kernel PCA / estimators): the top-k canonical correlations and
directions between two views X (n x p) and Y (n x q),

    max corr(X a, Y b)  s.t. successive pairs uncorrelated,

via the SVD of the whitened cross-covariance
C_xx^{-1/2} C_xy C_yy^{-1/2} (Hotelling).  TPU shape: the two Gram
matrices and the cross-covariance are three GEMMs; whitening uses
Cholesky factors with triangular solves (regularized — CCA is
notoriously ill-posed when p approaches n); the k-truncated SVD of the
whitened p x q matrix runs through the rSVD driver when min(p, q) is
large, and exactly otherwise.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


class CcaResult(NamedTuple):
    correlations: jax.Array   # k canonical correlations, descending in [0, 1]
    x_weights: jax.Array      # p x k (apply to centered X)
    y_weights: jax.Array      # q x k
    x_mean: jax.Array         # p
    y_mean: jax.Array         # q


@partial(jax.jit, static_argnames=("k", "use_rsvd"))
def _cca_impl(x, y, k: int, reg: float, seed: int, use_rsvd: bool):
    n = x.shape[0]
    xm = jnp.mean(x, axis=0)
    ym = jnp.mean(y, axis=0)
    xc = x - xm
    yc = y - ym
    denom = jnp.asarray(n - 1, x.dtype)
    cxx = jnp.matmul(xc.T, xc, precision=DOT_PRECISION) / denom
    cyy = jnp.matmul(yc.T, yc, precision=DOT_PRECISION) / denom
    cxy = jnp.matmul(xc.T, yc, precision=DOT_PRECISION) / denom
    # ridge-regularized whitening (scaled to each view's mean variance)
    rx = reg * jnp.trace(cxx) / cxx.shape[0]
    ry = reg * jnp.trace(cyy) / cyy.shape[0]
    lx = jnp.linalg.cholesky(cxx + rx * jnp.eye(cxx.shape[0], dtype=x.dtype))
    ly = jnp.linalg.cholesky(cyy + ry * jnp.eye(cyy.shape[0], dtype=y.dtype))
    # M = Lx^{-1} Cxy Ly^{-T}
    m = jax.lax.linalg.triangular_solve(lx, cxy, left_side=True, lower=True)
    m = jax.lax.linalg.triangular_solve(ly, m.T, left_side=True,
                                        lower=True).T
    if use_rsvd:
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            generate_omega,
            rsvd_with_omega,
        )

        omega = generate_omega(seed, m.shape[1],
                               min(k + 10, min(m.shape)), m.dtype)
        u, s, v = rsvd_with_omega(m, omega, q=2, k=k, method="eigh")
    else:
        u, s, vt = jnp.linalg.svd(m, full_matrices=False)
        u, s, v = u[:, :k], s[:k], vt.T[:, :k]
    # back-transform: a = Lx^{-T} u, b = Ly^{-T} v
    a = jax.lax.linalg.triangular_solve(lx, u, left_side=True, lower=True,
                                        transpose_a=True)
    b = jax.lax.linalg.triangular_solve(ly, v, left_side=True, lower=True,
                                        transpose_a=True)
    return jnp.clip(s, 0.0, 1.0), a, b, xm, ym


def cca(x, y, k: int = 2, reg: float = 1e-6, seed: int = 0) -> CcaResult:
    """Top-k canonical correlations/directions between views X (n x p)
    and Y (n x q).  ``reg`` is the relative ridge on each view's
    covariance (CCA is ill-posed as p, q -> n).  Uses the rSVD driver
    for the whitened cross-covariance when min(p, q) > 256, exact SVD
    otherwise.  Project new data with
    ``(x_new - res.x_mean) @ res.x_weights``."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.shape[0] != y.shape[0]:
        raise ValueError("views must have the same number of rows")
    k = min(k, x.shape[1], y.shape[1])
    use_rsvd = min(x.shape[1], y.shape[1]) > 256
    s, a, b, xm, ym = _cca_impl(x, y, k, reg, seed, use_rsvd)
    return CcaResult(s, a, b, xm, ym)
