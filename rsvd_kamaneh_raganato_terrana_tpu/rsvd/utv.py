"""Randomized rank-revealing UTV (powerURV).

Beyond-parity extension.  A ~ U T V^T with U, V orthonormal and T
upper-TRIANGULAR: sits between the pivoted QR the reference builds its
engines from (src/QR.cpp) and a full SVD — rank-revealing like the SVD
(|T_ii| tracks sigma_i, error within a power-iteration factor of
optimal) but finishing with a single thin QR instead of an iterative
small-SVD tail, so the whole factorization is GEMMs + CholeskyQR:
MXU-dense end to end, no while_loops, fully differentiable.

Method (Gopal & Martinsson 2018, "powerURV: ... a GPU-friendly UTV"):
    V = range finder of A^T   (this framework's stage A on A^T),
    W = A V,   (U, T) = qr(W)   =>   A V = U T,  A ~ U T V^T.
The approximation error equals the range finder's ||A (I - V V^T)||; the
q power iterations give the same spectral-gap amplification as the rSVD
driver.  Rank-k truncation keeps k COLUMNS of U and k ROWS of T
(T is upper triangular, so U[:, :k] T[:k, :] V^T is still a product of
orthonormal x triangular-slice x orthonormal).

Use it when downstream wants a triangular middle factor (stable solves /
updating / subset selection) or wants to skip the SVD tail; use `rsvd`
when exact singular values/vectors are the product.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    _mm,
    generate_omega,
    subspace_iteration,
)


@partial(jax.jit, static_argnames=("k", "p", "q", "qr_method", "precision"))
def _rutv_impl(a, *, k, p, q, seed, qr_method, precision):
    m, n = a.shape
    l = min(k + p if k > 0 else p, min(m, n))
    prec = _PRECISIONS.get(precision, precision)
    omega = generate_omega(seed, m, l, a.dtype)
    v = subspace_iteration(a.T, omega, q, qr_method, prec)   # n x l
    w = _mm(a, v, prec)                                      # m x l
    u, t = qr_reduced(w, qr_method)                          # A V = U T
    # sign-normalize: positive diagonal of T (QR sign ambiguity), so
    # diag(T) is directly comparable to singular values
    signs = jnp.where(jnp.diag(t) < 0, -1.0, 1.0).astype(a.dtype)
    return u * signs[None, :], t * signs[:, None], v


def rutv(
    a,
    k: int = 0,
    p: int = 10,
    q: int = 2,
    seed: int = 0,
    qr_method: str = "robust",
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Randomized UTV: returns (U: m x l, T: l x l upper triangular with
    positive diagonal, V: n x l), l = k + p (all l = p when k = 0, the
    driver's convention).  A ~ U @ T @ V.T; truncate with
    ``rutv_reconstruct(u, t, v, k)``."""
    a = jnp.asarray(a)
    return _rutv_impl(a, k=k, p=p, q=q, seed=seed, qr_method=qr_method,
                      precision=precision)


def rutv_reconstruct(u, t, v, k: int = 0):
    """A_k = U[:, :k] T[:k, :] V^T (full l-rank product when k = 0)."""
    if k and k > 0:
        u, t = u[:, :k], t[:k, :]
    return _mm(_mm(u, t), v.T)


@jax.jit
def utv_rescore(u, s, v):
    """Exact SVD of a UTV-finish approximant — the OFF-CRITICAL-PATH
    sigma rescore for serving monitoring (VERDICT r4 item 6).

    The ``finish='utv'``/``'rowspace_utv'`` weights s are column norms of
    the triangular middle factor: they track sigma only on gapped spectra
    (measured 0.27% at ratio 0.3 but 26% at 0.5 — rsvd.driver docstring).
    Given the returned (U unit-column, s, V orthonormal), the approximant
    M = U diag(s) V^T has the exact factorization

        G = diag(s) U^T U diag(s)  ->  eigh -> (sigma^2, W),
        U* = U diag(s) W / sigma,   V* = V W,   M = U* diag(sigma) V*^T,

    so one tall Gram + one l x l eigh + two thin GEMMs recover TRUE
    singular values/vectors of the rank-l approximant to arithmetic
    accuracy — identical to what the eigh tail would have returned.  This
    function shares NO code path with the serving finishes (they remain
    eigh-free); run it on the monitoring side, never in the serving loop.
    Returns (U*, sigma descending, V*); directions whose sigma sits at
    the roundoff floor are zeroed rather than normalized noise."""
    f = u * s[None, :]
    g = _mm(f.T, f)
    lam, w = jnp.linalg.eigh(g)                     # ascending
    lam = jnp.maximum(lam[::-1], 0.0)
    w = w[:, ::-1]
    sigma = jnp.sqrt(lam)
    safe = jnp.maximum(sigma, jnp.finfo(u.dtype).tiny)
    u_true = _mm(f, w / safe[None, :])
    live = lam > jnp.maximum(
        jnp.finfo(u.dtype).eps * lam[0], jnp.finfo(u.dtype).tiny)
    u_true = jnp.where(live[None, :], u_true, 0.0)
    return u_true, sigma, _mm(v, w)
