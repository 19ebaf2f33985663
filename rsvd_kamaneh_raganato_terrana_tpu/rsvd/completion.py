"""Low-rank matrix completion via Singular Value Projection (SVP).

Beyond-parity extension: the recommender/recovery workload on top of the
rSVD engine.  Given entries of A on an observed set Omega, recover a
rank-k matrix X minimizing ||P_Omega(X - A)||_F by projected gradient:

    X_{t+1} = P_k( X_t + eta * P_Omega(A - X_t) ),

(Jain, Meka & Dhillon 2010) where P_k is the rank-k projection — here
this framework's randomized range finder + tail instead of a dense SVD,
so each iteration is a handful of (m x n) x (n x l) GEMMs: MXU-dense,
static shapes, and the WHOLE iteration loop compiles to one XLA program
(`lax.fori_loop`; a fresh sketch per iteration via fold_in keeps P_k
unbiased without recompilation).

The step size eta = 1/p (p = observed fraction) makes the masked
gradient an unbiased estimate of the full one — the standard SVP
schedule.  Memory: the dense m x n iterate (the completed matrix IS the
product; for huge sparse problems use apps/retrieval.py's factor-form
embeddings instead).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import sketch_matrix
from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm


class CompletionResult(NamedTuple):
    u: jax.Array          # m x k
    s: jax.Array          # k
    v: jax.Array          # n x k
    obs_rmse: jax.Array   # RMSE on observed entries per iteration (iters,)


def _rank_k_project(x, key, k: int, p: int, q: int):
    """P_k(x) via the randomized range finder (fresh sketch per call)."""
    l = min(k + p, min(x.shape))
    omega = sketch_matrix(key, x.shape[1], l, x.dtype)
    y = _mm(x, omega)
    q_mat = orthonormal_basis(y, "robust")
    for _ in range(q):
        q_mat = orthonormal_basis(_mm(x, _mm(x.T, q_mat)), "robust")
    b = _mm(q_mat.T, x)
    u_t, s, v = small_svd(b, "eigh")
    return _mm(q_mat, u_t[:, :k]), s[:k], v[:, :k]


@partial(jax.jit, static_argnames=("k", "p", "q", "iters"))
def complete_lowrank(
    a_obs,
    mask,
    k: int,
    iters: int = 30,
    eta: float | None = None,
    p: int = 10,
    q: int = 1,
    seed: int = 0,
) -> CompletionResult:
    """Rank-k completion of a partially observed matrix.

    a_obs: m x n with arbitrary values outside the mask (they are never
    read); mask: bool m x n, True = observed.  Returns factor form
    (U, s, V) of the completed matrix plus the observed-RMSE trace.
    eta defaults to 1/observed_fraction (SVP schedule).
    """
    a_obs = jnp.asarray(a_obs)
    mask = jnp.asarray(mask, bool)
    m, n = a_obs.shape
    n_obs = jnp.maximum(jnp.sum(mask), 1)
    frac = n_obs.astype(a_obs.dtype) / (m * n)
    eta_v = (1.0 / frac) if eta is None else jnp.asarray(eta, a_obs.dtype)
    a_masked = jnp.where(mask, a_obs, 0.0)
    key = jax.random.PRNGKey(seed)

    def step(i, carry):
        x, rmse = carry
        resid = jnp.where(mask, a_masked - x, 0.0)
        rmse = rmse.at[i].set(
            jnp.sqrt(jnp.sum(resid * resid) / n_obs.astype(a_obs.dtype)))
        u, s, v = _rank_k_project(x + eta_v * resid,
                                  jax.random.fold_in(key, i), k, p, q)
        return _mm(u * s[None, :], v.T), rmse

    x0 = jnp.zeros_like(a_obs)
    rmse0 = jnp.zeros((iters,), a_obs.dtype)
    x, rmse = jax.lax.fori_loop(0, iters, step, (x0, rmse0))
    u, s, v = _rank_k_project(x, jax.random.fold_in(key, iters), k, p, q)
    return CompletionResult(u, s, v, rmse)
