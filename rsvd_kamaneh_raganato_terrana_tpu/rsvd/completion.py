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
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import sketch_matrix
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm, rsvd_with_omega


class CompletionResult(NamedTuple):
    u: jax.Array          # m x k
    s: jax.Array          # k
    v: jax.Array          # n x k
    obs_rmse: jax.Array   # RMSE on observed entries per iteration (iters,)


def _rank_k_project(x, key, k: int, p: int, q: int, precision):
    """P_k(x) — the driver's range finder + tail with a fresh sketch
    ('half' reorth: interior bases only need conditioning here)."""
    l = min(k + p, min(x.shape))
    omega = sketch_matrix(key, x.shape[1], l, x.dtype)
    return rsvd_with_omega(x, omega, q=q, k=k, method="eigh",
                           precision=precision, reorth="half")


@partial(jax.jit, static_argnames=("k", "p", "q", "iters", "precision"))
def complete_lowrank(
    a_obs,
    mask,
    k: int,
    iters: int = 30,
    eta: float | None = None,
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    precision: str = "highest",
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
    n_obs = jnp.maximum(jnp.sum(mask), 1).astype(a_obs.dtype)
    frac = n_obs / (m * n)
    eta0 = (1.0 / frac) if eta is None else jnp.asarray(eta, a_obs.dtype)
    a_masked = jnp.where(mask, a_obs, 0.0)
    key = jax.random.PRNGKey(seed)

    def obs_rmse_at(x):
        resid = jnp.where(mask, a_masked - x, 0.0)
        return jnp.sqrt(jnp.sum(resid * resid) / n_obs), resid

    # Backtracking safeguard: the textbook eta = 1/p step diverges when
    # the sampled entries barely cover the rank-k degrees of freedom
    # (found by the property test at 40% sampling of a 48x40 rank-3
    # problem).  Each step is accepted only if it does not increase the
    # observed RMSE; a rejected step halves eta and keeps the iterate.
    # The iterate's reconstruction X rides the carry, so each iteration
    # pays exactly ONE factor-form reconstruction GEMM (the candidate's).
    def step(i, carry):
        u, s, v, x, eta_i, rmse = carry
        r_cur, resid = obs_rmse_at(x)
        rmse = rmse.at[i].set(r_cur)
        cu, cs, cv = _rank_k_project(x + eta_i * resid,
                                     jax.random.fold_in(key, i), k, p, q,
                                     precision)
        cx = _mm(cu * cs[None, :], cv.T)
        r_new, _ = obs_rmse_at(cx)
        ok = r_new <= r_cur
        u = jnp.where(ok, cu, u)
        s = jnp.where(ok, cs, s)
        v = jnp.where(ok, cv, v)
        x = jnp.where(ok, cx, x)
        # halve on rejection, creep back toward the nominal step on
        # acceptance (plain halving left hard instances crawling)
        eta_i = jnp.where(ok, jnp.minimum(1.2 * eta_i, eta0), 0.5 * eta_i)
        return u, s, v, x, eta_i, rmse

    kk = min(k, m, n)
    carry0 = (jnp.zeros((m, kk), a_obs.dtype), jnp.zeros((kk,), a_obs.dtype),
              jnp.zeros((n, kk), a_obs.dtype), jnp.zeros_like(a_obs),
              eta0 * jnp.ones((), a_obs.dtype),
              jnp.zeros((iters,), a_obs.dtype))
    u, s, v, _, _, rmse = jax.lax.fori_loop(0, iters, step, carry0)
    return CompletionResult(u, s, v, rmse)


class TuckerCompletionResult(NamedTuple):
    core: jax.Array
    factors: Tuple[jax.Array, ...]
    obs_rmse: jax.Array


@partial(jax.jit, static_argnames=("ranks", "iters", "p", "q", "precision"))
def complete_tucker(
    a_obs,
    mask,
    ranks: Tuple[int, ...],
    iters: int = 30,
    eta: float | None = None,
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    precision: str = "highest",
) -> TuckerCompletionResult:
    """Low-multilinear-rank TENSOR completion: the same SVP projected
    gradient with the randomized Tucker (ST-HOSVD) as the projection
    P_ranks — one fori_loop program, fresh per-iteration sketches.
    Returns (core, factors, observed-RMSE trace)."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.tucker import (
        tucker,
        tucker_reconstruct,
    )

    a_obs = jnp.asarray(a_obs)
    mask = jnp.asarray(mask, bool)
    ranks = tuple(ranks)
    n_obs = jnp.maximum(jnp.sum(mask), 1).astype(a_obs.dtype)
    frac = n_obs / a_obs.size
    eta_v = (1.0 / frac) if eta is None else jnp.asarray(eta, a_obs.dtype)
    a_masked = jnp.where(mask, a_obs, 0.0)

    # iteration 0 outside the loop fixes the (shape-static) factor pytree
    core, factors = tucker(eta_v * a_masked, ranks, p=p, q=q, seed=seed,
                           precision=precision)
    rmse0 = jnp.zeros((iters,), a_obs.dtype)
    rmse0 = rmse0.at[0].set(jnp.sqrt(jnp.sum(a_masked * a_masked) / n_obs))

    def obs_rmse_at(x):
        resid = jnp.where(mask, a_masked - x, 0.0)
        return jnp.sqrt(jnp.sum(resid * resid) / n_obs), resid

    # same backtracking safeguard as complete_lowrank (the fixed
    # eta = 1/p schedule diverges near the DoF-coverage threshold)
    def step(i, carry):
        core, factors, x, eta_i, rmse = carry
        r_cur, resid = obs_rmse_at(x)
        rmse = rmse.at[i].set(r_cur)
        c_core, c_factors = tucker(x + eta_i * resid, ranks, p=p, q=q,
                                   seed=seed + 1 + i, precision=precision)
        cx = tucker_reconstruct(c_core, c_factors)
        r_new, _ = obs_rmse_at(cx)
        ok = r_new <= r_cur
        core = jnp.where(ok, c_core, core)
        factors = tuple(jnp.where(ok, cf, f)
                        for cf, f in zip(c_factors, factors))
        x = jnp.where(ok, cx, x)
        eta_i = jnp.where(ok, jnp.minimum(1.2 * eta_i, eta_v), 0.5 * eta_i)
        return core, factors, x, eta_i, rmse

    x0 = tucker_reconstruct(core, factors)
    core, factors, _, _, rmse = jax.lax.fori_loop(
        1, iters, step,
        (core, factors, x0, eta_v * jnp.ones((), a_obs.dtype), rmse0))
    return TuckerCompletionResult(core, factors, rmse)
