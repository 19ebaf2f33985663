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

Two refinements over textbook SVP make the solver robust at the
sampling threshold (both found by the recovery property test,
tests/test_properties.py):

1. **Adaptive NIHT step** (Tanner & Wei 2013): the exact minimizer of
   the observed residual along the gradient restricted to the current
   column space, eta = ||U U^T R||^2 / ||P_Omega(U U^T R)||^2 —
   scale-free, several times faster than the textbook eta = 1/p
   schedule.  Passing `eta` switches to a fixed step.  Either way a
   backtracking safeguard accepts a step only if the observed RMSE
   does not increase.
2. **Two-sided ALS debias** after each rank-k projection: with the
   projected column basis U fixed, refit the n x k coefficient matrix
   on the OBSERVED entries only (n independent k x k normal-equation
   solves, batched on the MXU), orthonormalize, then refit the m x k
   row-side the same way.  One alternating-minimization round per
   iteration turns SVP's linear rate into AltMin's (Jain-Netrapalli-
   Sanghavi 2013 style) and removes the bias the plain projection
   inherits from the zero-filled unobserved entries.  Measured on the
   property-test family (48x40 rank-3, entry scales 1e-2..1e2,
   50 iters): worst-of-840-trials rel err 1.1e-7 at 50 % sampling
   (3.9e-8 at 70-90 %), vs 3.1e-3 worst for NIHT alone and 2.6e-2 for
   fixed eta = 1/p.

Memory: the dense m x n iterate (the completed matrix IS the product;
for huge sparse problems use apps/retrieval.py's factor-form
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
    eta=None (default) uses the adaptive NIHT step; a float fixes it.
    """
    a_obs = jnp.asarray(a_obs)
    mask = jnp.asarray(mask, bool)
    m, n = a_obs.shape
    n_obs = jnp.maximum(jnp.sum(mask), 1).astype(a_obs.dtype)
    frac = n_obs / (m * n)
    adaptive = eta is None
    eta0 = (2.0 / frac) if adaptive else jnp.asarray(eta, a_obs.dtype)
    a_masked = jnp.where(mask, a_obs, 0.0)
    key = jax.random.PRNGKey(seed)
    maskf = mask.astype(a_obs.dtype)
    # Tikhonov floor for the per-row/column normal equations: guards a
    # row/column whose observed entries under-determine its k weights
    # (relative to the Gram's own diagonal scale, so it is scale-free).
    lam = 1e-8
    eye_k = jnp.eye(min(k, m, n), dtype=a_obs.dtype)

    def obs_rmse_at(x):
        resid = jnp.where(mask, a_masked - x, 0.0)
        return jnp.sqrt(jnp.sum(resid * resid) / n_obs), resid

    def fit_cols(u):
        """Given a column basis u (m x k), the n x k coefficient matrix
        minimizing the OBSERVED residual of u @ W^T: n independent
        k x k normal-equation solves, formed as one batched einsum
        (m*n*k^2 MXU flops) + one vmapped solve."""
        gram = jnp.einsum("ik,ij,il->jkl", u, maskf, u,
                          precision=jax.lax.Precision.HIGHEST)
        rhs = _mm(a_masked.T, u)  # n x k
        scale = jnp.maximum(jnp.einsum("jkk->j", gram), 1.0)
        gram = gram + (lam * scale)[:, None, None] * eye_k
        return jax.vmap(jnp.linalg.solve)(gram, rhs[..., None])[..., 0]

    def fit_rows(v):
        """Mirror of fit_cols: given a row basis v (n x k), the m x k
        coefficients minimizing the observed residual of Z @ v^T."""
        gram = jnp.einsum("jk,ij,jl->ikl", v, maskf, v,
                          precision=jax.lax.Precision.HIGHEST)
        rhs = _mm(a_masked, v)  # m x k
        scale = jnp.maximum(jnp.einsum("ikk->i", gram), 1.0)
        gram = gram + (lam * scale)[:, None, None] * eye_k
        return jax.vmap(jnp.linalg.solve)(gram, rhs[..., None])[..., 0]

    # Backtracking safeguard: an over-long step diverges when the
    # sampled entries barely cover the rank-k degrees of freedom (found
    # by the property test at 40% sampling of a 48x40 rank-3 problem).
    # Each step is accepted only if it does not increase the observed
    # RMSE; a rejected step halves the multiplicative `boost` on the
    # nominal step and keeps the iterate, an accepted one grows it back
    # (plain halving left hard instances crawling).
    def step(i, carry):
        u, s, v, x, boost, rmse = carry
        r_cur, resid = obs_rmse_at(x)
        rmse = rmse.at[i].set(r_cur)
        if adaptive:
            # NIHT: exact line search for the gradient restricted to
            # the current column space (scale-free; i=0 has no basis
            # yet so it falls back to the 2/p SVP-style step)
            g_t = _mm(u, _mm(u.T, resid))
            num = jnp.sum(g_t * g_t)
            den = jnp.sum(jnp.where(mask, g_t, 0.0) ** 2)
            eta_n = jnp.where((i > 0) & (den > 0),
                              num / jnp.maximum(den, jnp.finfo(a_obs.dtype).tiny),
                              eta0)
            eta_i = boost * jnp.clip(eta_n, 1.0, 4.0 * eta0)
        else:
            eta_i = boost * eta0
        cu, _, _ = _rank_k_project(x + eta_i * resid,
                                   jax.random.fold_in(key, i), k, p, q,
                                   precision)
        # Two-sided ALS debias: refit coefficients on observed entries
        # for the projected column basis, orthonormalize the refit row
        # factor, refit the row side, then restore SVD form via the
        # small k x k SVD of the final coefficient factor.
        w = fit_cols(cu)                       # n x k
        qw, _ = jnp.linalg.qr(w)               # n x k orthonormal
        z = fit_rows(qw)                       # m x k
        cu, cs, vz_t = jnp.linalg.svd(z, full_matrices=False)
        cv = _mm(qw, vz_t.T)
        cx = _mm(cu * cs[None, :], cv.T)
        r_new, _ = obs_rmse_at(cx)
        ok = r_new <= r_cur
        u = jnp.where(ok, cu, u)
        s = jnp.where(ok, cs, s)
        v = jnp.where(ok, cv, v)
        x = jnp.where(ok, cx, x)
        boost = jnp.where(ok, jnp.minimum(1.2 * boost, 1.0), 0.5 * boost)
        return u, s, v, x, boost, rmse

    kk = min(k, m, n)
    carry0 = (jnp.zeros((m, kk), a_obs.dtype), jnp.zeros((kk,), a_obs.dtype),
              jnp.zeros((n, kk), a_obs.dtype), jnp.zeros_like(a_obs),
              jnp.ones((), a_obs.dtype),
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
    Returns (core, factors, observed-RMSE trace).

    Note: keeps the plain fixed-step + backtracking SVP scheme.  The
    matrix path's NIHT step and two-sided ALS debias have no cheap
    Tucker analogue (a per-fiber refit is a mode-wise Sylvester system,
    not a batched k x k solve), so expect SVP-rate convergence here —
    budget iters accordingly at sampling ratios near the DoF threshold.
    """
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
