"""Randomized interpolative (ID) and CUR decompositions.

Beyond-parity extensions (no reference counterpart — the reference's
factorizations, src/rSVD.cpp:72-133, are all orthogonal-basis forms).
ID/CUR express A in terms of its OWN columns/rows:

    column ID:  A  ~  A[:, J] @ X          (J: k column indices)
    CUR:        A  ~  C @ U @ R            (C = A[:, J], R = A[I, :])

which preserves sparsity/interpretability (selected columns ARE data
columns — features in PCA terms, snapshots in POD terms: a CUR of the
snapshot matrix names WHICH time steps span the dynamics).

TPU-native design: all O(mn) work is one sketch GEMM (G = Omega^T A,
l x n, exactly the rSVD stage-B shape); the sequential part — greedy
column pivoting — runs on the SMALL sketch only, as a k-step
`lax.fori_loop` of rank-1 updates (k * O(l n) FLOPs, fully jittable,
static shapes).  The interpolation matrix comes from the framework's
CholeskyQR machinery rather than a pivoted-QR back-solve.

Method: Halko-Martinsson-Tropp 2011 sec. 5.2 (randomized ID) with
sketch-space pivoting (Voronin & Martinsson 2017, "RSVDPACK" ID variant);
CUR by row-ID x column-ID composition with a least-squares core
(Mahoney & Drineas 2009 structure, deterministic given the sketch).
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
)


def _greedy_pivots(g, k: int):
    """k greedy column pivots of the small sketch G (l x n): at each step
    pick the column of largest residual norm, then deflate its direction
    (one rank-1 update) — right-looking pivoted Gram-Schmidt, expressed
    as a fori_loop so the whole selection is one compiled program."""
    l, n = g.shape
    eps = jnp.finfo(g.dtype).eps

    def step(i, carry):
        r, idx, mask = carry
        norms = jnp.sum(r * r, axis=0)
        norms = jnp.where(mask, -jnp.inf, norms)
        j = jnp.argmax(norms).astype(jnp.int32)
        col = r[:, j]
        scale = jnp.sqrt(jnp.maximum(norms[j], eps * eps))
        q = col / scale
        r = r - jnp.outer(q, _mm(q[None, :], r)[0])
        return r, idx.at[i].set(j), mask.at[j].set(True)

    idx0 = jnp.zeros((k,), dtype=jnp.int32)
    mask0 = jnp.zeros((n,), dtype=bool)
    _, idx, _ = jax.lax.fori_loop(0, k, step, (g, idx0, mask0))
    return idx


@partial(jax.jit, static_argnames=("k", "p", "precision"))
def _column_id_impl(a, *, k, p, seed, precision):
    m, n = a.shape
    l = min(k + p, min(m, n))
    prec = _PRECISIONS.get(precision, precision)
    omega = generate_omega(seed, m, l, a.dtype)
    g = _mm(omega.T, a, prec)                       # l x n sketch
    cols = _greedy_pivots(g, k)
    # interpolation: X = argmin ||G[:, J] X - G||_F, via thin QR of the
    # l x k pivot block (robust CholeskyQR2 with Householder fallback)
    gj = jnp.take(g, cols, axis=1)
    q, r = qr_reduced(gj, "robust")
    x = jax.lax.linalg.triangular_solve(
        r, _mm(q.T, g, jax.lax.Precision.HIGHEST),
        left_side=True, lower=False)
    return cols, x


def column_id(
    a,
    k: int,
    p: int = 10,
    seed: int = 0,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Rank-k column interpolative decomposition: A ~ A[:, cols] @ X.

    Returns (cols: int32[k], X: k x n).  X[:, cols] is (numerically) the
    identity — selected columns represent themselves.
    """
    a = jnp.asarray(a)
    return _column_id_impl(a, k=k, p=p, seed=seed, precision=precision)


def row_id(a, k: int, p: int = 10, seed: int = 0,
           precision: str = "highest") -> Tuple[jax.Array, jax.Array]:
    """Rank-k row ID: A ~ X @ A[rows, :].  Returns (rows, X: m x k)."""
    cols, xt = column_id(jnp.asarray(a).T, k, p, seed, precision)
    return cols, xt.T


@partial(jax.jit, static_argnames=("k", "p", "precision"))
def _cur_impl(a, *, k, p, seed, precision):
    cols, _ = _column_id_impl(a, k=k, p=p, seed=seed, precision=precision)
    rows, _ = _column_id_impl(a.T, k=k, p=p, seed=seed + 1,
                              precision=precision)
    c = jnp.take(a, cols, axis=1)                   # m x k
    r = jnp.take(a, rows, axis=0)                   # k x n
    # core U = C^+ A R^+ via two least-squares solves (QR-based, no pinv):
    qc, rc = qr_reduced(c, "robust")
    t = jax.lax.linalg.triangular_solve(            # C^+ A  (k x n)
        rc, _mm(qc.T, a, jax.lax.Precision.HIGHEST),
        left_side=True, lower=False)
    qr_, rr = qr_reduced(r.T, "robust")
    u = jax.lax.linalg.triangular_solve(            # (R^T)^+ (C^+ A)^T
        rr, _mm(qr_.T, t.T, jax.lax.Precision.HIGHEST),
        left_side=True, lower=False).T
    return cols, rows, u


def cur(
    a,
    k: int,
    p: int = 10,
    seed: int = 0,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-k CUR decomposition: A ~ A[:, cols] @ U @ A[rows, :].

    Returns (cols: int32[k], rows: int32[k], U: k x k).  Reconstruct with
    ``cur_reconstruct(a, cols, rows, u)``.
    """
    a = jnp.asarray(a)
    return _cur_impl(a, k=k, p=p, seed=seed, precision=precision)


def id_reconstruct(a, cols, x):
    """A_k = A[:, cols] @ X."""
    return _mm(jnp.take(jnp.asarray(a), cols, axis=1), x)


def cur_reconstruct(a, cols, rows, u):
    """A_k = C @ U @ R."""
    a = jnp.asarray(a)
    c = jnp.take(a, cols, axis=1)
    r = jnp.take(a, rows, axis=0)
    return _mm(_mm(c, u), r)


@partial(jax.jit, static_argnames=("k", "p", "axis"))
def leverage_scores(a, k: int, p: int = 10, seed: int = 0,
                    axis: int = 0) -> jax.Array:
    """Approximate rank-k leverage scores along ``axis`` (0: rows, 1:
    columns): l_i = ||U_k[i, :]||^2 with U_k the top-k singular subspace
    from the rSVD range finder.  Scores sum to ~k; row i's score is its
    statistical importance to the rank-k fit — the sampling weights
    behind leverage-based CUR/coresets (Mahoney-Drineas 2009).  One
    rSVD-stage cost; jitted."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_with_omega

    a = jnp.asarray(a)
    omega = generate_omega(seed, a.shape[1], min(k + p, min(a.shape)),
                           a.dtype)
    u, _, v = rsvd_with_omega(a, omega, q=1, k=k, method="eigh")
    basis = u if axis == 0 else v
    return jnp.sum(basis * basis, axis=1)


def leverage_sample(a, k: int, num_samples: int, p: int = 10,
                    seed: int = 0, axis: int = 0):
    """Sample ``num_samples`` distinct indices along ``axis`` with
    probability proportional to their rank-k leverage scores — the
    standard coreset / importance-sampled CUR row (column) selection.
    Returns ``(indices: int32[num_samples], scores: full-axis)``."""
    scores = leverage_scores(a, k, p=p, seed=seed, axis=axis)
    key = jax.random.fold_in(jax.random.PRNGKey(seed), 0x1e7a)
    n = scores.shape[0]
    num = min(int(num_samples), n)
    # Gumbel top-k trick: distinct samples proportional to scores in one
    # vectorized pass (no sequential rejection loop)
    logits = jnp.log(jnp.maximum(scores, 1e-30))
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (n,), scores.dtype, 1e-12, 1.0)))
    _, idx = jax.lax.top_k(logits + gumbel, num)
    return idx.astype(jnp.int32), scores
