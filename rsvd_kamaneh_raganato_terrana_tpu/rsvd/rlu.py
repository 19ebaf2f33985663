"""Randomized LU decomposition (RLU).

Beyond-parity extension.  P A Q ~ L U with P, Q row/column permutations,
L m x l lower-trapezoidal, U l x n upper-trapezoidal — the randomized
rank-revealing LU of Shabat, Shkolnisky, Aizenbud & Averbuch 2018
("Randomized LU decomposition", ACHA 44(2), Alg. 4.1 with the power
iteration of Alg. 4.4).  The reference has no LU anywhere (its QR is
Givens, src/QR.cpp:22-80); RLU completes the factorization family next
to rSVD / rUTV / ID-CUR: triangular factors like UTV, but with
PERMUTATION "bases" instead of orthonormal ones, so factor application
is gather + triangular product — no Q matmuls — and the factors embed
directly into sparse/direct-solver pipelines.

TPU shape: the sketch + power iterations are the framework's stage-A
GEMM machinery; the two pivoted LUs run on an m x l tall panel and an
n x l tall panel (XLA's blocked `lax.linalg.lu`); the only other work is
one l x l Cholesky solve.  Everything is static-shape, jit-compiled,
and (as with the rest of the driver family) the stage-A GEMMs partition
over a row-sharded A while the l-sized tail stays replicated.

Accuracy: range(P^T L) equals the range finder's subspace, so
||A - P^T L U Q^T|| matches the rSVD/QB error for the same (k, p, q) up
to the (small, bounded) conditioning of the unit-lower trapezoid of an
orthonormal panel's LU.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    _mm,
    generate_omega,
    subspace_iteration,
)


class RluResult(NamedTuple):
    """A[perm_rows][:, perm_cols] ~ l_factor @ u_factor.

    perm_rows: (m,) int32 — row permutation (the gather indices P)
    perm_cols: (n,) int32 — column permutation (the gather indices Q)
    l_factor:  (m, l) lower-trapezoidal
    u_factor:  (l, n) upper-trapezoidal with unit diagonal
    l_ortho:   (m, l) the unit-lower trapezoid of the ORTHONORMAL range
               panel's LU (l_factor = l_ortho @ u2.T).  Kept so solves can
               go through the two factors separately: l_ortho's Gram
               conditioning is bounded by the panel LU's (small), while
               l_factor's Gram squares cond(u2) — which is set by A's
               leading-l spectrum, not by the panel.
    u2:        (l, l) upper-triangular second-LU factor
    """

    perm_rows: jax.Array
    perm_cols: jax.Array
    l_factor: jax.Array
    u_factor: jax.Array
    l_ortho: jax.Array
    u2: jax.Array


@partial(jax.jit, static_argnames=("k", "p", "q", "precision"))
def _rlu_impl(a, *, k, p, q, seed, precision):
    m, n = a.shape
    l = min(k + p, min(m, n))
    prec = _PRECISIONS.get(precision, precision)
    omega = generate_omega(seed, n, l, a.dtype)
    # Orthonormal range basis (same subspace as Alg. 4.4's Y; the
    # orthonormalization only improves the conditioning of the panel LU).
    q_mat = subspace_iteration(a, omega, q, precision=prec)   # m x l
    # Pivoted LU of the tall panel: Q[perm] = L_y @ U_y.
    lu_y, _, perm_rows = jax.lax.linalg.lu(q_mat)
    l_y = jnp.tril(lu_y, -1) + jnp.eye(m, l, dtype=a.dtype)   # m x l
    pa = a[perm_rows, :]                                      # P A
    # B = L_y^+ (P A) via the l x l normal equations (L_y comes from an
    # orthonormal panel, so its Gram is well-conditioned).
    g = _mm(l_y.T, l_y, jax.lax.Precision.HIGHEST)
    ltpa = _mm(l_y.T, pa, prec)
    c = jnp.linalg.cholesky(g)
    b = jax.scipy.linalg.cho_solve((c, True), ltpa)           # l x n
    # Pivoted LU of B^T picks the column permutation:
    # B^T[perm_cols] = L2 @ U2  =>  B[:, perm_cols] = U2^T @ L2^T.
    lu_b, _, perm_cols = jax.lax.linalg.lu(b.T)
    l2 = jnp.tril(lu_b, -1) + jnp.eye(n, l, dtype=a.dtype)    # n x l
    u2 = jnp.triu(lu_b[:l, :])                                # l x l
    l_factor = _mm(l_y, u2.T, jax.lax.Precision.HIGHEST)      # m x l, lower
    u_factor = l2.T                                           # l x n, upper
    return perm_rows, perm_cols, l_factor, u_factor, l_y, u2


def rlu(
    a,
    k: int,
    p: int = 10,
    q: int = 2,
    seed: int = 0,
    precision: str = "highest",
) -> RluResult:
    """Randomized rank-l (l = k+p) LU: ``A[P][:, Q] ~ L @ U``.

    Returns :class:`RluResult` with permutation index vectors and the
    lower/upper trapezoidal factors.  Error matches the rSVD range
    finder's for the same (k, p, q).  Use :func:`rlu_reconstruct` to
    land back in original row/column order.
    """
    a = jnp.asarray(a)
    if a.ndim != 2:
        raise ValueError(f"rlu needs a 2-D matrix, got {a.shape}")
    if jnp.iscomplexobj(a):
        raise ValueError("rlu supports real input only")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    return RluResult(*_rlu_impl(a, k=k, p=p, q=q, seed=seed,
                                precision=precision))


def rlu_reconstruct(res: RluResult) -> jax.Array:
    """A ~ P^T (L U) Q^T in the ORIGINAL row/column order."""
    prod = _mm(res.l_factor, res.u_factor, jax.lax.Precision.HIGHEST)
    inv_rows = jnp.argsort(res.perm_rows)
    inv_cols = jnp.argsort(res.perm_cols)
    return prod[inv_rows, :][:, inv_cols]


def rlu_solve(res: RluResult, b) -> jax.Array:
    """Least-squares solve of A x ~ b through the RLU factors.

    Solves min ||L U x_q - b_p|| on the permuted system with the
    factored pseudo-inverse applied FACTOR BY FACTOR:
    L = l_ortho @ u2^T, so L^+ b = u2^{-T} (l_ortho^+ b) — the l x l
    Gram normal equations only ever see l_ortho, whose conditioning is
    bounded by the orthonormal panel's LU (small), while u2 (carrying
    A's leading-l spectrum, arbitrarily ill-conditioned) is handled by a
    backward-stable triangular solve.  (Solving through l_factor's Gram
    directly would square cond(u2).)  Then the square leading block of U
    is back-substituted and the trailing columns set to zero — the basic
    solution, exact when rank(A) <= l.
    """
    b = jnp.asarray(b, dtype=res.l_factor.dtype)
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    l_o, u_f = res.l_ortho, res.u_factor
    lsz = l_o.shape[1]
    bp = b[res.perm_rows, :]
    g = _mm(l_o.T, l_o, jax.lax.Precision.HIGHEST)
    c = jnp.linalg.cholesky(g)
    w = jax.scipy.linalg.cho_solve(
        (c, True), _mm(l_o.T, bp, jax.lax.Precision.HIGHEST))  # l x nrhs
    y = jax.scipy.linalg.solve_triangular(res.u2.T, w, lower=True)
    # U = [U1 | U2] with U1 l x l upper-triangular (unit diagonal after
    # the second LU); basic solution: x_q = [U1^{-1} y; 0].
    x1 = jax.scipy.linalg.solve_triangular(u_f[:, :lsz], y, lower=False)
    xq = jnp.concatenate(
        [x1, jnp.zeros((u_f.shape[1] - lsz,) + x1.shape[1:], x1.dtype)],
        axis=0)
    # column j of the permuted system is original column perm_cols[j]
    x = jnp.zeros_like(xq).at[res.perm_cols, :].set(xq)
    return x[:, 0] if squeeze else x
