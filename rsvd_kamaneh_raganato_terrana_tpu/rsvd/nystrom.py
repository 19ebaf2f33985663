"""Randomized factorizations for symmetric / positive-semidefinite inputs.

Beyond-parity extensions (no reference counterpart — the reference's rSVD,
src/rSVD.cpp:72-133, treats every input as a general rectangular matrix).
When A is symmetric PSD — Gram/covariance/kernel matrices, exactly the
matrices PCA and POD build internally (PCA_class.hpp:33-47,
POD.cpp:153-196) — structure-aware sketches are both faster and more
accurate:

- ``nystrom_psd``: single-pass stabilized Nystrom approximation
  (Tropp, Yurtsever, Udell & Cevher 2017, "Fixed-rank approximation of a
  positive-semidefinite matrix from streaming data", Alg. 3).  One
  streamed GEMM against A total (vs 2q+2 for rSVD), then everything else
  is l-sized: shift, Cholesky, triangular solve, small eigendecomposition.
- ``reigh``: randomized truncated eigendecomposition of a symmetric
  (possibly indefinite) matrix via the rSVD range finder + Rayleigh-Ritz
  projection T = Q^T A Q (Halko-Martinsson-Tropp 2011, Alg. 5.3).
- ``nystrom_pcg``: conjugate gradients on the regularized system
  (A + mu I) x = b preconditioned by the Nystrom approximation
  (Frangella, Tropp & Udell 2023, "Randomized Nystrom preconditioning",
  Alg. 3) — the fast path for kernel ridge regression / GP posterior
  solves where the spectrum decays but cond(A + mu I) is still large.

Both are pure GEMM + replicated small-factorization pipelines: on a
row-sharded A the stage-A products partition over the mesh exactly like
the rSVD driver's, and the l x l tail stays replicated.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    _mm,
    generate_omega,
    subspace_iteration,
)


def _eigh_descending(t):
    """eigh with eigenvalues sorted descending (eigh returns ascending)."""
    w, v = jnp.linalg.eigh(t)
    return w[::-1], v[:, ::-1]


@partial(jax.jit, static_argnames=("k", "p", "precision"))
def _nystrom_impl(a, *, k, p, seed, precision):
    n = a.shape[0]
    l = min(k + p, n)
    prec = _PRECISIONS.get(precision, precision)
    omega = generate_omega(seed, n, l, a.dtype)
    y = _mm(a, omega, prec)                                   # one pass over A
    # Stabilizing shift: nu ~ eps * ||Y||_F makes Omega^T (Y + nu Omega)
    # positive definite even when A is numerically rank-deficient; the
    # shift is subtracted from the eigenvalues at the end.
    nu = jnp.finfo(a.dtype).eps * jnp.linalg.norm(y)
    y_nu = y + nu * omega
    g = _mm(omega.T, y_nu, jax.lax.Precision.HIGHEST)         # l x l
    g = 0.5 * (g + g.T)
    c = jnp.linalg.cholesky(g)                                # lower
    # B = Y_nu C^{-T}:  A ~ B B^T - nu I on range(Y)
    b = jax.lax.linalg.triangular_solve(
        c, y_nu, left_side=False, lower=True, transpose_a=True)
    # Thin spectral factorization of the tall B via its l x l Gram:
    # B = U diag(s) W^T  with  s^2, W from eigh(B^T B).
    bg = _mm(b.T, b, jax.lax.Precision.HIGHEST)
    bg = 0.5 * (bg + bg.T)
    s2, w = _eigh_descending(bg)
    s2 = jnp.maximum(s2, 0.0)
    s = jnp.sqrt(s2)
    safe = jnp.where(s > 0, s, 1.0)
    u = _mm(b, w / safe[None, :], jax.lax.Precision.HIGHEST)
    lam = jnp.maximum(s2 - nu, 0.0)
    return u[:, :k], lam[:k]


def nystrom_psd(
    a,
    k: int,
    p: int = 10,
    seed: int = 0,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Rank-k eigendecomposition A ~ U diag(lam) U^T of a symmetric PSD A.

    Single streamed pass over A (the rSVD driver needs 2q+2); the
    approximation error matches rSVD-q=1-quality on PSD spectra at a
    fraction of the cost.  Returns (U: n x k, lam: k,) with lam >= 0
    descending.
    """
    a = jnp.asarray(a)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"nystrom_psd needs a square matrix, got {a.shape}")
    return _nystrom_impl(a, k=k, p=p, seed=seed, precision=precision)


@partial(jax.jit, static_argnames=("k", "p", "q", "precision"))
def _reigh_impl(a, *, k, p, q, seed, precision):
    n = a.shape[0]
    l = min(k + p, n)
    prec = _PRECISIONS.get(precision, precision)
    omega = generate_omega(seed, n, l, a.dtype)
    # Range finder: for symmetric A each power round squares the spectrum
    # magnitude, so the rSVD stage-A machinery applies unchanged.
    q_mat = subspace_iteration(a, omega, q, precision=prec)
    # Rayleigh-Ritz: T = Q^T A Q, replicated l x l.
    aq = _mm(a, q_mat, prec)
    t = _mm(q_mat.T, aq, jax.lax.Precision.HIGHEST)
    t = 0.5 * (t + t.T)
    w, v = jnp.linalg.eigh(t)
    order = jnp.argsort(-jnp.abs(w))                # by magnitude, signed kept
    w, v = w[order], v[:, order]
    u = _mm(q_mat, v)
    return w[:k], u[:, :k]


def reigh(
    a,
    k: int,
    p: int = 10,
    q: int = 2,
    seed: int = 0,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Randomized truncated eigendecomposition of a symmetric matrix.

    A ~ U diag(w) U^T with the k eigenpairs of largest magnitude; w keeps
    its signs (A may be indefinite).  Returns (w: k, U: n x k).
    """
    a = jnp.asarray(a)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"reigh needs a square matrix, got {a.shape}")
    return _reigh_impl(a, k=k, p=p, q=q, seed=seed, precision=precision)


def nystrom_reconstruct(u, lam):
    """A_k = U diag(lam) U^T."""
    return _mm(u * lam[None, :], u.T)


def nystrom_preconditioner(u, lam, mu):
    """Closure applying the FTU Nystrom preconditioner P^{-1}.

    With A ~ U diag(lam) U^T (rank l) and regularizer mu > 0,

        P = (lam_l + mu)^{-1} U (diag(lam) + mu I) U^T + (I - U U^T)

    (Frangella-Tropp-Udell 2023, eq. 5.1), whose inverse applies in one
    skinny GEMM pair per call:

        P^{-1} r = U [ (lam_l + mu) / (lam + mu) - 1 ] (U^T r) + r.

    P^{-1}(A + mu I) has condition ~ (lam_l + mu)/mu once the tail of
    the spectrum is below lam_l, independent of cond(A).
    """
    lam_last = lam[-1]

    def precond(r):
        coeff = (lam_last + mu) / (lam + mu) - 1.0
        return _mm(u, coeff[:, None] * _mm(u.T, r,
                                           jax.lax.Precision.HIGHEST),
                   jax.lax.Precision.HIGHEST) + r

    return precond


@partial(jax.jit, static_argnames=("rank", "iters", "precision"))
def _nystrom_pcg_impl(a, b, mu, *, rank, iters, seed, precision):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import _pcg_scan

    prec = _PRECISIONS.get(precision, precision)
    # Keep the full sketch rank in the preconditioner (p=0): every
    # computed eigenpair sharpens the preconditioner for free.
    u, lam = _nystrom_impl(a, k=rank, p=0, seed=seed, precision=precision)
    mu = jnp.asarray(mu, a.dtype)

    def apply_op(x):
        return _mm(a, x, prec) + mu * x

    return _pcg_scan(apply_op, nystrom_preconditioner(u, lam, mu), b,
                     iters)


def nystrom_pcg(
    a,
    b,
    mu: float,
    rank: int = 50,
    iters: int = 30,
    seed: int = 0,
    precision: str = "highest",
) -> jax.Array:
    """Solve the regularized PSD system ``(A + mu I) x = b`` by CG with
    the randomized Nystrom preconditioner (Frangella, Tropp & Udell
    2023, Alg. 3).

    One single-pass Nystrom sketch of rank ``rank`` builds the
    preconditioner; each of the fixed ``iters`` CG steps costs one GEMM
    against A plus one skinny GEMM pair.  When A's spectrum decays so
    that lam_rank <~ mu, the preconditioned operator is O(1)-conditioned
    and ~20-30 iterations reach working precision regardless of
    cond(A + mu I) — the regime of kernel ridge regression and GP
    posterior solves (the matrices apps/gp.py assembles).

    ``b`` may be ``(n,)`` or ``(n, nrhs)``.  Beyond-parity extension (the
    reference has no iterative solver; its closest relative is the Eigen
    CG call inside energy_POD, POD.cpp:296-304).
    """
    a = jnp.asarray(a)
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"nystrom_pcg needs a square matrix, got {a.shape}")
    if mu <= 0:
        raise ValueError(f"mu must be > 0, got {mu}")
    b = jnp.asarray(b, dtype=a.dtype)
    rank = int(min(rank, a.shape[0]))
    squeeze = b.ndim == 1
    if squeeze:
        b = b[:, None]
    x = _nystrom_pcg_impl(a, b, mu, rank=rank, iters=iters, seed=seed,
                          precision=precision)
    return x[:, 0] if squeeze else x


@partial(jax.jit, static_argnames=("k", "p", "q", "precision"))
def _reigh_generalized_impl(a, b, *, k, p, q, seed, precision):
    # B = L L^T; the standard transform C = L^{-1} A L^{-T} is symmetric
    # with the same eigenvalues, and eigvecs map back as v = L^{-T} w.
    # L^{-1}-applications are triangular solves — O(n^2) each against the
    # rSVD stage's O(n^2 l) GEMMs, so the transform is never the
    # bottleneck; C itself is formed once (two solves on n x n operands,
    # still GEMM-bandwidth work) to reuse the dense range finder.
    l_chol = jnp.linalg.cholesky(0.5 * (b + b.T))
    solve = partial(jax.lax.linalg.triangular_solve, l_chol,
                    left_side=True, lower=True)
    c = solve(0.5 * (a + a.T))                    # L^{-1} A
    c = solve(c.T).T                              # L^{-1} A L^{-T}
    w, u = _reigh_impl(c, k=k, p=p, q=q, seed=seed, precision=precision)
    v = jax.lax.linalg.triangular_solve(
        l_chol, u, left_side=True, lower=True, transpose_a=True)
    # B-orthonormalize the columns exactly: v^T B v = u^T u = I already
    # up to the randomized subspace's accuracy
    return w, v


def reigh_generalized(
    a,
    b,
    k: int,
    p: int = 10,
    q: int = 2,
    seed: int = 0,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array]:
    """Randomized truncated GENERALIZED symmetric eigendecomposition
    A v = lam B v with symmetric A and symmetric positive-definite B
    (mass/weight matrices — the structure behind the reference's
    weighted POD, POD.cpp weight variant).  Returns ``(w: k, V: n x k)``
    with ``V^T B V = I`` and w the k eigenvalues of largest magnitude."""
    a = jnp.asarray(a)
    b = jnp.asarray(b, dtype=a.dtype)
    if a.shape != b.shape or a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ValueError(f"need square A, B of equal shape, got "
                         f"{a.shape} vs {b.shape}")
    return _reigh_generalized_impl(a, b, k=k, p=p, q=q, seed=seed,
                                   precision=precision)
