"""Block-Krylov randomized SVD.

Beyond-parity extension.  The reference's power-iteration range finder
(intermediate_step, src/rSVD.cpp:57-70) discards every intermediate
subspace: after q rounds only (A A^T)^q A Omega survives.  The
block-Krylov range finder (Musco & Musco 2015, "Randomized block Krylov
methods for stronger and faster approximate SVD") keeps ALL the
intermediates,

    K = [ Y_0, Y_1, ..., Y_q ],   Y_0 = A Omega,  Y_i = A A^T Y_{i-1},

and projects onto orth(K).  Same number of passes over A as power
iteration, but the subspace corresponds to an optimal degree-q
polynomial filter instead of the fixed x^q — a provably better
low-rank approximation per pass, and dramatically so on slowly decaying
spectra (the reference's "family A" matrices, which its rSVD cannot
compress at all until k ~ n; report p.13-14, Fig 4.2).

TPU shape: the big operands are the same stage-A GEMMs as the driver's;
each block is orthonormalized on arrival (CholeskyQR against-previous
deflation keeps the concatenated basis well-conditioned without a giant
final Householder QR), and the tail runs on an l(q+1) x n projected
matrix — still replicated-small for the usual k, p, q.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    _mm,
    generate_omega,
)


def krylov_basis(a, omega, q: int, qr_method: str = "robust",
                 precision=None):
    """Orthonormal basis of the block-Krylov space
    span[A Omega, (A A^T) A Omega, ..., (A A^T)^q A Omega]  (m x l(q+1)).

    Each block is deflated against the accumulated basis and
    orthonormalized before the next multiplication — block classical
    Gram-Schmidt with reorthogonalization via the robust CholeskyQR,
    so the final concatenation needs no extra QR."""
    def mm(x, y):
        return _mm(x, y, precision) if precision is not None else _mm(x, y)

    y = mm(a, omega)
    q_blk = orthonormal_basis(y, qr_method)
    blocks = [q_blk]

    for _ in range(q):
        y = mm(a, mm(a.T, q_blk))
        # two-pass block Gram-Schmidt against everything so far
        for _pass in range(2):
            for prev in blocks:
                y = y - mm(prev, mm(prev.T, y))
        q_blk = orthonormal_basis(y, qr_method)
        blocks.append(q_blk)
    return jnp.concatenate(blocks, axis=1)


@partial(jax.jit, static_argnames=("k", "p", "q", "method", "qr_method",
                                   "precision"))
def _rsvd_krylov_impl(a, *, k, p, q, method, qr_method, seed, precision):
    m, n = a.shape
    l = min(k + p if k > 0 else p, min(m, n))
    prec = _PRECISIONS.get(precision, precision)
    omega = generate_omega(seed, n, l, a.dtype)
    q_mat = krylov_basis(a, omega, q, qr_method, prec)   # m x l(q+1)
    b = _mm(q_mat.T, a, prec)                            # l(q+1) x n
    u_t, s, v = small_svd(b, method)
    u = _mm(q_mat, u_t)
    kk = k if k > 0 else l
    return u[:, :kk], s[:kk], v[:, :kk]


def rsvd_krylov(
    a,
    k: int = 0,
    p: int = 10,
    q: int = 2,
    method: SVDMethod | str = "eigh",
    qr_method: str = "robust",
    seed: int = 0,
    precision: str = "highest",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Randomized truncated SVD with a block-Krylov range finder.

    Same signature/contract as ``rsvd`` (returns U[:, :k], s[:k],
    V[:, :k]); same number of passes over A as ``rsvd`` at equal q, but
    strictly better approximation on slowly decaying spectra — use this
    when truncation error matters more than tail-SVD cost (the projected
    problem is l(q+1) x n instead of l x n).
    """
    a = jnp.asarray(a)
    method = SVDMethod.parse(method)
    return _rsvd_krylov_impl(a, k=k, p=p, q=q, method=method.value,
                             qr_method=qr_method, seed=seed,
                             precision=precision)
