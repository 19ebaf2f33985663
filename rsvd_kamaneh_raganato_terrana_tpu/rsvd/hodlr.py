"""HODLR hierarchical low-rank compression on the randomized engine.

Beyond-parity extension.  A HODLR matrix (Hierarchically Off-Diagonal
Low-Rank; Ambikasaran & Darve 2013) stores an n x n matrix as a binary
tree: dense diagonal leaf blocks plus rank-k factorizations of every
off-diagonal block at every level — O(k n log n) storage and matvec
instead of O(n^2).  The natural container for kernel/Green's-function/
covariance matrices whose OFF-diagonal interactions are smooth even
when the full matrix is full-rank (the reference's family-A failure
case, report p.13-14: global rSVD cannot compress them; hierarchical
low-rank can).

TPU shape: all blocks at one level share a static shape, so each
level's off-diagonal factorizations run as ONE vmapped rSVD over the
stacked blocks (batched stage-A GEMMs on the MXU), and the matvec is a
fori-free stack of batched GEMMs — level count = log2(n/leaf), all
static.  Factors live as (levels, blocks, m, k) stacked arrays: a
pytree of rectangular tensors, not Python object trees.
"""

from __future__ import annotations

from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _mm,
    generate_omega,
    rsvd_with_omega,
)


class HodlrMatrix(NamedTuple):
    """Stacked-factor HODLR representation.

    For level ell (0 = coarsest split), block size m_ell = n / 2^(ell+1)
    and there are b_ell = 2^ell sibling pairs:
      u_upper[ell]: (b_ell, m_ell, k) — row basis of each A12 block
      v_upper[ell]: (b_ell, m_ell, k) — A12 ~ u s v^T folded: u @ v^T
      u_lower/v_lower: same for the A21 blocks
    leaves: (2^levels, leaf, leaf) dense diagonal blocks.
    """

    u_upper: Tuple[jax.Array, ...]
    v_upper: Tuple[jax.Array, ...]
    u_lower: Tuple[jax.Array, ...]
    v_lower: Tuple[jax.Array, ...]
    leaves: jax.Array
    n: int
    k: int


def _off_diagonal_blocks(a, level: int):
    """Stacked (A12, A21) blocks at a level: a is n x n, block size
    m = n / 2^(level+1)."""
    n = a.shape[0]
    b = 2 ** level
    m = n // (2 * b)
    uppers = jnp.stack([
        jax.lax.dynamic_slice(a, (i * 2 * m, i * 2 * m + m), (m, m))
        for i in range(b)
    ])
    lowers = jnp.stack([
        jax.lax.dynamic_slice(a, (i * 2 * m + m, i * 2 * m), (m, m))
        for i in range(b)
    ])
    return uppers, lowers


@partial(jax.jit, static_argnames=("levels", "k", "p", "q"))
def _build_impl(a, levels: int, k: int, p: int, q: int, seed: int):
    n = a.shape[0]
    u_up: List[jax.Array] = []
    v_up: List[jax.Array] = []
    u_lo: List[jax.Array] = []
    v_lo: List[jax.Array] = []
    for ell in range(levels):
        uppers, lowers = _off_diagonal_blocks(a, ell)
        m = uppers.shape[1]
        kk = min(k, m)
        omega = generate_omega(seed + ell, m, min(kk + p, m), a.dtype)

        def factor(blk):
            u, s, v = rsvd_with_omega(blk, omega, q=q, k=kk, method="eigh",
                                      reorth="half")
            return u * s[None, :], v

        fu, fv = jax.vmap(factor)(uppers)       # (b, m, kk) each
        gu, gv = jax.vmap(factor)(lowers)
        u_up.append(fu)
        v_up.append(fv)
        u_lo.append(gu)
        v_lo.append(gv)
    leaf = n // 2 ** levels
    leaves = jnp.stack([
        jax.lax.dynamic_slice(a, (i * leaf, i * leaf), (leaf, leaf))
        for i in range(2 ** levels)
    ])
    return tuple(u_up), tuple(v_up), tuple(u_lo), tuple(v_lo), leaves


def hodlr_build(a, levels: int = 3, k: int = 16, p: int = 10, q: int = 1,
                seed: int = 0) -> HodlrMatrix:
    """Compress a dense n x n matrix (n divisible by 2**levels) into
    HODLR form with rank-k off-diagonal blocks."""
    a = jnp.asarray(a)
    n = a.shape[0]
    if a.shape[0] != a.shape[1]:
        raise ValueError("HODLR requires a square matrix")
    if n % (2 ** levels):
        raise ValueError(f"n={n} not divisible by 2^levels={2 ** levels}")
    parts = _build_impl(a, levels, k, p, q, seed)
    return HodlrMatrix(*parts, n=n, k=k)


def hodlr_build_implicit(block_fn, n: int, levels: int = 3, k: int = 16,
                         p: int = 10, q: int = 1,
                         seed: int = 0) -> HodlrMatrix:
    """HODLR compression of an IMPLICIT matrix — no dense n x n ever
    materializes, so this builds at sizes where the dense operand cannot
    exist (65536^2 f32 = 17 GB > HBM; the measured matvec/solve wins at
    those sizes are in bench_results/hodlr_sweep.csv).

    ``block_fn(i0, j0, rows, cols)`` must return the dense block
    ``A[i0:i0+rows, j0:j0+cols]`` (host or device array) — e.g. a kernel
    slice ``K(x[i0:i0+rows], x[j0:j0+cols])`` computed on device.  Only
    ONE TRIANGLE of one level's stacked off-diagonal blocks
    (2^ell x (n/2^(ell+1))^2 entries = n^2/2^(ell+2), largest at ell=0:
    a quarter of A) plus the leaf stack are ever resident: the upper
    stack is factorized and freed before the lower stack is formed.
    Pass deeper ``levels`` to shrink the peak further.
    """
    if n % (2 ** levels):
        raise ValueError(f"n={n} not divisible by 2^levels={2 ** levels}")
    u_up, v_up, u_lo, v_lo = [], [], [], []
    dtype = None
    for ell in range(levels):
        b = 2 ** ell
        m = n // (2 * b)
        kk = min(k, m)
        if dtype is None:
            # dtype-agnostic like hodlr_build: the sketch matches the
            # operand blocks (an x64 science run must not silently get
            # f32 sketches and break dense/implicit build parity)
            dtype = jnp.asarray(block_fn(0, m, 1, 1)).dtype
        omega = generate_omega(seed + ell, m, min(kk + p, m), dtype)

        @jax.jit
        def factor(blks, om):
            def one(blk):
                # default robust QR, exactly like hodlr_build's factor:
                # smooth off-diagonal blocks sketch to numerically
                # rank-deficient Y, where plain CholeskyQR2 loses 4
                # digits (measured) — robust's shifted/Householder
                # fallback vmaps as a select
                u, s, v = rsvd_with_omega(blk, om, q=q, k=om.shape[1],
                                          method="eigh", reorth="half")
                return u * s[None, :], v

            return jax.vmap(one)(blks)

        # factor-and-free one triangle at a time: keeping both stacks
        # alive would double peak residency to ~n^2/2 at ell=0, defeating
        # the beyond-HBM purpose of this builder
        uppers = jnp.stack([jnp.asarray(
            block_fn(i * 2 * m, i * 2 * m + m, m, m)) for i in range(b)])
        fu, fv = factor(uppers, omega)
        del uppers
        lowers = jnp.stack([jnp.asarray(
            block_fn(i * 2 * m + m, i * 2 * m, m, m)) for i in range(b)])
        gu, gv = factor(lowers, omega)
        del lowers
        # truncate the oversampled factors back to kk (rsvd_with_omega
        # returns all l columns when k == l)
        u_up.append(fu[..., :kk])
        v_up.append(fv[..., :kk])
        u_lo.append(gu[..., :kk])
        v_lo.append(gv[..., :kk])
    leaf = n // 2 ** levels
    leaves = jnp.stack([jnp.asarray(
        block_fn(i * leaf, i * leaf, leaf, leaf))
        for i in range(2 ** levels)])
    return HodlrMatrix(tuple(u_up), tuple(v_up), tuple(u_lo), tuple(v_lo),
                       leaves, n=n, k=k)


@jax.jit
def hodlr_matvec(h: HodlrMatrix, x) -> jax.Array:
    """y = H x in O(k n log n): per level, batched (b, m, k) GEMVs."""
    x = jnp.asarray(x)
    y = jnp.zeros_like(x)
    for fu, fv, gu, gv in zip(h.u_upper, h.v_upper, h.u_lower, h.v_lower):
        b, m, _ = fu.shape
        xb = x.reshape(b, 2 * m)
        x1, x2 = xb[:, :m], xb[:, m:]
        y1 = jnp.einsum("bmk,bk->bm", fu,
                        jnp.einsum("bmk,bm->bk", fv, x2))
        y2 = jnp.einsum("bmk,bk->bm", gu,
                        jnp.einsum("bmk,bm->bk", gv, x1))
        y = y + jnp.concatenate([y1, y2], axis=1).reshape(-1)
    leaf = h.leaves.shape[1]
    xl = x.reshape(-1, leaf)
    yl = jnp.einsum("bij,bj->bi", h.leaves, xl).reshape(-1)
    return y + yl


def hodlr_reconstruct(h: HodlrMatrix) -> jax.Array:
    """Dense n x n reconstruction (testing/inspection)."""
    n = h.n
    a = jnp.zeros((n, n), h.leaves.dtype)
    for fu, fv, gu, gv in zip(h.u_upper, h.v_upper, h.u_lower, h.v_lower):
        b, m, _ = fu.shape
        for i in range(b):
            r0 = i * 2 * m
            a = jax.lax.dynamic_update_slice(
                a, _mm(fu[i], fv[i].T), (r0, r0 + m))
            a = jax.lax.dynamic_update_slice(
                a, _mm(gu[i], gv[i].T), (r0 + m, r0))
    leaf = h.leaves.shape[1]
    for i in range(h.leaves.shape[0]):
        a = jax.lax.dynamic_update_slice(
            a, h.leaves[i], (i * leaf, i * leaf))
    return a


def hodlr_compression_ratio(h: HodlrMatrix) -> float:
    """dense entries / stored entries."""
    stored = int(h.leaves.size)
    for fu in h.u_upper:
        stored += 4 * int(fu.size)        # u/v upper + u/v lower, same size
    return (h.n * h.n) / stored


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def hodlr_solve(h: HodlrMatrix, b, tol: float = 1e-8,
                maxiter: int = 200) -> jax.Array:
    """Solve H x = b for SPD H (kernel + ridge matrices, the HODLR use
    case) by conjugate gradients on the O(kn log n) matvec, with the
    dense leaf blocks as a block-Jacobi preconditioner — each CG
    iteration costs one hierarchical matvec plus a batched triangular
    solve, so the whole solve stays O(k n log n) per iteration instead
    of the dense O(n^2)."""
    b = jnp.asarray(b)
    # leaf-block Cholesky factors (SPD diagonal blocks), batched once
    chol = jax.vmap(jnp.linalg.cholesky)(h.leaves)
    leaf = h.leaves.shape[1]

    def precond(r):
        rb = r.reshape(-1, leaf)
        z = jax.vmap(lambda c, y: jax.scipy.linalg.cho_solve((c, True), y)
                     )(chol, rb)
        return z.reshape(-1)

    x, _ = jax.scipy.sparse.linalg.cg(
        lambda v: hodlr_matvec(h, v), b, tol=tol, maxiter=maxiter,
        M=precond)
    return x
