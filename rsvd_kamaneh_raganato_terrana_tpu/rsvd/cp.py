"""CP (canonical polyadic) decomposition by ALS — the third tensor format.

Next to Tucker (rsvd/tucker.py: orthogonal subspaces per mode) and the
tensor train (rsvd/tt.py: linear-in-d cores), CP expresses a tensor as a
sum of `rank` outer products — the format of interpretable latent-factor
models.  A ~ sum_r w_r * f^(1)_r o f^(2)_r o ... o f^(d)_r.

Algorithm: alternating least squares where each mode update is the
classic normal-equation form over the Khatri-Rao product,

    F_i <- A_(i) * KR(F_d..F_1, skip i) * pinv( had_{j != i} F_j^T F_j ),

i.e. one big GEMM against the unfolding, an r x r Hadamard-of-Grams
solve, and a column renormalization — all MXU/GEMM work.  The whole
fixed-iteration ALS runs inside ONE jitted program (`lax.fori_loop`;
static shapes: the Khatri-Rao is a reshape of a broadcasted product, no
data-dependent control flow).  Initialization is randomized (rSVD range
finder per mode — the HOSVD-style init that makes ALS converge in a few
sweeps on well-posed problems, vs random init's long plateaus).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd._modewise import tighten_contract
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _mm,
    generate_omega,
    subspace_iteration,
)


def _unfold(t, mode: int):
    return jnp.moveaxis(t, mode, 0).reshape(t.shape[mode], -1)


def khatri_rao(mats: Sequence[jax.Array]) -> jax.Array:
    """Column-wise Khatri-Rao product, C-order nesting (first factor
    varies slowest) — matches `_unfold`'s row-major flattening."""
    out = mats[0]
    r = out.shape[1]
    for m in mats[1:]:
        out = (out[:, None, :] * m[None, :, :]).reshape(-1, r)
    return out


def _cp_init(a, seed, rank: int):
    """rSVD-subspace init per mode: F_i = top-r left singular directions
    of the unfolding (HOSVD-style), far better conditioned than random
    init; padded with deterministic pseudo-random columns when a mode
    can't support the full rank.  Unfoldings are transient here — not
    captured by the sweep closures."""
    factors = []
    for i in range(a.ndim):
        unf = _unfold(a, i)
        r_i = min(rank, min(unf.shape))
        omega = generate_omega(seed + 31 * i, unf.shape[1], r_i, a.dtype)
        q_mat = subspace_iteration(unf, omega, q=1)
        u, _ = tighten_contract(unf, q_mat, r_i, DOT_PRECISION)
        if r_i < rank:
            extra = generate_omega(seed + 97 * i, a.shape[i], rank - r_i,
                                   a.dtype)
            u = jnp.concatenate([u, extra / jnp.sqrt(float(a.shape[i]))],
                                axis=1)
        factors.append(u)
    return factors


def _regularize(g, rank: int, dtype):
    """Symmetric-solve floor: eps * (trace + 1) — the absolute +1 keeps
    the solve nonsingular even for an all-zero Gram (zero tensor /
    collapsed factor), which would otherwise NaN the decomposition."""
    return g + jnp.finfo(dtype).eps * (jnp.trace(g) + 1.0) * jnp.eye(
        rank, dtype=dtype)


def _cp_finalize(factors, eps):
    """Extract weights from the last mode, sort descending."""
    last = factors[-1]
    weights = jnp.linalg.norm(last, axis=0)
    last = last / jnp.maximum(weights, eps)[None, :]
    order = jnp.argsort(-weights)
    return weights[order], tuple(
        [f[:, order] for f in factors[:-1]] + [last[:, order]])


@partial(jax.jit, static_argnames=("rank", "iters"))
def _cp_als_impl(a, seed, rank: int, iters: int):
    d = a.ndim
    unfolds = [_unfold(a, i) for i in range(d)]
    factors = _cp_init(a, seed, rank)
    eps = jnp.asarray(1e-30, a.dtype)

    def sweep(_, fs):
        for i in range(d):
            others = [fs[j] for j in range(d) if j != i]
            kr = khatri_rao(others)                         # prod n_j x r
            g = jnp.ones((rank, rank), a.dtype)
            for f in others:
                g = g * _mm(f.T, f)                         # Hadamard Grams
            mttkrp = _mm(unfolds[i], kr)                    # n_i x r
            g = _regularize(g, rank, a.dtype)
            f_new = jax.scipy.linalg.solve(g.T, mttkrp.T,
                                           assume_a="pos").T
            # renormalize columns (weights are re-absorbed on the last
            # mode each sweep, the standard CP-ALS convention)
            if i < d - 1:
                norms = jnp.maximum(
                    jnp.linalg.norm(f_new, axis=0), eps)
                f_new = f_new / norms[None, :]
            fs = fs[:i] + [f_new] + fs[i + 1:]
        return fs

    factors = jax.lax.fori_loop(0, iters, sweep, factors)
    return _cp_finalize(factors, eps)


@partial(jax.jit, static_argnames=("rank", "iters", "num_samples"))
def _cp_rand_impl(a, seed, rank: int, iters: int, num_samples: int):
    """CPRAND (Battaglino-Ballard-Kolda 2018): each mode update solves a
    FIBER-SAMPLED least squares — S rows of the Khatri-Rao product are
    materialized directly as Hadamard products of factor rows (never the
    full prod-n x r KR), and the matching S tensor fibers are gathered
    straight from the flat tensor (no per-mode unfolding copies live
    through the loop: peak memory stays ~one tensor).  Per sweep: d
    gathers + d (n_i x S)(S x r) GEMMs, independent of prod(n)."""
    d = a.ndim
    shape = a.shape
    # C-order strides for direct fiber gather (flat index into a_flat);
    # prod(shape) < 2^31 is enforced by the cp_decompose wrapper so int32
    # accumulation cannot wrap
    strides = [1] * d
    for j in range(d - 2, -1, -1):
        strides[j] = strides[j + 1] * shape[j + 1]
    a_flat = a.reshape(-1)

    factors = _cp_init(a, seed, rank)
    eps = jnp.asarray(1e-30, a.dtype)
    key0 = jax.random.fold_in(key_from_seed(seed), 12345)

    def sweep(it, fs):
        for i in range(d):
            others = [j for j in range(d) if j != i]
            key = jax.random.fold_in(jax.random.fold_in(key0, it), i)
            # one uniform multi-index per sample for each other mode
            ks = jax.random.split(key, d - 1)
            idxs = [jax.random.randint(ks[t], (num_samples,), 0,
                                       shape[j])
                    for t, j in enumerate(others)]
            # sampled KR rows: Hadamard product of the factor rows
            kr_s = jnp.ones((num_samples, rank), a.dtype)
            for t, j in enumerate(others):
                kr_s = kr_s * fs[j][idxs[t]]
            # fiber base offsets into the flat tensor; the mode-i axis
            # contributes k * strides[i] per element of the fiber
            base = jnp.zeros((num_samples,), jnp.int32)
            for t, j in enumerate(others):
                base = base + idxs[t].astype(jnp.int32) * strides[j]
            gather = base[None, :] + (
                jnp.arange(shape[i], dtype=jnp.int32)[:, None]
                * strides[i])
            a_s = a_flat[gather]                           # n_i x S
            g = _regularize(_mm(kr_s.T, kr_s), rank, a.dtype)
            f_new = jax.scipy.linalg.solve(
                g.T, _mm(a_s, kr_s).T, assume_a="pos").T
            if i < d - 1:
                norms = jnp.maximum(jnp.linalg.norm(f_new, axis=0), eps)
                f_new = f_new / norms[None, :]
            fs = fs[:i] + [f_new] + fs[i + 1:]
        return fs

    factors = jax.lax.fori_loop(0, iters, sweep, factors)
    return _cp_finalize(factors, eps)


def cp_decompose(
    a,
    rank: int,
    iters: int = 25,
    seed: int = 0,
    method: str = "als",
    num_samples: int = 0,
) -> Tuple[jax.Array, Tuple[jax.Array, ...]]:
    """CP: returns ``(weights: rank, factors)`` with
    ``factors[i].shape == (a.shape[i], rank)``, unit-norm columns, and
    weights descending.  Fixed ``iters`` sweeps in one jitted program.

    ``method='als'`` is exact alternating least squares (per sweep cost
    ~ d * prod(n) * rank); ``method='rand'`` is CPRAND — fiber-sampled
    updates whose per-sweep cost is independent of prod(n)
    (``num_samples`` Khatri-Rao rows per update; default 4*rank + 64,
    clamped to the available fiber count).  Use 'rand' when the tensor
    is large and 'als' when accuracy per sweep matters more than sweep
    cost."""
    a = jnp.asarray(a)
    if a.ndim < 2:
        raise ValueError("cp_decompose needs a tensor of ndim >= 2")
    if method == "als":
        return _cp_als_impl(a, seed, int(rank), int(iters))
    if method == "rand":
        import numpy as _np

        if int(_np.prod(a.shape)) >= 2 ** 31:
            raise ValueError(
                "method='rand' gathers fibers by flat int32 index; "
                f"prod(shape)={int(_np.prod(a.shape))} >= 2^31 would "
                "overflow — decompose a sharded/reshaped view instead")
        s = int(num_samples) if num_samples else 4 * int(rank) + 64
        max_fibers = int(_np.prod(a.shape)) // max(min(a.shape), 1)
        s = max(min(s, max_fibers), int(rank))
        return _cp_rand_impl(a, seed, int(rank), int(iters), s)
    raise ValueError(f"unknown method {method!r}")


def cp_reconstruct(weights, factors):
    """Sum of outer products back to the full tensor."""
    kr = khatri_rao(list(factors[1:]))               # prod n_j x r
    lead = factors[0] * weights[None, :]
    return _mm(lead, kr.T).reshape([f.shape[0] for f in factors])
