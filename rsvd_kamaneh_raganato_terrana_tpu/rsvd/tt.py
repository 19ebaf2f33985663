"""Randomized tensor-train decomposition (TT-SVD with the rSVD stage).

Completes the tensor story next to Tucker (rsvd/tucker.py): for d-way
tensors Tucker's core grows like r^d, while a tensor train
(Oseledets 2011) stores d cores G_i of shape (r_{i-1}, n_i, r_i) —
linear in d — and is the format of choice for high-dimensional grids,
parameter studies, and quantized (2x2x...x2) reshapes of long signals.

Algorithm: sequential TT-SVD where each step's truncated SVD of the
current unfolding (r_{i-1} n_i  x  prod_{j>i} n_j) is this framework's
randomized SVD — one rSVD stage per mode, all GEMMs, each step shrinking
the remainder by the rank ratio.  Error composes as
||A - TT||_F^2 <= sum_i eps_i^2 exactly like ST-HOSVD, so a tolerance
budget splits as tol/sqrt(d-1) per mode.

TPU shape: each step is the rsvd driver's pipeline on a reshaped operand
(static shapes per step; the whole fixed-rank decomposition is one jitted
program), cores stay small, and the remainder matrix — the only large
object — is consumed GEMM-by-GEMM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd._modewise import (
    mode_contract,
    mode_spectrum,
    tighten_contract,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    generate_omega,
    subspace_iteration,
)

@partial(jax.jit, static_argnames=("ranks", "p", "q", "precision", "shape"))
def _tt_impl(a_flat, seed, shape: Tuple[int, ...], ranks: Tuple[int, ...],
             p: int, q: int, precision: str):
    prec = _PRECISIONS.get(precision, precision)
    d = len(shape)
    cores = []
    rem = a_flat.reshape(shape[0], -1)          # r_0 = 1 folded in
    r_prev = 1
    for i in range(d - 1):
        m = r_prev * shape[i]
        rem = rem.reshape(m, -1)
        r = min(ranks[i], min(rem.shape))
        l = min(r + p, min(rem.shape))
        omega = generate_omega(seed + 104729 * i, rem.shape[1], l,
                               rem.dtype)
        q_mat = subspace_iteration(rem, omega, q, precision=prec)  # m x l
        u, rem = tighten_contract(rem, q_mat, r, prec)  # m x r, r x rest
        cores.append(u.reshape(r_prev, shape[i], r))
        r_prev = r
    cores.append(rem.reshape(r_prev, shape[-1], 1))
    return tuple(cores)


def tt_decompose(
    a,
    ranks: Sequence[int],
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    precision: str = "highest",
):
    """Randomized TT-SVD: returns d cores, cores[i] of shape
    (r_{i-1}, n_i, r_i) with r_0 = r_d = 1; ``ranks`` gives the d-1
    internal ranks (clipped to each unfolding's max)."""
    a = jnp.asarray(a)
    if len(ranks) != a.ndim - 1:
        raise ValueError(f"need {a.ndim - 1} internal ranks, got "
                         f"{len(ranks)}")
    return _tt_impl(a.reshape(-1), seed, a.shape, tuple(int(r) for r in
                                                        ranks), p, q,
                    precision)


def tt_reconstruct(cores):
    """Contract a tensor train back to the full tensor."""
    out = cores[0]                               # (1, n_0, r_1)
    for core in cores[1:]:
        # (..., r) x (r, n, r') -> (..., n, r')
        out = jnp.tensordot(out, core, axes=((out.ndim - 1,), (0,)))
    return out[0, ..., 0]


def tt_ranks(cores) -> Tuple[int, ...]:
    """The internal ranks (r_1, ..., r_{d-1})."""
    return tuple(c.shape[2] for c in cores[:-1])


def tt_compression_ratio(cores) -> float:
    """dense element count / TT element count."""
    import numpy as np

    dense = float(np.prod([c.shape[1] for c in cores]))
    stored = float(sum(int(np.prod(c.shape)) for c in cores))
    return dense / stored


def tt_adaptive(
    a,
    tol: float,
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    rank_cap: Optional[int] = None,
):
    """Tolerance-driven TT-SVD: pick each internal rank from the energy
    of the projected unfolding (per-mode budget tol/sqrt(d-1)).  Host-side
    rank decisions between jitted per-mode programs.  Returns
    ``(cores, ranks)``."""
    import numpy as np

    a = jnp.asarray(a)
    d = a.ndim
    budget = float(tol) / max(np.sqrt(d - 1), 1.0)
    cores = []
    rem = a.reshape(a.shape[0], -1)
    r_prev = 1
    for i in range(d - 1):
        m = r_prev * a.shape[i]
        rem = rem.reshape(m, -1)
        cap = int(min(rank_cap or min(rem.shape), min(rem.shape)))
        l = min(cap + p, min(rem.shape))
        q_mat, w, vecs, total = mode_spectrum(
            rem, seed + 104729 * i, l, q)
        w = np.maximum(np.asarray(w, dtype=np.float64), 0.0)
        total = float(np.asarray(total, dtype=np.float64))
        resid = np.maximum(total - np.cumsum(w), 0.0)
        ok = np.nonzero(resid <= (budget * budget) * total)[0]
        r = min(int(ok[0]) + 1 if ok.size else cap, cap)
        u, rem = mode_contract(rem, q_mat, vecs, r)
        cores.append(u.reshape(r_prev, a.shape[i], r))
        r_prev = r
    cores.append(rem.reshape(r_prev, a.shape[-1], 1))
    return tuple(cores), tt_ranks(cores)
