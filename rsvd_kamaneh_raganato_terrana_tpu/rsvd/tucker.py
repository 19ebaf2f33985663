"""Randomized Tucker decomposition (sequentially-truncated randomized HOSVD).

Beyond-parity extension.  The reference compresses matrices only; real
image/video/snapshot data is naturally a tensor (frames x H x W, or
H x W x channels), and a Tucker core captures cross-mode structure a
per-slice matrix SVD cannot: A ~ G x_1 U1 x_2 U2 ... x_d Ud with
orthonormal factor matrices U_i (n_i x r_i) and core G (r_1 x ... x r_d).

Algorithm: ST-HOSVD (Vannieuwenhoven et al. 2012) with the matrix stage
replaced by this framework's rSVD range finder — for each mode in turn,
sketch the mode-unfolding of the CURRENT (already partially compressed)
tensor, take U_i = range basis, and contract it in immediately so later
modes work on a tensor that shrinks geometrically.  Each mode costs one
rSVD stage A on an n_i x (prod of remaining dims) unfolding: all GEMMs,
MXU-dense; the whole decomposition is one jitted program (static mode
order and ranks), so it dispatches once through a remote transport.

Error: ||A - [G; U]||_F^2 <= sum_i eps_i^2 where eps_i is mode i's
truncation error — the classic ST-HOSVD bound carries over with the rSVD
range finder's expected-error factor per mode.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
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

_HI = DOT_PRECISION


def _unfold(t, mode: int):
    """Mode-`mode` unfolding: n_mode x prod(other dims)."""
    return jnp.moveaxis(t, mode, 0).reshape(t.shape[mode], -1)


def _fold(mat, mode: int, shape):
    """Inverse of `_unfold` for a tensor of (full) `shape`."""
    shp = (mat.shape[0],) + tuple(s for i, s in enumerate(shape)
                                  if i != mode)
    return jnp.moveaxis(mat.reshape(shp), 0, mode)


def mode_dot(t, mat, mode: int, precision=_HI):
    """Mode-`mode` product t x_mode mat (mat: r x n_mode contracts the
    mode-`mode` axis)."""
    moved = jnp.moveaxis(t, mode, 0)
    out = jnp.tensordot(mat, moved, axes=((1,), (0,)),
                        precision=precision)
    return jnp.moveaxis(out, 0, mode)


@partial(jax.jit, static_argnames=("ranks", "p", "q", "precision"))
def _tucker_impl(a, seed, ranks: Tuple[int, ...], p: int, q: int,
                 precision: str):
    prec = _PRECISIONS.get(precision, precision)
    core = a
    factors = []
    # process modes in decreasing size: each contraction shrinks the
    # tensor the most before later (cheaper) modes are sketched
    order = sorted(range(a.ndim), key=lambda i: -a.shape[i])
    for mode in order:
        unf = _unfold(core, mode)                  # n_mode x rest
        l = min(ranks[mode] + p, min(unf.shape))
        omega = generate_omega(seed + 7919 * mode, unf.shape[1], l,
                               unf.dtype)
        q_mat = subspace_iteration(unf, omega, q, precision=prec)
        u, contracted = tighten_contract(unf, q_mat, ranks[mode], prec)
        factors.append((mode, u))
        core = _fold(contracted, mode, core.shape)  # mode axis -> r_mode
    factors.sort(key=lambda t: t[0])
    return core, tuple(u for _, u in factors)


def tucker(
    a,
    ranks: Sequence[int],
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    precision: str = "highest",
):
    """Randomized Tucker: returns ``(core, factors)`` with
    ``core.shape == tuple(r_eff)`` and ``factors[i].shape ==
    (a.shape[i], r_eff[i])``, each factor orthonormal.  ``r_eff`` is
    ``ranks`` clipped to what each mode's unfolding can support: a
    mode's rank can never exceed min(n_i, product of the OTHER modes'
    dims as they stand when that mode is processed — earlier modes are
    already contracted to their ranks).  Over-asked ranks are therefore
    clipped deterministically, never silently padded; read the effective
    ranks off ``core.shape``.

    ``p``/``q``/``precision`` are the rSVD stage-A knobs (oversampling,
    power iterations, MXU pass count) applied per mode.
    """
    a = jnp.asarray(a)
    if len(ranks) != a.ndim:
        raise ValueError(f"need {a.ndim} ranks, got {len(ranks)}")
    # mirror _tucker_impl's processing order (decreasing size) so the
    # clip accounts for already-contracted modes shrinking the unfolding
    eff = [int(min(r, n)) for r, n in zip(ranks, a.shape)]
    cur = list(a.shape)
    for mode in sorted(range(a.ndim), key=lambda i: -a.shape[i]):
        rest = 1
        for j, s in enumerate(cur):
            if j != mode:
                rest *= s
        eff[mode] = min(eff[mode], rest)
        cur[mode] = eff[mode]
    return _tucker_impl(a, seed, tuple(eff), p, q, precision)


def tucker_reconstruct(core, factors, precision=_HI):
    """A ~ core x_1 U1 x_2 U2 ... x_d Ud."""
    out = core
    for mode, u in enumerate(factors):
        out = mode_dot(out, u, mode, precision)
    return out


def tucker_adaptive(
    a,
    tol: float,
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    rank_cap: Optional[Sequence[int]] = None,
):
    """Rank-adaptive ST-HOSVD: pick each mode's rank from the energy of
    the projected unfolding so the total relative error meets ``tol``
    (per-mode budget tol/sqrt(d), by the ST-HOSVD error split).

    Host-side rank decisions (one small spectrum fetch per mode), jitted
    device GEMMs for everything else.  Returns ``(core, factors, ranks)``.
    """
    import numpy as np

    a = jnp.asarray(a)
    d = a.ndim
    budget = float(tol) / np.sqrt(d)
    caps = tuple(rank_cap) if rank_cap is not None else a.shape
    core = a
    factors = [None] * d
    order = sorted(range(d), key=lambda i: -a.shape[i])
    for mode in order:
        unf = _unfold(core, mode)
        cap = int(min(caps[mode], min(unf.shape)))
        l = min(cap + p, min(unf.shape))
        q_mat, w, vecs, total = mode_spectrum(
            unf, seed + 7919 * mode, l, q)
        w = np.maximum(np.asarray(w, dtype=np.float64), 0.0)
        total = float(np.asarray(total, dtype=np.float64))
        resid = np.maximum(total - np.cumsum(w), 0.0)
        ok = np.nonzero(resid <= (budget * budget) * total)[0]
        r = min(int(ok[0]) + 1 if ok.size else cap, cap)
        u, contracted = mode_contract(unf, q_mat, vecs, r)
        factors[mode] = u
        core = _fold(contracted, mode, core.shape)
    return core, tuple(factors), tuple(f.shape[1] for f in factors)
