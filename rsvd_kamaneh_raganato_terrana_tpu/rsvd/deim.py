"""Discrete Empirical Interpolation Method (DEIM / Q-DEIM).

Beyond-parity extension (no reference counterpart).  The reference's POD
pipeline (POD/ParametricDiffusion1D/src/AdvDiff1D_POD.cpp:438-537)
projects a LINEAR operator once, offline; a nonlinear term would have to
be reassembled in full-order space every time step, destroying the ROM
speedup.  DEIM (Chaturantabut & Sorensen 2010) fixes that: given an
orthonormal basis U (n x m) for the nonlinearity's snapshots, select m
interpolation rows P and approximate

    f  ~  U (P^T U)^{-1} P^T f,

so the online cost of the nonlinear term is m POINT evaluations of f
plus an (n x m) GEMV — independent of how expensive the full f is.

Index selection, TPU-native (both variants are single jitted programs
with static shapes — no data-dependent Python control flow):

- ``qdeim`` (default): column-pivoted-QR pivots of U^T (Drmac &
  Gugercin 2016, "QDEIM").  Reuses the framework's greedy sketch-space
  pivoting kernel (rsvd/interp.py::_greedy_pivots — a k-step
  ``fori_loop`` of rank-1 deflations); better ||(P^T U)^{-1}|| bounds
  than classic DEIM and one fused selection loop.
- ``deim``: the classic greedy (interpolate with the first j basis
  vectors, pick the row of max |residual| of vector j).  The growing
  j x j systems are expressed as masked m x m solves (identity-padded)
  so every iteration has the same static shape.

The ROM integration (offline/online split for the advection-diffusion-
reaction demo) lives in apps/rom.py::solve_rom_deim.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.interp import _greedy_pivots


def _classic_deim_indices(u):
    """Chaturantabut-Sorensen greedy: row of max |residual| per basis
    vector, residual from interpolating with the bases selected so far."""
    n, m = u.shape
    idx0 = jnp.zeros((m,), jnp.int32)
    idx0 = idx0.at[0].set(jnp.argmax(jnp.abs(u[:, 0])).astype(jnp.int32))
    if m == 1:
        return idx0
    eye = jnp.eye(m, dtype=u.dtype)
    ar = jnp.arange(m)

    def step(j, idx):
        sel = (ar < j)
        rows = jnp.take(u, idx, axis=0)              # m x m (rows >= j dummy)
        mat = jnp.where(sel[:, None] & sel[None, :], rows, eye)
        rhs = jnp.where(sel, jnp.take(rows, j, axis=1), 0.0)
        c = jnp.linalg.solve(mat, rhs)               # zero beyond row j
        r = jnp.take(u, j, axis=1) - u @ c
        return idx.at[j].set(jnp.argmax(jnp.abs(r)).astype(jnp.int32))

    return jax.lax.fori_loop(1, m, step, idx0)


@partial(jax.jit, static_argnames=("method",))
def deim_indices(u, method: str = "qdeim") -> jax.Array:
    """m interpolation row indices for the orthonormal basis ``u``
    (n x m).  ``method``: 'qdeim' (pivoted-QR selection, default) or
    'deim' (classic greedy)."""
    u = jnp.asarray(u)
    if method == "qdeim":
        return _greedy_pivots(u.T, u.shape[1])
    if method == "deim":
        return _classic_deim_indices(u)
    raise ValueError(f"unknown DEIM index method: {method!r}")


@jax.jit
def deim_projector(u, idx) -> jax.Array:
    """The oblique projector factor  U (P^T U)^{-1}  (n x m): interpolate
    a full vector f with ``proj @ f[idx]``."""
    u = jnp.asarray(u)
    pu = jnp.take(u, idx, axis=0)                    # m x m
    return jnp.linalg.solve(pu.T, u.T).T


class Deim(NamedTuple):
    """A fitted DEIM model: ``interpolate(f) = proj @ f[indices]``."""

    basis: jax.Array       # n x m orthonormal snapshot basis U
    indices: jax.Array     # int32[m] interpolation rows P
    proj: jax.Array        # n x m oblique projector U (P^T U)^{-1}


def deim_interpolate(d: Deim, f) -> jax.Array:
    """Interpolate full-order vector(s) ``f`` (n,) or (n, batch) from
    their values at the m DEIM rows."""
    return d.proj @ jnp.take(jnp.asarray(f), d.indices, axis=0)


@jax.jit
def deim_condition(u, idx) -> jax.Array:
    """||(P^T U)^{-1}||_2 = 1/sigma_min(P^T U) — the DEIM error
    amplification factor:  ||f - DEIM(f)|| <= cond * ||(I-UU^T) f||."""
    pu = jnp.take(jnp.asarray(u), idx, axis=0)
    s = jnp.linalg.svd(pu, compute_uv=False)
    return 1.0 / s[-1]


def deim_fit(
    snapshots,
    m: int,
    p: int = 10,
    q: int = 1,
    seed: int = 0,
    method: str = "qdeim",
) -> Deim:
    """Fit a DEIM model from nonlinearity snapshots (n x n_snap): rank-m
    rSVD basis (this framework's range finder — the snapshot count never
    touches the online cost), then index selection + projector."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

    snapshots = jnp.asarray(snapshots)
    u, _, _ = rsvd(snapshots, k=m, p=p, q=q, seed=seed, method="eigh")
    idx = deim_indices(u, method)
    return Deim(u, idx, deim_projector(u, idx))
