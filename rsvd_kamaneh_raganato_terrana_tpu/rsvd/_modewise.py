"""Shared sketched-unfolding machinery for the tensor decompositions.

Both Tucker/ST-HOSVD (rsvd/tucker.py) and TT-SVD (rsvd/tt.py) repeat the
same per-mode move: sketch the current unfolding with the rSVD range
finder, tighten the oversampled basis to exactly r directions via the
projected Gram's eigenvectors, and contract the factor into the
remainder.  This module is the single home for that sequence — fixing
precision/clamping here fixes every tensor format at once.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _mm,
    generate_omega,
    subspace_iteration,
)


def tighten_contract(unf, q_mat, r: int, prec):
    """Inside-jit (traced) form: given the range basis Q of an unfolding,
    return (U: m x r, U^T unf) with U the top-r projected directions —
    descending eigenvectors of (Q^T unf)(Q^T unf)^T mapped back through
    Q."""
    b = _mm(q_mat.T, unf, prec)
    g = _mm(b, b.T, DOT_PRECISION)
    _, vecs = jnp.linalg.eigh(0.5 * (g + g.T))
    u = _mm(q_mat, vecs[:, ::-1][:, :r])
    return u, _mm(u.T, unf, prec)


# jitted per-mode pieces for the tolerance-adaptive variants: eager
# op-by-op dispatch costs ~30-80 ms per primitive through a relay
# transport (CLAUDE.md rule); rank decisions happen host-side between
# these two dispatches.
@partial(jax.jit, static_argnames=("l", "q"))
def mode_spectrum(unf, seed, l: int, q: int):
    """Sketch one unfolding and return (Q, descending projected-Gram
    eigenvalues, descending eigenvectors, total energy ||unf||_F^2)."""
    omega = generate_omega(seed, unf.shape[1], l, unf.dtype)
    q_mat = subspace_iteration(unf, omega, q)
    b = _mm(q_mat.T, unf, DOT_PRECISION)
    g = _mm(b, b.T, DOT_PRECISION)
    w, vecs = jnp.linalg.eigh(0.5 * (g + g.T))
    return q_mat, w[::-1], vecs[:, ::-1], jnp.sum(jnp.square(unf))


@partial(jax.jit, static_argnames=("r",))
def mode_contract(unf, q_mat, vecs, r: int):
    """Materialize the rank-r factor and the contracted remainder."""
    u = _mm(q_mat, vecs[:, :r])
    return u, _mm(u.T, unf, DOT_PRECISION)
