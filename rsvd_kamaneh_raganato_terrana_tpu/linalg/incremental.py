"""Incremental (updatable) SVD — Brand's column-append algorithm.

The reference intended this feature: POD.cpp keeps ~340 lines of
commented-out incremental-SVD code (POD.cpp:464-799) that never ran.
This is the working TPU-native version: given a rank-r factorization
A ~= U diag(s) V^T, append new columns C and produce the factorization of
[A | C] without touching A again — O((m + n) r^2 + m r c) work, all GEMMs
plus one small SVD.

Used for streaming POD snapshot collection (append each new snapshot
batch) and embedding-table refresh in the retrieval role.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


def _mm(a, b):
    return jnp.matmul(a, b, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def svd_append_columns(
    u,
    s,
    v,
    c,
    rank: Optional[int] = None,
    method: SVDMethod | str = SVDMethod.GramEigh,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Update U diag(s) V^T (m x n, rank r) with new columns C (m x c).

    Returns (U', s', V') of shape (m x r'), (r',), ((n + c) x r') with
    r' = ``rank`` (default r + c, i.e. exact update).

    Brand (2002): with L = U^T C, H = C - U L, (Q_h, R_h) = qr(H),
        [A | C] = [U Q_h] K [[V, 0], [0, I]]^T,
        K = [[diag(s), L], [0, R_h]]  ((r+c) x (r+c), small),
    so one small dense SVD of K rotates the bases.
    """
    u = jnp.asarray(u)
    s = jnp.asarray(s)
    v = jnp.asarray(v)
    c = jnp.asarray(c, dtype=u.dtype)
    m, r = u.shape
    n = v.shape[0]
    cc = c.shape[1]

    l = _mm(u.T, c)                        # r x c
    h = c - _mm(u, l)                      # residual, m x c
    q_h, r_h = qr_reduced(h, "robust")     # m x c, c x c

    k = jnp.zeros((r + cc, r + cc), u.dtype)
    k = k.at[:r, :r].set(jnp.diag(s))
    k = k.at[:r, r:].set(l)
    k = k.at[r:, r:].set(r_h)

    # Whitening correction: sigma(K) equals sigma([A|C]) only if the side
    # factors W = [U Q_h] and M = blockdiag(V, I) are orthonormal.  Our
    # engines emit zero columns for null singular directions (static
    # shapes), which breaks that and would inflate the spectrum; correct
    # on the small side with Gram square roots:
    #   [A|C] = (W Gw^-1/2) (Gw^1/2 K Gm^1/2) (M Gm^-1/2)^T.
    w = jnp.concatenate([u, q_h], axis=1)                    # m x (r+c)
    gw = _mm(w.T, w)
    gv = _mm(v.T, v)
    gm = jnp.zeros_like(k)
    gm = gm.at[:r, :r].set(gv)
    gm = gm.at[r:, r:].set(jnp.eye(cc, dtype=k.dtype))
    gw_h, gw_ih = _spd_half_pinvhalf(gw)
    gm_h, gm_ih = _spd_half_pinvhalf(gm)
    k_corr = _mm(gw_h, _mm(k, gm_h))

    uk, sk, vk = small_svd(k_corr, method)
    uk = _mm(gw_ih, uk)
    vk = _mm(gm_ih, vk)

    u_new = _mm(w, uk)                                       # m x (r+c)
    v_top = _mm(v, vk[:r, :])                                # n x (r+c)
    v_bot = vk[r:, :]                                        # c x (r+c)
    v_new = jnp.concatenate([v_top, v_bot], axis=0)

    if rank is not None and rank < r + cc:
        u_new, sk, v_new = u_new[:, :rank], sk[:rank], v_new[:, :rank]
    return u_new, sk, v_new


def _spd_half_pinvhalf(g):
    """(G^1/2, G^+1/2) by eigh with relative zero-eigenvalue cutoff."""
    lam, q = jnp.linalg.eigh(g)
    lam = jnp.maximum(lam, 0.0)
    cutoff = jnp.max(lam) * jnp.finfo(g.dtype).eps * g.shape[-1]
    root = jnp.sqrt(lam)
    inv_root = jnp.where(lam > cutoff, 1.0 / jnp.maximum(root, 1e-300), 0.0)
    return (q * root[None, :]) @ q.T, (q * inv_root[None, :]) @ q.T


class IncrementalSVD:
    """Stateful wrapper: feed column batches, keep a rank-capped
    factorization (the streaming-POD use)."""

    def __init__(self, rank: int, method: SVDMethod | str = SVDMethod.GramEigh):
        self.rank = int(rank)
        self.method = method
        self.u = self.s = self.v = None

    def update(self, c) -> "IncrementalSVD":
        c = jnp.asarray(c)
        if self.u is None:
            u, s, v = small_svd(c, self.method)
            keep = min(self.rank, s.shape[0])
            self.u, self.s, self.v = u[:, :keep], s[:keep], v[:, :keep]
            return self
        self.u, self.s, self.v = svd_append_columns(
            self.u, self.s, self.v, c, rank=self.rank, method=self.method
        )
        return self

    @property
    def n_seen(self) -> int:
        return 0 if self.v is None else self.v.shape[0]

    def factors(self):
        return self.u, self.s, self.v
