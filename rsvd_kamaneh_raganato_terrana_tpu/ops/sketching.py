"""Sparse sign embeddings (CountSketch / OSNAP): apply S x in O(t m n).

A dense Gaussian sketch S (s x m) applied to x (m x n) costs an s*m*n
GEMM — with s ~ 4n that is ~4 m n^2, the same order as a direct QR of x.
A sparse sign embedding (Clarkson-Woodruff CountSketch; OSNAP with t > 1
nonzeros per row, Nelson-Nguyen 2013) has exactly t nonzeros (+-1/sqrt(t))
in each COLUMN of S, so S x is t scaled sign-flipped scatter-adds of x's
rows into s buckets: O(t m n) work, no n^2 factor — the asymptotically
right sketch when m >> n (tall least squares, streaming row reduction).

TPU shape: each hash round is one `segment_sum` (bucketed row reduction —
VPU/bandwidth work, not MXU), with bucket ids and signs generated from a
threefry key by GLOBAL row index, so the result is deterministic and
shard-count-invariant like every other sketch in this framework
(core/rng.py).  t=1 is classic CountSketch (needs s = Omega(n^2) for a
worst-case oblivious subspace embedding); the t=8 default makes s ~ 4n a
reliable subspace embedding in practice — the regime the preconditioned
solver (rsvd/lstsq.py kind='sparse') uses, where the final accuracy never
depends on embedding quality, only the iteration count does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed


@partial(jax.jit, static_argnames=("sketch_size", "nnz_per_row"))
def countsketch_apply(key_or_seed, x, sketch_size: int,
                      nnz_per_row: int = 8) -> jax.Array:
    """S x for a sparse sign embedding S (sketch_size x m) defined by the
    key; x: (m,) or (m, n).  ``nnz_per_row`` is OSNAP's t (nonzeros per
    column of S); t=1 is CountSketch.

    E[S^T S] = I, so E||S x||_F^2 = ||x||_F^2 for any fixed x, and for an
    orthonormal-column Q the spectrum of S Q concentrates around 1 —
    tests/test_sketching.py measures both.
    """
    key = key_from_seed(key_or_seed)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    m = x.shape[0]
    t = int(nnz_per_row)
    out = jnp.zeros((sketch_size,) + x.shape[1:], dtype=x.dtype)
    scale = jnp.asarray(1.0 / jnp.sqrt(float(t)), x.dtype)
    for j in range(t):
        kb, ks = jax.random.split(jax.random.fold_in(key, j))
        bucket = jax.random.randint(kb, (m,), 0, sketch_size)
        sign = jnp.where(jax.random.bernoulli(ks, 0.5, (m,)),
                         scale, -scale)
        out = out + jax.ops.segment_sum(sign[:, None] * x, bucket,
                                        num_segments=sketch_size)
    return out[:, 0] if squeeze else out
