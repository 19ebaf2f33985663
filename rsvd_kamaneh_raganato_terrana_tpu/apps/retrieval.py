"""Embedding factorization + sharded top-k inner-product retrieval.

The BASELINE.json "recsys_embed" role for the rSVD engine: factor a large
(row-sharded) user x item interaction matrix into rank-k embedding tables
(U_k S_k for users, V_k for items), then serve top-k item retrieval as a
sharded inner-product lookup.  This is the production-serving shape of the
reference's factorization core — no reference-code counterpart exists, so
the design is TPU-native end to end:

- factorization: `rsvd` on the row-sharded interaction matrix (sketch and
  power-iteration GEMMs data-parallel over the mesh, replicated tail);
- retrieval: item embeddings sharded over the mesh, per-shard top-k on
  local scores, all-gather of the (k values, k global ids) per shard, and
  a final replicated top-k — the standard distributed top-k reduction,
  O(devices * k) gathered instead of the full score row.
"""

from __future__ import annotations


from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import ROWS_AXIS
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd


class EmbeddingTables(NamedTuple):
    users: jax.Array   # (n_users, k)  = U_k diag(S_k)
    items: jax.Array   # (n_items, k)  = V_k
    sigma: jax.Array   # (k,)


def factorize_interactions(
    a,
    k: int,
    p: int = 16,
    q: int = 2,
    method: str = "jacobi",
    seed: int = 0,
) -> EmbeddingTables:
    """Rank-k embedding tables with <users[u], items[i]> ~= A[u, i]
    (U S V^T split as (U S) V^T)."""
    u, s, v = rsvd(a, k=k, p=p, q=q, method=method, seed=seed)
    return EmbeddingTables(u * s[None, :], v, s)


def score(tables: EmbeddingTables, user_ids) -> jax.Array:
    """Dense score rows for a batch of users."""
    u = tables.users[user_ids]
    return jnp.matmul(u, tables.items.T, precision=DOT_PRECISION)


def top_k_items(tables: EmbeddingTables, user_ids, k: int) -> Tuple[jax.Array, jax.Array]:
    """Single-device top-k retrieval: (scores, item ids), both (batch, k)."""
    s = score(tables, user_ids)
    return jax.lax.top_k(s, k)


class QuantizedTables(NamedTuple):
    """int8 embedding tables with per-row scales: 4x memory cut for the
    serving path; scores computed in int8->int32 on the MXU then rescaled.
    """

    users_q: jax.Array     # (n_users, k) int8
    users_scale: jax.Array # (n_users,)
    items_q: jax.Array     # (n_items, k) int8
    items_scale: jax.Array # (n_items,)


def quantize_tables(tables: EmbeddingTables) -> QuantizedTables:
    """Symmetric per-row int8 quantization of both embedding tables."""

    def quant(x):
        scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-30) / 127.0
        q = jnp.clip(jnp.round(x / scale[:, None]), -127, 127).astype(jnp.int8)
        return q, scale.astype(jnp.float32)

    uq, us = quant(tables.users)
    iq, is_ = quant(tables.items)
    return QuantizedTables(uq, us, iq, is_)


def score_quantized(qt: QuantizedTables, user_ids) -> jax.Array:
    """Score rows from int8 tables: int32 MXU dot + per-row rescale.
    Accepts scalar or batched ids, like `score`."""
    scalar = jnp.ndim(user_ids) == 0
    ids = jnp.atleast_1d(jnp.asarray(user_ids))
    uq = qt.users_q[ids]
    # contract dim 1 of both operands: no transposed copy of the item table
    raw = jax.lax.dot_general(
        uq, qt.items_q,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = (raw.astype(jnp.float32)
           * qt.users_scale[ids][:, None]
           * qt.items_scale[None, :])
    return out[0] if scalar else out


def top_k_items_quantized(qt: QuantizedTables, user_ids, k: int):
    """Top-k retrieval from the quantized tables."""
    return jax.lax.top_k(score_quantized(qt, user_ids), k)


def top_k_items_sharded(
    mesh: Mesh,
    tables: EmbeddingTables,
    user_batch,
    k: int,
    axis: str = ROWS_AXIS,
) -> Tuple[jax.Array, jax.Array]:
    """Distributed retrieval: items sharded over ``axis``; each shard
    computes local scores + local top-k with *global* item ids, the
    (value, id) pairs are all-gathered (devices * k per user instead of
    n_items), and a final top-k runs replicated.

    ``user_batch`` is the (batch, k_emb) slice of user embeddings (already
    gathered/replicated — the query side of serving)."""
    n_items = tables.items.shape[0]
    n_dev = mesh.devices.size

    def local(items_blk, users_rep):
        idx = jax.lax.axis_index(axis)
        blk = items_blk.shape[0]
        scores = jnp.matmul(users_rep, items_blk.T, precision=DOT_PRECISION)
        vals, ids = jax.lax.top_k(scores, min(k, blk))
        global_ids = ids + idx * blk
        all_vals = jax.lax.all_gather(vals, axis, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(global_ids, axis, axis=1, tiled=True)
        final_vals, pos = jax.lax.top_k(all_vals, k)
        final_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        return final_vals, final_ids

    if n_items % n_dev:
        raise ValueError(
            f"n_items={n_items} must divide over {n_dev} devices "
            "(pad the item table)"
        )
    # check_vma=False: the outputs are replicated by construction (final
    # top-k runs on all-gathered data) but the checker can't infer it.
    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(tables.items, user_batch)
