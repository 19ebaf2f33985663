"""Deterministic, shard-count-invariant random number generation.

The reference seeds each MPI rank nondeterministically with
``mt19937(rd() + rank)`` when generating the Gaussian sketch matrix Omega
(src/rSVD.cpp:26-37), so results change run to run and with the process
count.  Here Omega is a pure function of a single `jax.random` key and the
*global* matrix indices: the value is identical however the array is sharded,
which is what makes the 1-chip / N-chip parity tests in tests/ meaningful.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def key_from_seed(seed: int | jax.Array) -> jax.Array:
    """Accept an int seed, a new-style typed PRNG key, or a raw uint32
    (2,) key (what jax.random.PRNGKey returns under the default impl)."""
    if isinstance(seed, jax.Array):
        if jnp.issubdtype(seed.dtype, jax.dtypes.prng_key):
            return seed  # new-style typed key
        if seed.ndim == 1 and seed.dtype == jnp.uint32:
            return seed  # raw threefry key data
    return jax.random.PRNGKey(seed)


def gaussian(key: jax.Array, shape, dtype=jnp.float32, sharding=None) -> jax.Array:
    """Standard-normal matrix, optionally produced directly with ``sharding``.

    `jax.random.normal` with the threefry PRNG is value-deterministic in the
    global index space, so XLA can partition generation across devices without
    changing the result — the property the reference's
    Gatherv-then-Bcast Omega assembly (src/rSVD.cpp:49-52) was approximating.
    """
    if sharding is not None:
        return jax.jit(
            lambda k: jax.random.normal(k, shape, dtype),
            out_shardings=sharding,
        )(key)
    return jax.random.normal(key, shape, dtype)


def fold_in_shard(key: jax.Array, shard_index) -> jax.Array:
    """Per-shard independent stream (for tile-parallel apps where each tile
    legitimately wants its own stream, like the per-rank RNG in
    image_compression/src/rSVD.cpp:89-101 — but deterministic)."""
    return jax.random.fold_in(key, shard_index)


def rademacher(key: jax.Array, shape, dtype=jnp.float32) -> jax.Array:
    """Rademacher +-1 sketch — cheaper than Gaussian on the VPU, same
    subspace-embedding guarantees for rSVD; offered as an alternative
    ``sketch='rademacher'`` (no reference counterpart)."""
    bits = jax.random.bernoulli(key, 0.5, shape)
    return jnp.where(bits, jnp.asarray(1, dtype), jnp.asarray(-1, dtype))


def sketch_matrix(
    key: jax.Array,
    n: int,
    l: int,
    dtype=jnp.float32,
    kind: str = "gaussian",
    sharding=None,
) -> jax.Array:
    """The n x l random test matrix Omega of rSVD stage A
    (reference generateOmega, src/rSVD.cpp:12-55)."""
    if kind == "gaussian":
        return gaussian(key, (n, l), dtype, sharding)
    if kind == "rademacher":
        return rademacher(key, (n, l), dtype)
    raise ValueError(f"unknown sketch kind {kind!r}")
