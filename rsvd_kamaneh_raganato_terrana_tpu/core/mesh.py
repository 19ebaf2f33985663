"""Device mesh and sharding helpers.

The reference parallelizes by block-partitioning matrix rows over MPI ranks
(src/PM.cpp:31-35, src/rSVD.cpp:20-23) and by splitting images into a
sqrt(P) x sqrt(P) grid of independent blocks
(image_compression/src/image_com.cpp:351-403).  The TPU-native counterparts
are a 1-D ``('rows',)`` mesh with `NamedSharding` row sharding (XLA inserts
all-gather/reduce-scatter over ICI where the reference used Gatherv+Bcast)
and a 2-D ``('bx', 'by')`` tile mesh driven through ``shard_map``.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROWS_AXIS = "rows"
COLS_AXIS = "cols"
TILE_AXES = ("bx", "by")


def make_mesh(
    shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (ROWS_AXIS,),
    devices=None,
) -> Mesh:
    """Build a device mesh.

    With no arguments, returns a 1-D mesh named ``rows`` over all local
    devices — the direct analogue of the reference's ``MPI_COMM_WORLD``
    row-partition (src/PM.cpp:7-9).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    if math.prod(shape) != devices.size:
        raise ValueError(
            f"mesh shape {tuple(shape)} does not cover {devices.size} devices"
        )
    return Mesh(devices.reshape(tuple(shape)), tuple(axis_names))


def make_tile_mesh(devices=None) -> Mesh:
    """2-D mesh for independent-tile parallelism.

    The analogue of the reference's square-process-count image block grid
    (image_compression/src/image_com.cpp:333-337); unlike the reference we
    fall back to a P x 1 grid when P is not a perfect square instead of
    aborting.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    side = int(math.isqrt(n))
    if side * side == n:
        shape = (side, side)
    else:
        shape = (n, 1)
    return make_mesh(shape, TILE_AXES, devices)


def row_sharding(mesh: Mesh, axis: str = ROWS_AXIS) -> NamedSharding:
    """Sharding that block-partitions dim 0 of a matrix over ``axis``."""
    return NamedSharding(mesh, P(axis, None))


def col_sharding(mesh: Mesh, axis: str = ROWS_AXIS) -> NamedSharding:
    """Sharding that block-partitions dim 1 of a matrix over ``axis``."""
    return NamedSharding(mesh, P(None, axis))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully-replicated sharding (the reference's post-Bcast state)."""
    return NamedSharding(mesh, P())


def shard_rows(x, mesh: Mesh, axis: str = ROWS_AXIS):
    """Place ``x`` row-sharded on ``mesh``.

    The sharded dimension must divide the device count (JAX contract);
    for remainder shapes — the reference's rows_per_proc/rows_remainder
    idiom (src/PM.cpp:31-35) — zero-pad first with `pad_rows_for_mesh`
    (transparent for Gram/matmul/norm reductions) and slice results back.
    """
    n_dev = int(np.prod([s for n, s in zip(mesh.axis_names, mesh.devices.shape) if n == axis]))
    if x.shape[0] % max(n_dev, 1):
        raise ValueError(
            f"rows={x.shape[0]} not divisible by {n_dev} devices on axis "
            f"{axis!r}; use pad_rows_for_mesh(x, mesh) first"
        )
    return jax.device_put(x, row_sharding(mesh, axis))


def pad_rows_for_mesh(x, mesh: Mesh, axis: str = ROWS_AXIS):
    """Zero-pad dim 0 up to a multiple of the axis device count.
    Returns (padded, original_rows)."""
    import jax.numpy as jnp

    n_dev = int(np.prod([s for n, s in zip(mesh.axis_names, mesh.devices.shape) if n == axis]))
    rows = x.shape[0]
    pad = (-rows) % max(n_dev, 1)
    if pad == 0:
        return x, rows
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths), rows


def replicate(x, mesh: Mesh):
    return jax.device_put(x, replicated(mesh))


def local_mesh_or_none() -> Optional[Mesh]:
    """A best-effort default mesh over all local devices (None if 1 device)."""
    devs = jax.devices()
    if len(devs) <= 1:
        return None
    return make_mesh(devices=devs)
