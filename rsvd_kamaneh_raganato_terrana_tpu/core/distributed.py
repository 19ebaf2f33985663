"""Multi-host / multi-slice initialization helpers.

The reference ran `mpirun -np P` on one machine; the TPU counterpart of
"more ranks" is more chips (ICI within a slice) and more hosts (DCN across
slices).  This module is the thin host-side glue:

- `initialize()` wraps `jax.distributed.initialize` (one call per host
  process; coordinator discovery via env or explicit args).
- `make_pod_mesh()` builds a hybrid mesh with a DCN outer axis and an ICI
  inner axis, so a row sharding `P(('dcn_rows', 'rows'), None)` keeps the
  heavy all-reduces of the rSVD pipeline on ICI and only the small l x l
  reductions cross DCN.

Single-host environments (including this repo's CI) get the same API with
a trivial mesh, so calling code is identical at every scale.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import ROWS_AXIS, make_mesh

DCN_AXIS = "dcn_rows"


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the JAX distributed runtime.

    MUST be called before any other JAX operation (jax.distributed's own
    contract: it fails once the XLA backend is up, so this function never
    touches the backend itself — no jax.process_count() probing).
    No-op when neither arguments nor JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES env vars indicate a multi-process launch, and
    tolerant of a launcher having already initialized the runtime."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None and \
            os.environ.get("JAX_NUM_PROCESSES") is None:
        return  # single host
    try:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        if "already" in str(e).lower():
            return  # launcher pre-initialized the runtime
        raise


def make_pod_mesh(ici_axis: str = ROWS_AXIS, dcn_axis: str = DCN_AXIS) -> Mesh:
    """Hybrid (DCN x ICI) 1-D row mesh over all devices of all hosts.

    On one host this degenerates to the plain `make_mesh()`.  On a
    multi-host pod it uses `mesh_utils.create_hybrid_device_mesh` so the
    inner axis is ICI-contiguous; shard matrices with
    ``P((dcn_axis, ici_axis), None)`` to keep bandwidth-heavy collectives
    on ICI.
    """
    n_proc = jax.process_count()
    if n_proc <= 1:
        return make_mesh(axis_names=(ici_axis,))
    per_host = len(jax.devices()) // n_proc
    try:
        from jax.experimental import mesh_utils

        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(per_host,),
            dcn_mesh_shape=(n_proc,),
        )
        dev_arr = np.asarray(devices).reshape(n_proc, per_host)
    except Exception as e:
        if jax.devices()[0].platform == "tpu":
            # On a real pod a failed hybrid mesh must be loud: the
            # process-sorted fallback silently loses ICI-topology
            # ordering within each host (cross-chip bandwidth hit).
            raise
        # backends without slice metadata (the multi-process CPU
        # harness): group devices by owning process, which preserves the
        # "inner axis stays intra-host" property the hybrid helper gives
        # on TPU pods
        import warnings

        warnings.warn(
            f"create_hybrid_device_mesh unavailable ({e!r}); using "
            "process-sorted device layout", RuntimeWarning, stacklevel=2)
        devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
        dev_arr = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(dev_arr, (dcn_axis, ici_axis))


def row_spec_for(mesh: Mesh):
    """PartitionSpec sharding matrix rows over every axis of ``mesh``
    (works for both the single-host and hybrid meshes)."""
    from jax.sharding import PartitionSpec as P

    return P(tuple(mesh.axis_names), None)
