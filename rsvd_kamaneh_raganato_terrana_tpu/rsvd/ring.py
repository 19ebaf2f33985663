"""Ring-pipelined rSVD for bandwidth-limited (DCN / multi-host) meshes.

The standard sharded driver (rsvd on a row-sharded A) lets XLA insert
bulk collectives: the sketch all-gathers Omega, the Z pass all-reduces an
n x l partial — fine on ICI, expensive when the mesh axis crosses hosts.
This driver keeps every LARGE transfer neighbor-only:

  sketch   Y = A Omega       ring-rotated Omega row blocks (ppermute)
  Z pass   Z = A^T Q         ring reduce-scatter of Z's row panels
  QR       Gram + Cholesky   l x l psum only (l^2 elements — negligible)
  tail     l x n B           replicated small problem, reference-style

Per power round each device exchanges 2 n l / P elements with its ring
neighbors instead of participating in an n l all-reduce — the classic
ring-matmul bandwidth story (SURVEY section 2.6/2.7: the reference's
Gatherv-to-root + Bcast resynchronization, src/PM.cpp:60-68, done as
systolic neighbor traffic instead).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import (
    ROWS_AXIS,
    power_zt_ring,
    sketch_ring_pipelined,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import generate_omega


def rsvd_ring(
    mesh: Mesh,
    a,
    k: int = 0,
    p: int = 10,
    q: int = 2,
    method: SVDMethod | str = "eigh",
    qr_method: str = "robust",
    seed: int = 0,
    axis: str = ROWS_AXIS,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-k rSVD of a row-sharded A with ring-only large collectives.

    ``a`` must be (or will be placed) row-sharded over ``mesh``'s ``axis``;
    both m-sized and n-sized intermediates stay sharded throughout.  Same
    (U, s, V) contract as :func:`rsvd.driver.rsvd`; the sketch draw equals
    `generate_omega`'s (threefry is counter-based over global indices, so
    sharded generation is bit-identical to unsharded).
    """
    method = SVDMethod.parse(method)
    m, n = a.shape
    l = min(k + p if k > 0 else p, min(m, n))
    row_sh = NamedSharding(mesh, P(axis, None))
    a = jax.device_put(a, row_sh)
    omega = generate_omega(seed, n, l, a.dtype, sharding=row_sh)

    @jax.jit
    def run(a, omega):
        y = sketch_ring_pipelined(mesh, a, omega, axis)
        q_mat = orthonormal_basis(y, qr_method)
        for _ in range(q):
            z = power_zt_ring(mesh, a, q_mat, axis)
            z_q = orthonormal_basis(z, qr_method)
            y = sketch_ring_pipelined(mesh, a, z_q, axis)
            q_mat = orthonormal_basis(y, qr_method)
        b = power_zt_ring(mesh, a, q_mat, axis).T      # l x n, col-sharded
        u_t, s, v = small_svd(b, method)
        u = jnp.matmul(q_mat, u_t,
                       precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=a.dtype)
        if k > 0:
            return u[:, :k], s[:k], v[:, :k]
        return u, s, v

    return run(a, omega)
