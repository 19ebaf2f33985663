"""Sharded primitive operations.

TPU-native re-design of the reference's L1 "communication + ops" layer and
its MPI primitive gallery (src/matrixOperations.cpp, src/PM.cpp matvec core,
image_compression/mpi/{mpi_mat_gen, mpi_mat_vec_mult, mpi_mat_mat_mult,
mpi_norm, mpi_normalize, mpi_transpose}.cpp).

Two API styles:

1.  *Implicit* (preferred): functions take arrays carrying `NamedSharding`s
    and run ordinary `jnp` ops under `jit`; XLA's SPMD partitioner inserts
    the collectives (all-gather / reduce-scatter / psum over ICI) that the
    reference hand-wrote as Gatherv -> root-op -> Bcast.

2.  *Explicit* (`shard_map`): ``*_sharded`` variants spell the collectives
    out with `jax.lax.psum`/`all_gather`.  These exist to pin down and test
    the communication contracts — the role of the reference's mpi/ gallery —
    and to serve as building blocks where manual placement beats the
    partitioner.

All results are mathematically identical on 1 or N devices (tested on a
virtual 8-device CPU mesh in tests/test_ops.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import ROWS_AXIS

# On TPU, f32 dots default to bf16 passes through the MXU; linear-algebra
# accuracy (QR/Gram conditioning) needs full f32 accumulation.
DOT_PRECISION = jax.lax.Precision.HIGHEST


def matmul(a, b):
    """C = A @ B.  Reference: manualMatrixMultiply (src/matrixOperations.cpp:
    7-28) and its MPI version (image_compression/src/matrixOperations.cpp:
    14-74).  With a row-sharded ``a`` this is a local GEMM per shard; with a
    col-sharded ``a`` and row-sharded ``b`` XLA inserts a reduce-scatter —
    no hand-written communication."""
    return jnp.matmul(a, b, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def matvec(a, x):
    """y = A @ x (reference mpi_mat_vec_mult.cpp:33-64, PM.cpp:44-49)."""
    return jnp.matmul(a, x, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def frobenius_norm(a):
    """||A||_F via global sum of squares (reference mpi_norm.cpp:33-83 did
    partial sums + Gatherv; here a single psum-fused reduction)."""
    return jnp.sqrt(jnp.sum(jnp.square(a)))


def normalize(x, eps=0.0):
    """x / ||x||_2 (reference mpi_normalize.cpp:33-126, PM.cpp:62-65)."""
    return x / (jnp.linalg.norm(x) + eps)


def transpose(a):
    """A^T — a sharding permutation on TPU (reference mpi_transpose.cpp
    rebuilt the transpose through Gatherv on the host)."""
    return jnp.swapaxes(a, -1, -2)


def gram(a):
    """G = A^T A — the rSVD/PM workhorse.  For row-sharded A this is a
    per-shard k x k GEMM followed by a psum (XLA-inserted), the pattern the
    reference approximated with per-rank partial products."""
    return jnp.matmul(transpose(a), a, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


# ---------------------------------------------------------------------------
# Explicit shard_map variants (communication contracts spelled out).
# ---------------------------------------------------------------------------


def _row_specs(axis):
    return P(axis, None)


def matvec_sharded(mesh: Mesh, a, x, axis: str = ROWS_AXIS):
    """Row-sharded mat-vec with an explicit all-gather of the result —
    the reference's Gatherv+Bcast pair (PM.cpp:60-68) fused into one
    collective; every shard ends up with the full y (replicated out-spec).
    """

    def local(a_blk, x_rep):
        y_blk = jnp.matmul(a_blk, x_rep, precision=DOT_PRECISION)
        return jax.lax.all_gather(y_blk, axis, axis=0, tiled=True)

    # check_vma=False: the all-gathered result is replicated by
    # construction but the varying-mesh-axes checker can't infer it.
    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis), P()), out_specs=P(),
        check_vma=False,
    )(a, x)


def matmul_sharded(mesh: Mesh, a, b, axis: str = ROWS_AXIS):
    """Row-sharded GEMM: local block GEMM, result stays row-sharded (the
    reference gathered C to rank 0, image matrixOperations.cpp:64-74 — we
    keep it distributed, which is the point of SPMD)."""

    def local(a_blk, b_rep):
        return jnp.matmul(a_blk, b_rep, precision=DOT_PRECISION)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis), P()),
        out_specs=_row_specs(axis),
    )(a, b)


def norm_sharded(mesh: Mesh, a, axis: str = ROWS_AXIS):
    """Frobenius norm via local sum-of-squares + psum (mpi_norm.cpp)."""

    def local(a_blk):
        return jnp.sqrt(jax.lax.psum(jnp.sum(jnp.square(a_blk)), axis))

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis),), out_specs=P()
    )(a)


def normalize_sharded(mesh: Mesh, x, axis: str = ROWS_AXIS):
    """Normalize a row-sharded vector in place: psum for the norm, local
    scale — no gather/scatter round-trip (mpi_normalize.cpp did gather,
    normalize on root, re-scatter)."""

    def local(x_blk):
        nrm = jnp.sqrt(jax.lax.psum(jnp.sum(jnp.square(x_blk)), axis))
        return x_blk / nrm

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis)
    )(x)


def transpose_sharded(mesh: Mesh, a, axis: str = ROWS_AXIS):
    """Row-sharded A -> row-sharded A^T using all_to_all over ICI
    (mpi_transpose.cpp gathered everything to root instead)."""

    def local(a_blk):
        n_dev = jax.lax.axis_size(axis)
        rows, cols = a_blk.shape  # rows = m/n_dev, cols = n
        blocks = a_blk.reshape(rows, n_dev, cols // n_dev).swapaxes(0, 1)
        swapped = jax.lax.all_to_all(blocks, axis, split_axis=0, concat_axis=0)
        # swapped[d] is device d's (rows x cols/n_dev) strip of our columns.
        return jnp.concatenate([s.T for s in swapped], axis=1)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis),),
        out_specs=_row_specs(axis),
    )(a)


def gram_sharded(mesh: Mesh, a, axis: str = ROWS_AXIS):
    """A^T A with the reduction spelled out: local k x k Gram + psum."""

    def local(a_blk):
        g = jnp.matmul(a_blk.T, a_blk, precision=DOT_PRECISION)
        return jax.lax.psum(g, axis)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis),), out_specs=P()
    )(a)


def matmul_reduce_scatter(mesh: Mesh, a, b, axis: str = ROWS_AXIS):
    """C = A @ B with A column-sharded and B row-sharded over ``axis``:
    each device holds a partial full-size product; the sum is
    reduce-scattered so C comes back row-sharded — the collective the
    reference's Gatherv-to-root matmul could not express (everything
    landed on rank 0, image matrixOperations.cpp:64-74)."""

    def local(a_blk, b_blk):
        partial_c = jnp.matmul(a_blk, b_blk, precision=DOT_PRECISION)
        return jax.lax.psum_scatter(partial_c, axis, scatter_dimension=0,
                                    tiled=True)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(None, axis), _row_specs(axis)),
        out_specs=_row_specs(axis),
    )(a, b)


def ring_shift_rows(mesh: Mesh, a, shift: int = 1, axis: str = ROWS_AXIS):
    """Cyclically move row shards ``shift`` devices around the ring with
    `ppermute` — the halo-exchange / ring-pipeline building block
    (ICI-neighbor traffic; no reference counterpart, MPI would use
    Sendrecv)."""

    def local(a_blk):
        n = jax.lax.axis_size(axis)
        perm = [(i, (i + shift) % n) for i in range(n)]
        return jax.lax.ppermute(a_blk, axis, perm)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis),),
        out_specs=_row_specs(axis),
    )(a)


def generate_gaussian_sharded(mesh: Mesh, key, shape, dtype=jnp.float32,
                              axis: str = ROWS_AXIS):
    """Row-sharded Gaussian generation (mpi_mat_gen.cpp:14-54) — each shard
    generates only its rows, values identical to the unsharded draw because
    threefry is counter-based over global indices."""
    out_sh = NamedSharding(mesh, _row_specs(axis))
    return jax.jit(
        lambda k: jax.random.normal(k, shape, dtype), out_shardings=out_sh
    )(key)


def sketch_ring_pipelined(mesh: Mesh, a, omega, axis: str = ROWS_AXIS):
    """Y = A @ Omega with BOTH operands row-sharded — the ring-pipelined
    sketch for bandwidth-limited (DCN) meshes.

    A is (m, n) row-sharded and Omega (n, l) row-sharded over ``axis``.
    Instead of all-gathering Omega (the XLA default for a sharded-sharded
    dot, and the reference's Gatherv+Bcast assembly, src/rSVD.cpp:49-52),
    Omega's row blocks rotate around the device ring with `ppermute` while
    every device multiplies the matching column slice of its local A rows:
    per step each device sends/receives only n*l/P elements to its ICI/DCN
    neighbor, and the transfer overlaps the local GEMM — classic ring
    matmul (compute-communicate overlap, SURVEY section 2.6 scale-out
    role).  Returns Y (m, l) row-sharded like A.
    """
    n_dev = 1
    for nme, s in zip(mesh.axis_names, mesh.devices.shape):
        if nme == axis:
            n_dev *= s
    n = a.shape[1]
    if n % n_dev:
        raise ValueError(f"cols={n} not divisible by {n_dev} ring devices")
    n_per = n // n_dev

    def local(a_blk, om_blk):
        p = jax.lax.axis_index(axis)
        perm = [(i, (i - 1) % n_dev) for i in range(n_dev)]

        def col_panel(step):
            # after `step` rotations device p holds the block that started
            # at device (p + step) mod P, i.e. A's column panel j
            j = (p + step) % n_dev
            start = (j * n_per).astype(jnp.int32)
            return jax.lax.dynamic_slice(
                a_blk, (jnp.int32(0), start), (a_blk.shape[0], n_per))

        def body(step, carry):
            y, om = carry
            y = y + jnp.matmul(col_panel(step), om, precision=DOT_PRECISION)
            om = jax.lax.ppermute(om, axis, perm)
            return y, om

        y0 = jnp.zeros((a_blk.shape[0], om_blk.shape[1]), a_blk.dtype)
        # the accumulator is device-varying from step 1 on; mark it so the
        # loop carry type is stable under shard_map's varying-axis check
        y0 = jax.lax.pvary(y0, (axis,))
        # n_dev - 1 rotations suffice: the last block is multiplied after
        # the loop with no trailing ppermute (it would only feed a
        # discarded carry — pure wasted ring traffic)
        y, om = jax.lax.fori_loop(0, n_dev - 1, body, (y0, om_blk))
        y = y + jnp.matmul(col_panel(n_dev - 1), om, precision=DOT_PRECISION)
        return y

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis), _row_specs(axis)),
        out_specs=_row_specs(axis),
    )(a, omega)


def power_zt_ring(mesh: Mesh, a, q_mat, axis: str = ROWS_AXIS):
    """Z = A^T @ Q as a ring reduce-scatter — the power-iteration Z pass
    companion of :func:`sketch_ring_pipelined` for bandwidth-limited
    (DCN) meshes.

    A (m, n) and Q (m, l) are row-sharded over ``axis``; Z (n, l) comes
    back row-sharded.  Every device owns the full partial contribution
    A_blk^T Q_blk (n x l) mathematically, but instead of a psum /
    psum_scatter over the whole n x l block (one bulk collective, the
    XLA default), the partial sums for successive n/P row panels of Z
    rotate around the device ring: per step each device adds its local
    panel GEMM into the accumulator it just received and forwards it —
    n*l/P elements per hop, overlapping the next panel's GEMM.  After
    P-1 hops the accumulator for panel j lands fully reduced on device j.
    Replaces the reference's Gatherv-to-root + Bcast resynchronization
    (src/PM.cpp:60-68) with neighbor-only traffic.
    """
    n_dev = 1
    for nme, s in zip(mesh.axis_names, mesh.devices.shape):
        if nme == axis:
            n_dev *= s
    n = a.shape[1]
    if n % n_dev:
        raise ValueError(f"cols={n} not divisible by {n_dev} ring devices")
    n_per = n // n_dev

    def local(a_blk, q_blk):
        p = jax.lax.axis_index(axis)
        # forward ring: the accumulator born on device j+1 (panel j) hops
        # p0+1, ..., and lands on device j after P-1 steps, fully reduced
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

        def partial_panel(step):
            # at step s device p contributes to panel (p - s - 1) mod P
            j = (p - step - 1) % n_dev
            start = (j * n_per).astype(jnp.int32)
            cols = jax.lax.dynamic_slice(
                a_blk, (jnp.int32(0), start), (a_blk.shape[0], n_per))
            return jnp.matmul(cols.T, q_blk, precision=DOT_PRECISION)

        def body(step, acc):
            acc = jax.lax.ppermute(acc, axis, perm)
            return acc + partial_panel(step)

        acc0 = partial_panel(0)
        return jax.lax.fori_loop(1, n_dev, body, acc0)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(_row_specs(axis), _row_specs(axis)),
        out_specs=_row_specs(axis),
    )(a, q_mat)
