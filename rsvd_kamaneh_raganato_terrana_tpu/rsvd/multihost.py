"""Multi-host streaming rSVD: per-host memmap shards, DCN-light collectives.

Completes the scale-out story of :mod:`rsvd.streaming`: each host owns a
contiguous ROW SHARD of A as a host-resident array (ndarray / np.memmap /
:class:`SynthesizedMatrix`) and streams it through its own device(s);
nothing the size of A ever crosses the host boundary.  The only
cross-host traffic is what the algorithm fundamentally requires:

- l x l Gram matrices for the distributed CholeskyQR of the row-sharded
  basis (the reference's Gatherv->root->Bcast role for QR state,
  image_compression/src/QR.cpp:138-149, done as one all-reduce),
- the n x l co-range blocks Z = A^T Q of each power round,
- the l x n projection B = Q^T A,

each summed over hosts with a single collective on a one-device-per-
process mesh.  The streamed panel GEMMs are process-local jits, so hosts
with different shard sizes or panel counts stay in lockstep only at the
collectives (SPMD-safe: every process issues the same global ops in the
same order).

This is the TPU-native counterpart of the reference's row-partitioned
MPI pipeline (src/PM.cpp:31-68, SURVEY section 2.6 "row-sharded data
parallelism") at out-of-core scale: MPI rank -> host process, rank's row
block -> host memmap shard, Gatherv+Bcast -> all-reduce over DCN.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed
from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import (
    _chol_maybe_shifted,
    _gram,
    _solve_right_upper,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _PRECISIONS
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
    _default_panel_rows,
    _jit_qr,
    _stream_left_t_multiply,
    _stream_right_multiply,
    _tail_svd,
)


@lru_cache(maxsize=1)
def _procs_mesh() -> Mesh:
    """1-D mesh holding ONE device per process — the DCN 'procs' axis the
    cross-host reductions ride.  (The streamed local GEMMs use each
    process's default device; this mesh only carries l-sized traffic.)"""
    by_proc = {}
    for d in sorted(jax.devices(), key=lambda d: (d.process_index, d.id)):
        by_proc.setdefault(d.process_index, d)
    devs = np.asarray([by_proc[i] for i in sorted(by_proc)])
    return Mesh(devs, ("procs",))


@lru_cache(maxsize=4)
def _sum_over_procs(mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda t: jnp.sum(t, axis=0), out_shardings=rep)


@lru_cache(maxsize=4)
def _min_over_procs(mesh: Mesh):
    rep = NamedSharding(mesh, P())
    return jax.jit(lambda t: jnp.min(t, axis=0), out_shardings=rep)


def _global_min_scalar(x: int) -> int:
    """MIN of a per-process integer over all processes (collective —
    every process must call it; identity on single-process runs)."""
    if jax.process_count() == 1:
        return int(x)
    mesh = _procs_mesh()
    glob = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("procs")),
        np.asarray([[float(x)]], np.float64))
    return int(np.asarray(_min_over_procs(mesh)(glob))[0])


def _global_sum(x_local) -> np.ndarray:
    """Sum an identically-shaped per-process array over all processes.

    Every process MUST call this the same number of times in the same
    order (it is a collective).  Identity on single-process runs."""
    x_np = np.asarray(x_local)
    if jax.process_count() == 1:
        return x_np
    mesh = _procs_mesh()
    glob = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("procs")), x_np[None])
    return np.asarray(_sum_over_procs(mesh)(glob))


@partial(jax.jit, static_argnames=())
def _finish_chol_qr(y_local, g_global, m_global):
    """Local half of one distributed CholeskyQR pass: factor the summed
    Gram (shifted-retry guard, linalg/qr.py) and apply R^{-1} to the
    local row block as a GEMM."""
    c, _ = _chol_maybe_shifted(g_global, m_global)
    return _solve_right_upper(y_local, c.T)


def _cholqr2_distributed(y_local, m_global: int):
    """Distributed CholeskyQR2 of a row-sharded tall matrix: two rounds of
    (local Gram -> all-reduce -> replicated Cholesky -> local trsm-GEMM).
    The second pass restores O(eps) orthogonality exactly as in the
    in-core `robust_cholesky_qr2` (linalg/qr.py:118)."""
    q1 = _finish_chol_qr(y_local, jnp.asarray(
        _global_sum(_jit_gram(y_local)), y_local.dtype), m_global)
    return _finish_chol_qr(q1, jnp.asarray(
        _global_sum(_jit_gram(q1)), y_local.dtype), m_global)


_jit_gram = jax.jit(_gram)


@jax.jit
def _rowspace_tail(c_local, g, z_q):
    """One compiled program for the rowspace end-game (eager op-by-op
    would cost one relay round trip per primitive, CLAUDE.md rule):
    C = U diag(s) W^T with G = C^T C = W diag(s^2) W^T  =>  U = C W / s,
    V = Z_q W.  Columns whose Gram eigenvalue sits below the eps*lam_max
    noise floor (s below sqrt(eps)*s0 — the Gram squares the spectrum)
    are zeroed instead of normalizing noise, the Jacobi engines'
    convention.  The floor is scale-FREE (relative to lam_max, like
    incremental.py's cutoff): an absolute term would silently zero
    genuine directions whenever ||C|| < 1 (normalized data); only a
    finfo.tiny guard protects the all-zero-matrix corner."""
    dtype = c_local.dtype
    lam, w = jnp.linalg.eigh(g)          # ascending
    lam = jnp.maximum(lam[::-1], 0.0)
    w = w[:, ::-1]
    s = jnp.sqrt(lam)
    safe = jnp.maximum(s, jnp.finfo(dtype).tiny)
    u_local = jnp.matmul(c_local, w / safe[None, :],
                         precision=jax.lax.Precision.HIGHEST)
    live = lam > jnp.maximum(jnp.finfo(dtype).eps * lam[0],
                             jnp.finfo(dtype).tiny)
    u_local = jnp.where(live[None, :], u_local, 0.0)
    v = jnp.matmul(z_q, w, precision=jax.lax.Precision.HIGHEST)
    return u_local, s, v


def rsvd_streaming_multihost(
    a_local,
    k: int,
    p: int = 16,
    q: int = 2,
    method: SVDMethod | str = "eigh",
    panel_rows: Optional[int] = None,
    seed: int = 0,
    dtype=jnp.float32,
    precision: str | jax.lax.Precision = "highest",
    panel_dtype: Optional[str] = None,
    finish: str = "project",
    checkpoint_dir: Optional[str] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Rank-k rSVD of a matrix whose row shards live one-per-host.

    ``a_local``: THIS host's contiguous row block (m_local x n) as a
    host-resident array; different hosts may hold different row counts.
    Returns (U_local, s, V): U_local holds this host's rows of U
    (m_local x k); s and V are replicated on every host (deterministic —
    every host computes the identical replicated tail).
    ``panel_dtype`` ('bfloat16' | 'int8') compresses each host's local
    panel transfers (rsvd.streaming module docstring) — purely local, so
    hosts may even disagree on it without breaking SPMD order.
    ``finish='rowspace'`` (q >= 1) ends at the last co-range block and
    factors C = A Z_q directly: one fewer streamed pass per host AND one
    fewer cross-host all-reduce (the projection's n x l sum) — every
    process must pass the same value (it changes the collective order).
    ``checkpoint_dir`` enables pass-level resume: each host persists its
    per-stage state (under a process-indexed subdirectory — a shared
    filesystem is fine), and on restart the fleet agrees on the MINIMUM
    completed stage across hosts with one small all-reduce, so every
    process replays the same collective sequence (hosts that crashed
    later simply recompute their extra stages).  The stage-agreement
    all-reduce runs UNCONDITIONALLY on every multi-process run, so hosts
    that disagree on ``checkpoint_dir`` (some None, some set, some with
    an unreadable path) cannot desynchronize the collective order — a
    host without checkpoints simply reports stage 0 and the fleet
    restarts from the top.

    Single-process runs degrade to :func:`rsvd.streaming.rsvd_streaming`
    semantics (same passes, CholeskyQR2 basis).
    """
    method = SVDMethod.parse(method)
    prec = _PRECISIONS.get(precision, precision)
    m_local, n = a_local.shape
    m_global = int(_global_sum(np.asarray([m_local], np.float64))[0])
    l = min(k + p, min(m_global, n))
    if panel_rows is None:
        panel_rows = _default_panel_rows(m_local, n, dtype)

    # identical seed -> identical Omega on every host (shard-invariant,
    # the property the reference's mt19937(rd()+rank) lacked)
    key = key_from_seed(seed)
    omega = jax.random.normal(key, (n, l), dtype)

    if finish not in ("project", "rowspace"):
        raise ValueError(f"unknown finish {finish!r}")
    if finish == "rowspace" and q < 1:
        raise ValueError("finish='rowspace' needs q >= 1")

    rounds = q - 1 if finish == "rowspace" else q
    stages = (["q0"] + [f"round{i}" for i in range(rounds)]
              + (["zq_final", "c_final"] if finish == "rowspace"
                 else ["b_final"]))
    ckpt = None
    local_done = 0
    if checkpoint_dir is not None:
        import os

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
            _data_fingerprint,
            _StreamCheckpoint,
        )

        try:
            ckpt = _StreamCheckpoint(
                os.path.join(checkpoint_dir, f"host{jax.process_index()}"),
                {"m_global": m_global, "m_local": m_local, "n": n, "k": k,
                 "p": p, "q": q, "seed": seed,
                 "dtype": jnp.dtype(dtype).name, "precision": precision,
                 "panel_dtype": panel_dtype, "finish": finish,
                 "method": method.value,
                 "data": _data_fingerprint(a_local),
                 "procs": jax.process_count()})
        except OSError:
            # unwritable checkpoint path must not desynchronize the
            # fleet's collective order: degrade to no-checkpoint and
            # report stage 0 to the all-reduce below
            ckpt = None
        if ckpt is not None:
            for st in stages:
                if not ckpt.has(st):
                    break
                local_done += 1
    # resume from the MINIMUM completed stage across hosts: every
    # process must replay the identical collective sequence, so a host
    # that crashed later recomputes its extra stages (cheap: those loads
    # are local, the recompute is shared anyway).  UNCONDITIONAL on
    # multi-process runs (identity on one) — hosts that disagree on
    # checkpoint_dir still agree on the collective schedule.
    done = _global_min_scalar(local_done) if jax.process_count() > 1 \
        else local_done
    if ckpt is None:
        done = 0

    if done > 0:
        q_local = ckpt.load("q0")
    else:
        y_local = _stream_right_multiply(a_local, omega, panel_rows, dtype,
                                         prec, panel_dtype)
        q_local = _cholqr2_distributed(y_local, m_global)
        if ckpt:
            ckpt.save("q0", q_local)
    for i in range(rounds):
        if 1 + i < done:
            q_local = ckpt.load(f"round{i}")
            continue
        z = _global_sum(_stream_left_t_multiply(
            a_local, q_local, panel_rows, dtype, prec, panel_dtype))
        z_q, _ = _jit_qr(jnp.asarray(z, dtype), "robust")  # replicated
        y_local = _stream_right_multiply(a_local, z_q, panel_rows, dtype,
                                         prec, panel_dtype)
        q_local = _cholqr2_distributed(y_local, m_global)
        if ckpt:
            ckpt.save(f"round{i}", q_local)

    if finish == "rowspace":
        # final half-round: one all-reduced co-range block, replicated QR,
        # then the LAST streamed pass C = A Z_q; the l x l Gram of the
        # row-sharded C is the only remaining collective.
        if 1 + rounds < done:
            z_q = ckpt.load("zq_final")
        else:
            z = _global_sum(_stream_left_t_multiply(
                a_local, q_local, panel_rows, dtype, prec, panel_dtype))
            z_q, _ = _jit_qr(jnp.asarray(z, dtype), "robust")  # replicated
            if ckpt:
                ckpt.save("zq_final", z_q)
        if 2 + rounds < done:
            c_local = ckpt.load("c_final")
        else:
            c_local = _stream_right_multiply(a_local, z_q, panel_rows,
                                             dtype, prec, panel_dtype)
            if ckpt:
                ckpt.save("c_final", c_local)
        g = jnp.asarray(_global_sum(_jit_gram(c_local)), dtype)  # l x l
        u_local, s, v = _rowspace_tail(c_local, g, z_q)
        return u_local[:, :k], s[:k], v[:, :k]

    if 1 + rounds < done:
        b = ckpt.load("b_final")
    else:
        b = jnp.asarray(_global_sum(_stream_left_t_multiply(
            a_local, q_local, panel_rows, dtype, prec, panel_dtype)),
            dtype).T
        if ckpt:
            ckpt.save("b_final", b)
    u_local, s, v = _tail_svd(b, q_local, method.value)
    return u_local[:, :k], s[:k], v[:, :k]
