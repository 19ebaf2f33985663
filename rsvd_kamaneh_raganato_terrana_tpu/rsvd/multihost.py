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
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    _PRECISIONS,
    _fold_weights,
)
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
    local row block as a GEMM.  Returns (Q_local, R) — R replicated."""
    c, _ = _chol_maybe_shifted(g_global, m_global)
    return _solve_right_upper(y_local, c.T), c.T


def _cholqr2_distributed(y_local, m_global: int):
    """Distributed CholeskyQR2 of a row-sharded tall matrix: two rounds of
    (local Gram -> all-reduce -> replicated Cholesky -> local trsm-GEMM).
    The second pass restores O(eps) orthogonality exactly as in the
    in-core `robust_cholesky_qr2` (linalg/qr.py:118)."""
    return _cholqr_distributed_r(y_local, m_global, passes=2)[0]


def _cholqr_distributed_r(y_local, m_global: int, passes: int = 2):
    """Distributed CholeskyQR returning BOTH factors: (Q_local, R) with
    R = R_2 R_1 replicated.  ``passes=1`` is the serving-depth variant
    (cholqr1's contract: one collective, O(eps cond^2) orthogonality)."""
    q_local, r = _finish_chol_qr(y_local, jnp.asarray(
        _global_sum(_jit_gram(y_local)), y_local.dtype), m_global)
    for _ in range(passes - 1):
        q_local, r2 = _finish_chol_qr(q_local, jnp.asarray(
            _global_sum(_jit_gram(q_local)), y_local.dtype), m_global)
        r = jnp.matmul(r2, r, precision=jax.lax.Precision.HIGHEST)
    return q_local, r


_jit_gram = jax.jit(_gram)


@jax.jit
def _utv_fold_local(factor_local, tri):
    """Local half of a UTV serving tail: fold the replicated triangular
    (or general) middle factor into weights and the local row block of U
    (rsvd.driver finish='utv' contract — s are decomposition weights,
    U_local unit-column once assembled over hosts)."""
    s, safe = _fold_weights(tri)
    u_local = jnp.matmul(factor_local, tri / safe[None, :],
                         precision=jax.lax.Precision.HIGHEST)
    order = jnp.argsort(-s)
    return u_local[:, order], s[order], order


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
    qr_method: str = "robust",
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
    ``finish='utv'`` / ``'rowspace_utv'`` are the serving tails out of
    core AND across hosts: same streamed passes and collectives as
    'project' / 'rowspace' respectively (the UTV fold replaces the
    replicated eigh/SVD tail with a thin QR — no extra cross-host
    traffic), with the in-core honesty gates (s are weights, U
    unit-column) unchanged.  ``qr_method`` picks the orthonormalization
    depth: the distributed basis QRs run CholeskyQR2 by default and drop
    to ONE (Gram all-reduce -> replicated Cholesky -> local GEMM) pass
    for 'cholqr1'/'robust1'-family values — every process must agree
    (collective count changes).
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

    if finish not in ("project", "rowspace", "utv", "rowspace_utv"):
        raise ValueError(f"unknown finish {finish!r}")
    rowspace_like = finish in ("rowspace", "rowspace_utv")
    if rowspace_like and q < 1:
        raise ValueError(f"finish={finish!r} needs q >= 1")
    # serving-family qr_method values collapse the distributed basis QRs
    # to ONE Gram-allreduce pass (cholqr1's depth/traffic contract)
    qr_passes = 1 if qr_method in ("cholqr1", "cholqr1_fused",
                                   "robust1") else 2

    rounds = q - 1 if rowspace_like else q
    stages = (["q0"] + [f"round{i}" for i in range(rounds)]
              + (["zq_final", "c_final"] if rowspace_like
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
                 "method": method.value, "qr_method": qr_method,
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
        q_local = _cholqr_distributed_r(y_local, m_global, qr_passes)[0]
        if ckpt:
            ckpt.save("q0", q_local)
    for i in range(rounds):
        if 1 + i < done:
            q_local = ckpt.load(f"round{i}")
            continue
        z = _global_sum(_stream_left_t_multiply(
            a_local, q_local, panel_rows, dtype, prec, panel_dtype))
        z_q, _ = _jit_qr(jnp.asarray(z, dtype), qr_method)  # replicated
        y_local = _stream_right_multiply(a_local, z_q, panel_rows, dtype,
                                         prec, panel_dtype)
        q_local = _cholqr_distributed_r(y_local, m_global, qr_passes)[0]
        if ckpt:
            ckpt.save(f"round{i}", q_local)

    if rowspace_like:
        # final half-round: one all-reduced co-range block, replicated QR,
        # then the LAST streamed pass C = A Z_q; the l x l Gram
        # all-reduce(s) of the row-sharded C are the only remaining
        # collectives (1 for the UTV tail at qr_passes=1, 2 at 2; 1 for
        # the eigh tail).
        if 1 + rounds < done:
            z_q = ckpt.load("zq_final")
        else:
            z = _global_sum(_stream_left_t_multiply(
                a_local, q_local, panel_rows, dtype, prec, panel_dtype))
            z_q, _ = _jit_qr(jnp.asarray(z, dtype), qr_method)  # replicated
            if ckpt:
                ckpt.save("zq_final", z_q)
        if 2 + rounds < done:
            c_local = ckpt.load("c_final")
        else:
            c_local = _stream_right_multiply(a_local, z_q, panel_rows,
                                             dtype, prec, panel_dtype)
            if ckpt:
                ckpt.save("c_final", c_local)
        if finish == "rowspace_utv":
            # serving tail: distributed thin QR of C, then the local fold
            q_c_local, t = _cholqr_distributed_r(c_local, m_global,
                                                 qr_passes)
            u_local, s, order = _utv_fold_local(q_c_local, t)
            return u_local[:, :k], s[:k], z_q[:, order][:, :k]
        g = jnp.asarray(_global_sum(_jit_gram(c_local)), dtype)  # l x l
        u_local, s, v = _rowspace_tail(c_local, g, z_q)
        return u_local[:, :k], s[:k], v[:, :k]

    if 1 + rounds < done:
        zb = ckpt.load("b_final")
    else:
        zb = jnp.asarray(_global_sum(_stream_left_t_multiply(
            a_local, q_local, panel_rows, dtype, prec, panel_dtype)),
            dtype)
        if ckpt:
            ckpt.save("b_final", zb)
    if finish == "utv":
        # B = Q^T A = L V^T via thin QR of the replicated Z_b = B^T;
        # the fold against the row-sharded Q is purely local
        v, r = _jit_qr(zb, qr_method)
        u_local, s, order = _utv_fold_local(q_local, r.T)
        return u_local[:, :k], s[:k], v[:, order][:, :k]
    u_local, s, v = _tail_svd(zb.T, q_local, method.value)
    return u_local[:, :k], s[:k], v[:, :k]
