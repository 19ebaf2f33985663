"""Worker process for the 2-process jax.distributed CPU test.

Launched twice by tests/test_multihost.py with a shared coordinator
address: each process owns 4 virtual CPU devices (8 global), builds the
hybrid DCN x ICI pod mesh (core.distributed.make_pod_mesh), runs the full
distributed rSVD step on a matrix sharded over BOTH mesh axes, and checks
the result against a replicated single-process NumPy oracle.

This is the "multi-host without a cluster" validation of the DCN path —
the reference's analogue is simply `mpirun -np N` on one machine
(SURVEY section 4).
"""

import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    ).strip()

    from rsvd_kamaneh_raganato_terrana_tpu.core import distributed

    distributed.initialize(coordinator_address=coord, num_processes=nproc,
                           process_id=pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding

    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 4, len(jax.devices())

    mesh = distributed.make_pod_mesh()
    assert mesh.devices.shape == (nproc, 4), mesh.devices.shape
    # inner (ICI) axis must be intra-process
    for row in mesh.devices:
        assert len({d.process_index for d in row}) == 1, "ICI axis crosses hosts"

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        generate_omega,
        rsvd_with_omega,
    )

    m = n = 256
    k, p, q = 16, 8, 2
    rng = np.random.default_rng(0)
    # low-rank + noise: a spectrum rSVD resolves sharply, so the oracle
    # comparison is tight (a flat iid spectrum would not be)
    a_np = (rng.standard_normal((m, 16)) @ rng.standard_normal((16, n))
            + 0.01 * rng.standard_normal((m, n))).astype(np.float32)
    sharding = NamedSharding(mesh, distributed.row_spec_for(mesh))
    # every process holds the full host copy; make_array_from_callback
    # carves out each device's shard
    a_sh = jax.make_array_from_callback(
        (m, n), sharding, lambda idx: a_np[idx]
    )

    @jax.jit
    def step(x):
        omega = generate_omega(0, x.shape[1], k + p, x.dtype)
        return rsvd_with_omega(x, omega, q=q, k=k, method="eigh")

    u, s, v = step(a_sh)
    jax.block_until_ready((u, s, v))

    # compiled program must carry cross-device collectives
    hlo = jax.jit(step).lower(a_sh).compile().as_text()
    found = [op for op in ("all-reduce", "all-gather", "reduce-scatter")
             if op in hlo]
    assert found, "no collectives in multi-host compiled step"

    # oracle: same algorithm replicated in NumPy via the single-device path
    s_local = np.asarray(jax.device_get(s.addressable_shards[0].data)) \
        if not s.is_fully_replicated else np.asarray(s)
    u0, s0, v0 = np.linalg.svd(a_np, full_matrices=False)
    # rank-k subspace captured: leading singular values must match SVD
    np.testing.assert_allclose(s_local[:4], s0[:4], rtol=2e-2)

    # ring-collective driver across the host boundary: the DCN scenario
    # rsvd_ring exists for (neighbor-only traffic for the big operands)
    from jax.sharding import PartitionSpec as P

    from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.ring import rsvd_ring

    ring_mesh = make_mesh((nproc * 4,), ("rows",), jax.devices())
    a_ring = jax.make_array_from_callback(
        (m, n), NamedSharding(ring_mesh, P("rows", None)),
        lambda idx: a_np[idx])
    u_r, s_r, v_r = rsvd_ring(ring_mesh, a_ring, k=k, p=p, q=1,
                              method="eigh")
    jax.block_until_ready((u_r, s_r, v_r))
    s_ring = np.asarray(jax.device_get(s_r.addressable_shards[0].data)) \
        if not s_r.is_fully_replicated else np.asarray(s_r)
    np.testing.assert_allclose(s_ring[:4], s0[:4], rtol=2e-2)

    # multi-host STREAMING: each process owns a memmap row shard of a
    # global matrix (the per-host ingestion design, rsvd/multihost.py);
    # the heavy panel GEMMs stay process-local, only l-sized Grams and
    # n x l blocks cross the process boundary.
    import tempfile

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.multihost import (
        rsvd_streaming_multihost,
    )

    sizes = [180, 240]           # uneven shards, 420 global rows
    ms = sizes[pid]
    rows_before = sum(sizes[:pid])
    full = (rng.standard_normal((420, n)) * 0.01
            + rng.standard_normal((420, 16)) @ rng.standard_normal((16, n))
            ).astype(np.float32)   # same rng stream state on both workers
    my_rows = full[rows_before:rows_before + ms]
    with tempfile.NamedTemporaryFile(suffix=".bin") as f:
        mm = np.memmap(f.name, dtype=np.float32, mode="w+",
                       shape=my_rows.shape)
        mm[:] = my_rows
        mm.flush()
        u_l, s_m, v_m = rsvd_streaming_multihost(
            np.memmap(f.name, dtype=np.float32, mode="r",
                      shape=my_rows.shape),
            k=k, p=8, q=2, panel_rows=64)
    assert u_l.shape == (ms, k)
    s_mh = np.asarray(s_m)
    # oracle: full-matrix SVD computed identically on both workers
    s_full = np.linalg.svd(full, compute_uv=False)
    np.testing.assert_allclose(s_mh[:8], s_full[:8], rtol=2e-2)
    # this host's rows must reconstruct ITS shard
    rec = np.asarray(u_l) @ np.diag(s_mh) @ np.asarray(v_m).T
    rel = np.linalg.norm(my_rows - rec) / np.linalg.norm(my_rows)
    assert rel < 0.05, f"local shard reconstruction {rel}"

    # compressed-wire variant: int8 panels over the same shards — the
    # per-host H2D encoding must not perturb the cross-host collectives
    # or the recovered spectrum beyond quantization noise
    u_q, s_q, v_q = rsvd_streaming_multihost(
        my_rows, k=k, p=8, q=2, panel_rows=64, panel_dtype="int8")
    s_q = np.asarray(s_q)
    np.testing.assert_allclose(s_q[:8], s_full[:8], rtol=2e-2)
    rec_q = np.asarray(u_q) @ np.diag(s_q) @ np.asarray(v_q).T
    rel_q = np.linalg.norm(my_rows - rec_q) / np.linalg.norm(my_rows)
    assert rel_q < 0.06, f"int8-panel shard reconstruction {rel_q}"

    # rowspace finish changes the cross-host collective ORDER (one fewer
    # co-range all-reduce, tail becomes an l x l Gram all-reduce) — the
    # 2-process run is where an SPMD-order bug would deadlock or diverge
    u_r2, s_r2, v_r2 = rsvd_streaming_multihost(
        my_rows, k=k, p=8, q=2, panel_rows=64, finish="rowspace")
    s_r2 = np.asarray(s_r2)
    np.testing.assert_allclose(s_r2[:8], s_full[:8], rtol=2e-2)
    rec_r2 = np.asarray(u_r2) @ np.diag(s_r2) @ np.asarray(v_r2).T
    rel_r2 = np.linalg.norm(my_rows - rec_r2) / np.linalg.norm(my_rows)
    assert rel_r2 < 0.06, f"rowspace shard reconstruction {rel_r2}"

    # UTV serving finishes across REAL processes (VERDICT r4 item 3):
    # 'rowspace_utv' + single-pass distributed QRs changes the collective
    # COUNT (one Gram all-reduce per basis QR instead of two) — the
    # 2-process run is where a collective-order bug deadlocks.  The fold
    # weights track the (gapped, low-rank) spectrum here.
    u_u, s_u, v_u = rsvd_streaming_multihost(
        my_rows, k=k, p=8, q=2, panel_rows=64, finish="rowspace_utv",
        qr_method="cholqr1")
    s_u = np.asarray(s_u)
    # s are decomposition WEIGHTS (documented honesty gate): per-entry
    # sigma tracking needs gapped spectra, but the captured ENERGY and
    # the reconstruction are exact contracts on this rank-16 operator
    np.testing.assert_allclose(
        float((s_u ** 2).sum()), float((s_full[:k] ** 2).sum()),
        rtol=2e-2)
    rec_u = np.asarray(u_u) @ np.diag(s_u) @ np.asarray(v_u).T
    rel_u = np.linalg.norm(my_rows - rec_u) / np.linalg.norm(my_rows)
    assert rel_u < 0.06, f"rowspace_utv shard reconstruction {rel_u}"

    # checkpoint/resume across REAL processes: after a full checkpointed
    # run, delete a mid-run stage on ONE host only — both processes must
    # agree (collective min) to resume from the same stage, or the
    # collective sequences diverge and this deadlocks (caught by the
    # launcher's timeout)
    import shutil

    ckdir = os.path.join(tempfile.gettempdir(),
                         "mh_ck_" + coord.replace(":", "_").replace(".", "_"))
    if pid == 0:
        shutil.rmtree(ckdir, ignore_errors=True)
    # both processes must see a clean dir before the checkpointed run:
    # reuse a cheap collective as a barrier (sums are synchronizing)
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.multihost import _global_sum

    _global_sum(np.zeros(1))
    u_c1, s_c1, _ = rsvd_streaming_multihost(
        my_rows, k=k, p=8, q=2, panel_rows=64, checkpoint_dir=ckdir)
    if pid == 1:  # skew: host1 loses its round-1 state, host0 keeps all
        os.remove(os.path.join(ckdir, "host1", "round1.npy"))
        os.remove(os.path.join(ckdir, "host1", "b_final.npy"))
    _global_sum(np.zeros(1))  # barrier: deletions visible before resume
    u_c2, s_c2, _ = rsvd_streaming_multihost(
        my_rows, k=k, p=8, q=2, panel_rows=64, checkpoint_dir=ckdir)
    np.testing.assert_allclose(np.asarray(s_c2), np.asarray(s_c1),
                               rtol=1e-5)

    print(f"worker {pid}: ok mesh={mesh.devices.shape} "
          f"collectives={found} s0={s_local[0]:.4f} "
          f"ring_s0={s_ring[0]:.4f} stream_s0={s_mh[0]:.4f} "
          f"stream_rel_err={rel:.3e}", flush=True)


if __name__ == "__main__":
    main()
