"""Phase-level latency breakdown of the in-core rSVD pipeline on TPU.

Answers ROADMAP's "where does the 4096^2 k=64 millisecond go": times the
full pipeline under each knob combination plus the isolated phases
(orthonormalization chain, eigh tail, stage-A GEMMs), all via the
dispatch-chain-delta method (see bench.py — single dispatches through the
relay measure only round-trip latency).

Writes bench_results/phase_profile.csv and prints a table to stderr.

Usage:  python benchmarks/phase_profile.py  [M N K]
"""

import csv
import os
import sys

import numpy as np

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
K = int(sys.argv[3]) if len(sys.argv) > 3 else 64
P, Q = 16, 2


def log(msg):
    print(f"[phase] {msg}", file=sys.stderr, flush=True)


from benchmarks._timing import chain_delta as chain_time  # noqa: E402
# (shared dispatch-chain protocol — slope of two chain lengths, 1-element
# forced fetch, distinct-input cycling; see benchmarks/_timing.py)


def main():
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import _gram_eigh_svd
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        generate_omega,
        rsvd_with_omega,
        subspace_iteration,
    )

    log(f"devices: {jax.devices()}  shape {M}x{N} k={K} p={P} q={Q}")
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))
    a2 = a * jnp.float32(1.0001)  # distinct chain input (see chain_time)
    l = K + P
    omega = generate_omega(0, N, l, jnp.float32)
    y_tall = jnp.asarray(rng.standard_normal((M, l)).astype(np.float32))
    y_tall2 = y_tall * jnp.float32(1.0001)
    b_wide = jnp.asarray(rng.standard_normal((l, N)).astype(np.float32))
    b_wide2 = b_wide * jnp.float32(1.0001)
    a_np = np.asarray(a)

    rows = []

    def bench(name, fn, args_list, flops=None, check=None):
        t = chain_time(fn, args_list)
        gf = (flops / t / 1e9) if flops else float("nan")
        err = ""
        if check is not None:
            err = f"{check(fn(*args_list[0])):.4f}"
        rows.append({"phase": name, "ms": round(t * 1e3, 4),
                     "gflops": round(gf, 1) if flops else "",
                     "recon_err": err})
        log(f"{name:<44} {t * 1e3:8.3f} ms  "
            f"{gf:10.1f} GFLOP/s  {err}")
        return t

    def recon_check(out):
        u, s, v = out
        rec = (np.asarray(u)[:, :K] * np.asarray(s)[:K][None, :]) @ \
            np.asarray(v)[:, :K].T
        return float(np.linalg.norm(a_np - rec))

    flops = rsvd_flops(M, N, l, Q)

    # --- full-pipeline variants ---
    variants = [
        ("full jacobi highest full-reorth", "jacobi", "highest", "full", None),
        ("full eigh highest full-reorth", "eigh", "highest", "full", None),
        ("full eigh highest half", "eigh", "highest", "half", None),
        ("full eigh highest half robust1", "eigh", "highest", "half",
         "robust1"),
        ("full eigh high half robust1", "eigh", "high", "half", "robust1"),
        ("full eigh default half robust1", "eigh", "default", "half",
         "robust1"),
        ("full eigh_pallas highest half robust1", "eigh_pallas", "highest",
         "half", "robust1"),
        ("full eigh_pallas default half robust1", "eigh_pallas", "default",
         "half", "robust1"),
    ]
    for name, method, prec, reorth, interior in variants:
        run = jax.jit(lambda x, om, method=method, prec=prec, reorth=reorth,
                      interior=interior: rsvd_with_omega(
                          x, om, q=Q, k=K, method=method, precision=prec,
                          reorth=reorth, interior_qr=interior))
        run(a, omega)  # compile
        bench(name, run, [(a, omega), (a2, omega)], flops=flops,
              check=recon_check)

    # --- isolated phases ---
    stage_a = jax.jit(lambda x, om: subspace_iteration(
        x, om, Q, "robust", jax.lax.Precision.HIGHEST, "half"))
    stage_a(a, omega)
    bench("stageA only (robust, half)", stage_a, [(a, omega), (a2, omega)])

    stage_a1 = jax.jit(lambda x, om: subspace_iteration(
        x, om, Q, "robust", jax.lax.Precision.HIGHEST, "half", "robust1"))
    stage_a1(a, omega)
    bench("stageA only (robust1 interior)", stage_a1,
          [(a, omega), (a2, omega)])

    for meth in ("robust", "robust1", "cholqr2", "householder"):
        f = jax.jit(lambda y, meth=meth: qr_reduced(y, meth))
        f(y_tall)
        bench(f"qr {meth} ({M}x{l})", f, [(y_tall,), (y_tall2,)])

    eigh_tail = jax.jit(_gram_eigh_svd)
    eigh_tail(b_wide)
    bench(f"gram-eigh tail ({l}x{N})", eigh_tail, [(b_wide,), (b_wide2,)])

    ee = jax.jit(lambda g: jnp.linalg.eigh(g))
    g_small = b_wide @ b_wide.T
    g_small2 = g_small * jnp.float32(1.0001)
    ee(g_small)
    bench(f"eigh only ({l}x{l})", ee, [(g_small,), (g_small2,)])

    from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
        eigh_small,
    )

    for sweeps in (5, 8):
        ep = jax.jit(lambda g, sw=sweeps: eigh_small(g, sweeps=sw))
        ep(g_small)
        bench(f"eigh_small pallas sweeps={sweeps} ({l}x{l})", ep,
              [(g_small,), (g_small2,)])

    gemm = jax.jit(lambda x, om: jnp.matmul(
        x, om, precision=jax.lax.Precision.HIGHEST))
    gemm(a, omega)
    bench(f"single GEMM {M}x{N}x{l} highest", gemm,
          [(a, omega), (a2, omega)], flops=2 * M * N * l)

    os.makedirs("bench_results", exist_ok=True)
    out = f"bench_results/phase_profile_{M}x{N}_k{K}.csv"
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["phase", "ms", "gflops",
                                          "recon_err"])
        w.writeheader()
        w.writerows(rows)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
