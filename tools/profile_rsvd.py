"""XLA profiler trace of the headline rSVD (the reference's ``make
profile`` -> gprof role, Makefile:45-47).  Produces a TensorBoard/Perfetto
trace directory plus per-phase wall-clock timings.

Usage: python tools/profile_rsvd.py [--m 4096] [--n 4096] [--k 64]
       [--trace-dir /tmp/rsvd_trace]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--p", type=int, default=16)
    ap.add_argument("--q", type=int, default=2)
    ap.add_argument("--trace-dir", default="/tmp/rsvd_trace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import (
        rsvd_flops,
        trace,
    )
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd as small_svd
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        generate_omega,
        power_refine,
        rsvd,
    )

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((args.m, args.n)), dtype=jnp.float32)
    l = args.k + args.p
    print(f"rsvd phase profile: {args.m}x{args.n} k={args.k} p={args.p} "
          f"q={args.q} f32 on {jax.devices()[0]}")
    print("phases below use the reference-parity configuration (jacobi "
          "tail, full reorth, highest precision); the production "
          "configuration is the last row.  Timing: dispatch-chain deltas "
          "with distinct-input cycling (docs/ARCHITECTURE.md).")

    # Phase timings by dispatch-chain deltas (single-shot timing through
    # the TPU tunnel measures round-trip latency, not compute — see
    # docs/ARCHITECTURE.md "Performance methodology").
    from benchmarks._timing import chain_delta as _chain, scaled_variants

    def chain_delta(fn, fn_args, n_small=3, n_large=12):
        return _chain(fn, scaled_variants(fn_args),
                      n_small=n_small, n_large=n_large)

    omega = generate_omega(0, args.n, l, a.dtype)
    phases = {
        "sketch": (jax.jit(lambda x, o: x @ o), (a, omega)),
        "qr": (jax.jit(orthonormal_basis), None),  # arg filled below
        "power_refine": (jax.jit(lambda x, qm: power_refine(x, qm, args.q)),
                         None),
        "project_b": (jax.jit(lambda qm, x: qm.T @ x), None),
        "small_svd_tail": (jax.jit(lambda b: small_svd(b, "jacobi")), None),
    }
    y = phases["sketch"][0](a, omega)
    qm = phases["qr"][0](y)
    qm2 = phases["power_refine"][0](a, qm)
    b = phases["project_b"][0](qm2, a)
    phases["qr"] = (phases["qr"][0], (y,))
    phases["power_refine"] = (phases["power_refine"][0], (a, qm))
    phases["project_b"] = (phases["project_b"][0], (qm2, a))
    phases["small_svd_tail"] = (phases["small_svd_tail"][0], (b,))

    for name, (fn, fn_args) in phases.items():
        ms = chain_delta(fn, fn_args) * 1e3
        print(f"{name:>16}: {ms:10.3f} ms/iter")

    full = jax.jit(lambda x: rsvd(x, k=args.k, p=args.p, q=args.q))
    secs = chain_delta(full, (a,))
    gflops = rsvd_flops(args.m, args.n, l, args.q) / max(secs, 1e-12) / 1e9
    print(f"{'full rsvd':>16}: {secs * 1e3:10.3f} ms/iter  ({gflops:.1f} GFLOP/s)")

    prod = jax.jit(lambda x: rsvd(x, k=args.k, p=args.p, q=args.q,
                                  method="eigh", precision="default",
                                  reorth="half", interior_qr="robust1"))
    secs_p = chain_delta(prod, (a,))
    gflops_p = rsvd_flops(args.m, args.n, l, args.q) / max(secs_p, 1e-12) / 1e9
    print(f"{'full rsvd (production config)':>16}: {secs_p * 1e3:10.3f} "
          f"ms/iter  ({gflops_p:.1f} GFLOP/s)")

    with trace(args.trace_dir):
        jax.block_until_ready(rsvd(a, k=args.k, p=args.p, q=args.q))
    print(f"trace -> {args.trace_dir}")


if __name__ == "__main__":
    main()
