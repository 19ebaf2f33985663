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
        PhaseTimer,
        rsvd_flops,
        timeit,
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

    # phase-by-phase timings (reference chrono-print style)
    pt = PhaseTimer()
    omega = generate_omega(0, args.n, l, a.dtype)
    sketch = jax.jit(lambda x, o: x @ o)
    qr = jax.jit(orthonormal_basis)
    refine = jax.jit(lambda x, qm: power_refine(x, qm, args.q))
    proj = jax.jit(lambda qm, x: qm.T @ x)
    tail = jax.jit(lambda b: small_svd(b, "jacobi"))
    # warm
    y = sketch(a, omega); qm = qr(y); qm = refine(a, qm)
    b = proj(qm, a); jax.block_until_ready(tail(b))
    for _ in range(3):
        with pt.phase("sketch"):
            y = jax.block_until_ready(sketch(a, omega))
        with pt.phase("qr"):
            qm = jax.block_until_ready(qr(y))
        with pt.phase("power_refine"):
            qm = jax.block_until_ready(refine(a, qm))
        with pt.phase("project_b"):
            b = jax.block_until_ready(proj(qm, a))
        with pt.phase("small_svd_tail"):
            jax.block_until_ready(tail(b))
    for name in ("sketch", "qr", "power_refine", "project_b", "small_svd_tail"):
        print(f"{name:>16}: {pt.avg_us(name) / 1e3:10.3f} ms avg")

    secs, _ = timeit(
        lambda: rsvd(a, k=args.k, p=args.p, q=args.q), iters=3, warmup=1
    )
    gflops = rsvd_flops(args.m, args.n, l, args.q) / secs / 1e9
    print(f"{'full rsvd':>16}: {secs * 1e3:10.3f} ms  ({gflops:.1f} GFLOP/s)")

    with trace(args.trace_dir):
        jax.block_until_ready(rsvd(a, k=args.k, p=args.p, q=args.q))
    print(f"trace -> {args.trace_dir}")


if __name__ == "__main__":
    main()
