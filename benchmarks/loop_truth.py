"""Ground-truth per-iteration rSVD timing: the whole chain runs INSIDE one
jitted fori_loop, so the relay sees a single dispatch — no chain-level
dedup/caching artifact is possible.  Per-iteration seeds come from a traced
vector (constant-folding defeated), and the loop carry consumes s[0] of
every iteration (no dead code).

Slope between R_small and R_large walls gives seconds/iteration.  This is
the calibration reference for the cheaper dispatch-chain benchmarks
(bench.py, scale_sweep.py): when they disagree with this, they are wrong.

Usage: python benchmarks/loop_truth.py [n[,n...]] [sketch[,sketch...]]
Writes bench_results/loop_truth.csv (appends).
"""

import csv
import os
import sys
import time

import numpy as np


def log(msg):
    print(f"[loop-truth] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
        fused_sketch_matmul,
    )
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd as small_svd
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        _PRECISIONS,
        _mm,
        generate_omega,
        power_refine,
    )

    sizes = [int(x) for x in (sys.argv[1] if len(sys.argv) > 1
                              else "8192,16384").split(",")]
    sketches = (sys.argv[2] if len(sys.argv) > 2 else "gaussian,fused").split(",")
    k = int(os.environ.get("LT_K", "128"))
    p = int(os.environ.get("LT_P", "16"))
    q = int(os.environ.get("LT_Q", "2"))
    precision = os.environ.get("LT_PRECISION", "high")
    prec = _PRECISIONS[precision]
    # wide rep spread: the slope must rise well above relay RTT jitter
    # (~30 ms intercept, +-1 ms run-to-run; a 2:8 spread resolved only
    # ~0.3 ms/iter and produced 0.31-0.67 ms readings of the SAME
    # program -- 4:32 resolves ~0.07 ms/iter)
    r_small, r_large = 4, 32

    def pipeline(a, seed, l, sketch):
        if sketch == "fused":
            y = fused_sketch_matmul(a, l, seed).astype(a.dtype)
        else:
            omega = generate_omega(seed, a.shape[1], l, a.dtype)
            y = _mm(a, omega, prec)
        q_mat = orthonormal_basis(y, "robust1")
        q_mat = power_refine(a, q_mat, q, "robust", prec, "half", "robust1")
        b = _mm(q_mat.T, a, prec)
        _, s, _ = small_svd(b, "eigh")
        return s[0]

    def make_loop(l, sketch, reps):
        def run(a, seeds):
            def body(i, acc):
                return acc + pipeline(a, seeds[i], l, sketch)

            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        return jax.jit(run)

    def wall(fn, a, seeds):
        t0 = time.perf_counter()
        out = fn(a, seeds)
        np.asarray(jax.device_get(out))  # forced 1-elem fetch
        return time.perf_counter() - t0, float(out)

    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        l = k + p
        host = rng.standard_normal((n, n)).astype(np.float32)
        t0 = time.perf_counter()
        a = jax.device_put(jnp.asarray(host))
        np.asarray(jax.device_get(jnp.ravel(a)[:1]))
        log(f"n={n} H2D {time.perf_counter() - t0:.1f}s")
        for sketch in sketches:
            fns = {r: make_loop(l, sketch, r) for r in (r_small, r_large)}
            for r, fn in fns.items():
                tc = time.perf_counter()
                wall(fn, a, jnp.arange(r, dtype=jnp.int32))  # compile+run
                log(f"n={n} {sketch} R={r} compile+first {time.perf_counter() - tc:.1f}s")
            # distinct seed vectors per repetition (relay dedup hazard)
            t_s = min(wall(fns[r_small], a,
                           jnp.arange(100 + 1000 * i,
                                      100 + 1000 * i + r_small,
                                      dtype=jnp.int32))[0]
                      for i in range(2))
            t_l = min(wall(fns[r_large], a,
                           jnp.arange(200 + 1000 * i,
                                      200 + 1000 * i + r_large,
                                      dtype=jnp.int32))[0]
                      for i in range(2))
            per = max((t_l - t_s) / (r_large - r_small), 1e-9)
            gf = rsvd_flops(n, n, l, q) / per / 1e9
            row = {"n": n, "k": k, "sketch": sketch, "precision": precision,
                   "r_spread": f"{r_small}:{r_large}",
                   "ms_per_iter": round(per * 1e3, 3),
                   "gflops": round(gf, 1)}
            rows.append(row)
            log(str(row))
        del a, host

    os.makedirs("bench_results", exist_ok=True)
    path = "bench_results/loop_truth.csv"
    new = not os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if new:
            w.writeheader()
        w.writerows(rows)
    log(f"wrote {path}")


if __name__ == "__main__":
    main()
