"""Headline benchmark: rank-64 randomized SVD of a 4096 x 4096 matrix.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

- value: wall-clock ms of the full rSVD pipeline (sketch + q=2 power
  iterations + CholeskyQR2 + Jacobi tail) on the available accelerator,
  best of several timed runs after compile warmup.
- vs_baseline: speedup vs the reference-equivalent CPU implementation
  (NumPy/BLAS randomized SVD with the same k/p/q — an *optimistic* stand-in
  for the reference's Eigen+MPI pipeline, which is slower than BLAS;
  see BASELINE.md: Eigen matmul 460 ms at n=400 vs its manual-MPI 3189 ms).
- extra fields: achieved GFLOP/s and the reconstruction-error parity ratio
  vs the optimal rank-64 truncation (must stay ~1).
"""

import json
import time

import numpy as np

M = N = 4096
K, P, Q = 64, 16, 2
DTYPE = "float32"


def numpy_baseline(a_np, l, q, iters=3):
    rng = np.random.default_rng(0)
    omega = rng.standard_normal((N, l)).astype(a_np.dtype)

    def run():
        y = a_np @ omega
        q_mat, _ = np.linalg.qr(y)
        for _ in range(q):
            z = a_np.T @ q_mat
            qz, _ = np.linalg.qr(z)
            y = a_np @ qz
            q_mat, _ = np.linalg.qr(y)
        b = q_mat.T @ a_np
        u_t, s, vt = np.linalg.svd(b, full_matrices=False)
        return q_mat @ u_t, s, vt

    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        generate_omega,
        rsvd_with_omega,
    )

    rng = np.random.default_rng(0)
    # mildly decaying spectrum so the factorization is meaningful
    a_np = rng.standard_normal((M, N)).astype(DTYPE)
    a = jnp.asarray(a_np)

    l = K + P

    @jax.jit
    def run(x):
        omega = generate_omega(0, N, l, x.dtype)
        return rsvd_with_omega(x, omega, q=Q, k=K)

    u, s, v = jax.block_until_ready(run(a))  # compile + warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(run(a))
        best = min(best, time.perf_counter() - t0)

    flops = rsvd_flops(M, N, l, Q)
    gflops = flops / best / 1e9

    # accuracy parity vs optimal truncation (Eckart-Young)
    recon = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    err = float(np.linalg.norm(a_np - recon))
    s_full = np.linalg.svd(a_np.astype(np.float64), compute_uv=False)
    opt = float(np.sqrt((s_full[K:] ** 2).sum()))
    parity = err / opt

    cpu_s = numpy_baseline(a_np, l, Q)

    print(json.dumps({
        "metric": "rsvd_4096x4096_rank64_wallclock",
        "value": round(best * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(cpu_s / best, 2),
        "gflops": round(gflops, 1),
        "recon_err_vs_optimal": round(parity, 4),
        "device": str(jax.devices()[0]),
        "baseline_cpu_ms": round(cpu_s * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
