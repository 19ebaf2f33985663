"""Headline benchmark: rank-64 randomized SVD of a 4096 x 4096 matrix.

Prints ONE JSON line on stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

- value: ON-DEVICE ms per full rSVD pipeline iteration (sketch + q=2
  power iterations + CholeskyQR2/robust QR + tail), measured as the slope
  of a jitted fori_loop that runs the whole pipeline R times inside ONE
  dispatch — the ground-truth protocol of benchmarks/loop_truth.py, immune
  to the +-40% per-dispatch jitter of this environment's host relay.
- chain_ms: the same pipeline timed as a chain of separate dispatches
  (closer to eager production use; includes per-dispatch transport cost).
  Historical note: rounds 1-2 reported chain_ms as "value".
- vs_baseline: speedup vs the reference-equivalent CPU implementation
  (NumPy/BLAS randomized SVD, same k/p/q — an *optimistic* stand-in for the
  reference's Eigen+MPI pipeline; see BASELINE.md: Eigen matmul 460 ms at
  n=400 vs its manual-MPI 3189 ms).
- extra fields: achieved GFLOP/s and reconstruction-error parity
  our_err / numpy_err (same-algorithm comparison; ~1.0 means parity).

Stage progress goes to stderr so a hang is attributable.
"""

import json
import os
import sys
import time

import numpy as np

M = int(os.environ.get("BENCH_M", 4096))
N = int(os.environ.get("BENCH_N", 4096))
K = int(os.environ.get("BENCH_K", 64))
P, Q = 16, 2
# Mixed-precision range finder: the stage-A GEMMs (sketch + power
# iterations + Q^T A projection) run at 'default' (single-pass bf16,
# i.e. both operands rounded to bf16 with f32 accumulation), while every
# orthonormalization Gram and the tail factorization stay at HIGHEST.
# This puts a ~bf16-level floor (~1e-3 relative) under the achievable
# reconstruction error; whenever the rank-truncation error sits above
# that floor — every compression workload, and this benchmark, where
# truncation keeps ~2% of the spectrum — the measured error is identical
# to full-f32 'highest' to 6 significant digits at ~2.2x the throughput
# (bench_results/phase_profile_4096x4096_k64.csv: 0.67 ms default /
# 0.81 ms high / 1.23 ms highest).  For near-exactly-rank-k inputs whose
# truncation error is below the bf16 floor, use BENCH_PRECISION=
# {high,highest} (3-/6-pass modes, ~f32 floors).  The err_ratio_vs_numpy
# field printed below verifies parity against a full-f32 BLAS pipeline
# on every run, so a workload where 'default' is NOT free shows up as a
# ratio > 1 rather than passing silently.
PRECISION = os.environ.get("BENCH_PRECISION", "default")
# 'eigh' is the TPU-native Gram-eigendecomposition tail: identical
# reconstruction error to the jacobi tail (verified in-bench), one third
# of the pipeline latency.  The reference-parity engines remain available
# via BENCH_METHOD={jacobi,power,parallel_jacobi}.
METHOD = os.environ.get("BENCH_METHOD", "eigh")
# 'half' skips the Z-side re-orthonormalization in each power round
# (Y = A A^T Q with one QR): ~25% faster, identical reconstruction error
# on benchmark spectra; the robust QR falls back to Householder if the
# squared condition number ever degrades the Gram factorization.
REORTH = os.environ.get("BENCH_REORTH", "half")
# single-pass CholeskyQR for interior power-round orthonormalizations
# (the final pre-projection QR stays CholeskyQR2) — see linalg/qr.py.
INTERIOR = os.environ.get("BENCH_INTERIOR_QR", "robust1")
# 'project' (reference-parity 2q+2 passes) or 'rowspace' (2q+1 passes,
# one fewer read of A — rsvd_with_omega docstring).
FINISH = os.environ.get("BENCH_FINISH", "project")
# BENCH_SYNTH=1: generate A with DEVICE-side RNG instead of host H2D.
# Required for never-compiled multi-GiB shapes — a cold compile combined
# with a multi-GiB H2D has killed the relay transport (CLAUDE.md "Giant
# single dispatches").  The timed program is identical (A is a traced
# argument either way); the NumPy baseline/parity check is replaced by
# an on-device reconstruction error (err_ratio_vs_numpy reported against
# the device-computed truncation floor of the same run protocol).
SYNTH = os.environ.get("BENCH_SYNTH", "0") == "1"
# final-orthonormalization QR ('robust' = CholeskyQR2 + fallback;
# 'robust1' = single-pass CholeskyQR — serving-mode experiment: halves
# the tail QR chain at ~sqrt(eps) looser Q orthogonality).
QR_METHOD = os.environ.get("BENCH_QR_METHOD", "robust")
DTYPE = "float32"


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def numpy_rsvd(a_np, l, q, seed=0):
    rng = np.random.default_rng(seed)
    omega = rng.standard_normal((a_np.shape[1], l)).astype(a_np.dtype)
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


def recon_err(a_np, u, s, vt_or_v, v_is_vt):
    vt = vt_or_v if v_is_vt else vt_or_v.T
    k = K
    rec = (u[:, :k] * s[:k][None, :]) @ vt[:k]
    return float(np.linalg.norm(a_np - rec))


def main():
    log("importing jax")
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        generate_omega,
        rsvd_with_omega,
    )

    log(f"devices: {jax.devices()}")
    if SYNTH:
        a_np = None
        a = jax.block_until_ready(jax.random.normal(
            jax.random.PRNGKey(0), (M, N), jnp.float32))
        log("BENCH_SYNTH: device-side operand (no H2D)")
    else:
        rng = np.random.default_rng(0)
        a_np = rng.standard_normal((M, N)).astype(DTYPE)
        a = jnp.asarray(a_np)
    if PRECISION == "int8":
        # serving deployments quantize ONCE offline; quantizing inside
        # the timed pipeline reads f32 A per factorization and erases
        # most of the 1-byte/pass HBM win (measured round 5)
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            quantize_int8_rows,
        )

        a = jax.block_until_ready(jax.jit(quantize_int8_rows)(a))
        log("BENCH_PRECISION=int8: operand pre-quantized outside the "
            "timed loop (1 byte/element/pass)")
    l = K + P

    @jax.jit
    def run(x, seed):
        # seed is a traced argument: every timed dispatch below uses a
        # fresh one, so no relay/transport layer can deduplicate repeated
        # (program, input) pairs into impossible throughput numbers
        # (calibrated against benchmarks/loop_truth.py, which runs the
        # whole chain inside one fori_loop dispatch).
        omega = generate_omega(seed, N, l, x.dtype)
        return rsvd_with_omega(x, omega, q=Q, k=K, method=METHOD,
                               qr_method=QR_METHOD, precision=PRECISION,
                               reorth=REORTH, interior_qr=INTERIOR,
                               finish=FINISH)

    log("compiling + first run")
    t0 = time.perf_counter()
    u, s, v = run(a, 0)
    s_host = np.asarray(s)  # forces completion
    log(f"compile+run {time.perf_counter() - t0:.2f}s; s[0]={s_host[0]:.3f}")

    seq = iter(range(1, 1 << 20))

    def timed_chain(n):
        """n back-to-back dispatches, one sync at the end.  Single-shot
        timing through the TPU tunnel measures mostly round-trip latency
        (~30 ms regardless of work), so per-iteration time comes from the
        slope between two chain lengths."""
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = run(a, next(seq))
        jax.block_until_ready(out)
        np.asarray(out[1])
        return time.perf_counter() - t0

    timed_chain(2)  # warm the dispatch path
    n_small, n_large = 4, 20
    t_small = min(timed_chain(n_small) for _ in range(3))
    t_large = min(timed_chain(n_large) for _ in range(3))
    chain_s = max((t_large - t_small) / (n_large - n_small), 1e-9)
    log(f"chain({n_small})={t_small * 1e3:.1f} ms, "
        f"chain({n_large})={t_large * 1e3:.1f} ms -> "
        f"per-iter {chain_s * 1e3:.3f} ms")

    # Ground truth: the whole pipeline iterated INSIDE one jitted
    # fori_loop (single dispatch — relay jitter cannot touch the slope).
    # Per-iteration seeds come from a traced vector and the carry consumes
    # s[0], so no iteration can be constant-folded or dead-code-eliminated.
    def make_loop(reps):
        def run_loop(x, seeds):
            def body(i, acc):
                omega = generate_omega(seeds[i], N, l, x.dtype)
                u_i, s_i, v_i = rsvd_with_omega(
                    x, omega, q=Q, k=K, method=METHOD,
                    qr_method=QR_METHOD, precision=PRECISION,
                    reorth=REORTH, interior_qr=INTERIOR, finish=FINISH)
                # consume ALL THREE factors (protocol v2, round 4): a
                # carry of s alone lets XLA dead-code-eliminate each
                # finish's unused factor-forming GEMMs (U = Q u_t, the
                # UTV trsm+fold, V = B^T u_t / s), under-reporting the
                # full-factorization latency by a finish-dependent
                # amount — the serving-mode ladder must compare fully
                # materialized factorizations.  The probe is a full-matrix
                # sum-of-squares reduction, not a scalar slice: XLA's
                # simplifier can sink a slice through the factor-forming
                # dot (slice-of-dot -> dot-of-slices), which would
                # re-enable exactly the DCE this carry exists to prevent
                # (round-5 advisor finding); a whole-factor reduction has
                # no such rewrite and costs ~m*k adds vs the m*n*l GEMMs.
                return (acc + s_i[0] + jnp.sum(u_i ** 2)
                        + jnp.sum(v_i ** 2))

            return jax.lax.fori_loop(0, reps, body, jnp.zeros((), x.dtype))

        return jax.jit(run_loop)

    def timed_loop(fn, seed0, reps):
        seeds = jnp.arange(seed0, seed0 + reps, dtype=jnp.int32)
        t0 = time.perf_counter()
        out = fn(a, seeds)
        np.asarray(jax.device_get(out))  # forced 1-element fetch
        return time.perf_counter() - t0

    # wide rep spread: the slope must rise well above relay RTT jitter
    # (~30 ms intercept, +-1-2 ms run-to-run).  Round-5 finding: a 4:32
    # spread on a ~0.2 ms pipeline leaves only a ~5 ms delta — jitter
    # distorted one such reading by -29% (the retracted 0.144 "anchor";
    # wide spreads converged at 0.223).  The spread therefore AUTO-
    # ESCALATES x8 until the large-minus-small delta clears 20 ms (>=10x
    # jitter) or the cap is hit.  BENCH_R_SMALL/BENCH_R_LARGE set the
    # STARTING spread.
    r_small = int(os.environ.get("BENCH_R_SMALL", 4))
    r_large = int(os.environ.get("BENCH_R_LARGE", 32))
    while True:
        loops = {r: make_loop(r) for r in (r_small, r_large)}
        for r, fn in loops.items():
            t0 = time.perf_counter()
            timed_loop(fn, 50, r)  # compile+first
            log(f"loop(R={r}) compile+first {time.perf_counter() - t0:.1f}s")
        # distinct seed vectors per repetition: identical (program, input)
        # dispatches can be deduplicated by the relay (the same hazard the
        # chain clock defends against), which would corrupt the min()
        t_ls = min(timed_loop(loops[r_small], 100 + 1000 * i, r_small)
                   for i in range(3))
        t_ll = min(timed_loop(loops[r_large], 200 + 1000 * i, r_large)
                   for i in range(3))
        ondevice_s = max((t_ll - t_ls) / (r_large - r_small), 1e-9)
        log(f"fori_loop R={r_small}:{t_ls * 1e3:.1f} ms R={r_large}:"
            f"{t_ll * 1e3:.1f} ms -> on-device "
            f"{ondevice_s * 1e3:.3f} ms/iter")
        if t_ll - t_ls >= 0.020 or r_large >= 2048:
            break
        r_small, r_large = r_small * 8, r_large * 8
        log(f"delta {1e3 * (t_ll - t_ls):.1f} ms < 20 ms resolution "
            f"floor: escalating spread to {r_small}:{r_large}")

    flops = rsvd_flops(M, N, l, Q)
    if FINISH in ("rowspace", "rowspace_utv"):
        # 2q+1 passes over A instead of 2q+2: count the flops actually done
        flops *= (2 * Q + 1) / (2 * Q + 2)
    gflops = flops / ondevice_s / 1e9

    if SYNTH:
        # no host copy of A exists: compute the reconstruction error ON
        # DEVICE (one program, 1-element fetch) and compare against the
        # iid-Gaussian truncation floor sqrt((min(M,N) - K)/min(M,N))
        # * ||A||_F — exact in expectation for this operand class, and
        # the quantity the H2D runs' numpy parity converges to
        @jax.jit
        def device_err(x, u_, s_, v_):
            from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
                Int8Stored,
            )

            if isinstance(x, Int8Stored):
                # error vs the DEQUANTIZED operand: the served product
                # approximates diag(s) Q8, and that is the operator the
                # factorization contract covers once A is int8-stored
                x = x.q8.astype(jnp.float32) * x.row_scale[:, None]
            rec = (u_[:, :K] * s_[:K][None, :]) @ v_[:, :K].T
            return jnp.linalg.norm(x - rec), jnp.linalg.norm(x)
        e_dev, a_norm = (float(x) for x in device_err(a, u, s, v))
        floor = float(np.sqrt((min(M, N) - K) / min(M, N))) * a_norm
        ours, theirs = e_dev, floor
        cpu_s = float("nan")
        log(f"on-device recon err={e_dev:.2f} iid floor={floor:.2f}")
    else:
        log("numpy baseline (same algorithm, BLAS)")
        t0 = time.perf_counter()
        u_n, s_n, vt_n = numpy_rsvd(a_np, l, Q)
        cpu_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        numpy_rsvd(a_np, l, Q)
        cpu_s = min(cpu_s, time.perf_counter() - t0)
        log(f"numpy rsvd {cpu_s * 1e3:.1f} ms")

        log("parity check")
        ours = recon_err(a_np, np.asarray(u), np.asarray(s),
                         np.asarray(v), False)
        theirs = recon_err(a_np, u_n, s_n, vt_n, True)
        log(f"recon err ours={ours:.2f} numpy={theirs:.2f}")

    print(json.dumps({
        "metric": f"rsvd_{M}x{N}_rank{K}_wallclock",
        "value": round(ondevice_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": (round(cpu_s / ondevice_s, 2)
                        if np.isfinite(cpu_s) else None),
        "ondevice_ms": round(ondevice_s * 1e3, 3),
        "chain_ms": round(chain_s * 1e3, 3),
        "gflops": round(gflops, 1),
        "err_ratio_vs_numpy": round(ours / theirs, 4),
        "precision": PRECISION,
        "finish": FINISH,
        "qr_method": QR_METHOD,
        "device": str(jax.devices()[0]),
        "baseline_cpu_ms": (round(cpu_s * 1e3, 1)
                            if np.isfinite(cpu_s) else None),
        "synth_operand": SYNTH,
    }))


if __name__ == "__main__":
    main()
