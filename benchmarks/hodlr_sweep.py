"""HODLR vs dense crossover sweep (VERDICT r3 item 2).

Round 3's only committed HODLR numbers showed `hodlr_matvec` LOSING to a
dense matvec at the one benchmarked size (4096^2, L=4, k=16: 0.152 vs
0.108 ms) while the docs advertised "O(k n log n)" unqualified.  This
sweep settles the claim with data: matvec (and one solve point) at
n in {4096 .. 65536}, HODLR leaf pinned at 256 (levels = log2(n/256)),
k in {16, 64}, against the dense equivalents.

Operand safety (CLAUDE.md relay rules): everything is synthesized ON
DEVICE — dense operands from jax.random.normal, HODLR factors as stacked
random (b, m, k) tensors with the exact shapes/dtypes `hodlr_build`
produces (timing is value-independent; `hodlr_matvec`/`hodlr_solve` are
pure GEMV/GEMM chains).  No multi-GiB H2D, and 65536^2 dense (17 GB)
is never materialized — on a 16 GB-HBM chip that row IS the capacity
result: only the HODLR side exists.

For the solve point the synthesized operand is made SPD-by-construction:
leaves = I*diag_scale + small symmetric noise, off-diagonal factors
scaled ~1/n so the hierarchical perturbation keeps the matrix diagonally
dominant; the dense comparison solves the RECONSTRUCTED same matrix with
Cholesky, so both sides solve identical systems.

Writes bench_results/hodlr_sweep.csv and prints a crossover summary.
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import chain_delta  # noqa: E402
from benchmarks.streaming_bench import log  # noqa: E402

CSV_PATH = os.environ.get("HODLR_CSV", "bench_results/hodlr_sweep.csv")
FIELDS = ["op", "n", "levels", "k", "leaf", "ms", "dense_ms", "speedup",
          "bytes_mb", "dense_bytes_mb", "note"]
LEAF = 256


def append_row(row):
    os.makedirs("bench_results", exist_ok=True)
    exists = os.path.exists(CSV_PATH)
    with open(CSV_PATH, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        if not exists:
            w.writeheader()
        w.writerow(row)
    log(" ".join(f"{k}={v}" for k, v in row.items()))


def synth_hodlr(n, levels, k, key, spd=False):
    """A HodlrMatrix with hodlr_build's exact factor shapes, synthesized
    directly on device (no dense n x n ever exists)."""
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import HodlrMatrix

    keys = iter(jax.random.split(key, 4 * levels + 1))
    u_up, v_up, u_lo, v_lo = [], [], [], []
    for ell in range(levels):
        b = 2 ** ell
        m = n // (2 * b)
        kk = min(k, m)
        # ~1/n scale keeps the SPD variant diagonally dominant
        sc = (1.0 / n) if spd else 1.0
        u_up.append(sc * jax.random.normal(next(keys), (b, m, kk),
                                           jnp.float32))
        v_up.append(jax.random.normal(next(keys), (b, m, kk), jnp.float32))
        if spd:
            # A21 = A12^T: (sc*U) V^T transposes to (sc*V) U^T
            u_lo.append(v_up[-1] * sc)
            v_lo.append(u_up[-1] / sc)
            next(keys), next(keys)  # keep key schedule aligned
        else:
            u_lo.append(jax.random.normal(next(keys), (b, m, kk),
                                          jnp.float32))
            v_lo.append(jax.random.normal(next(keys), (b, m, kk),
                                          jnp.float32))
    leaf = n // 2 ** levels
    blocks = n // leaf
    noise = 0.1 * jax.random.normal(next(keys), (blocks, leaf, leaf),
                                    jnp.float32)
    if spd:
        leaves = (jnp.eye(leaf, dtype=jnp.float32)[None] * 4.0
                  + 0.5 * (noise + jnp.swapaxes(noise, 1, 2)))
    else:
        leaves = noise
    return HodlrMatrix(tuple(u_up), tuple(v_up), tuple(u_lo), tuple(v_lo),
                       leaves, n=n, k=k)


def hodlr_bytes_mb(h):
    total = h.leaves.size
    for fu in h.u_upper:
        total += 4 * fu.size
    return total * 4 / 1e6


def mv_looped_ms(mv, operands, x1, x2, reps=3):
    """ON-DEVICE per-matvec ms: the matvec iterated inside one jitted
    fori_loop with a normalize between iterations (a data-dependent
    carry, so nothing folds), timed at two rep counts — the bench.py
    ground-truth protocol.  Sub-ms matvecs are far below the relay's
    +-1 ms RTT jitter, so the dispatch-chain clock cannot resolve them
    (the first run of this sweep measured a literal 0.0 for the 8192
    HODLR matvec).  Operands are jit ARGUMENTS (CLAUDE.md: a closed-over
    device array serializes into the program shipped to the remote
    compiler); inputs alternate across timed calls (dedup defense)."""
    import time

    import jax
    import jax.numpy as jnp

    def make(r):
        @jax.jit
        def run(ops, x):
            def body(i, xc):
                y = mv(ops, xc)
                return y / jnp.linalg.norm(y)

            return jax.lax.fori_loop(0, r, body, x)

        return run

    def timed(fn, x):
        t0 = time.perf_counter()
        out = fn(operands, x)
        np.asarray(jax.device_get(out[:1]))
        return time.perf_counter() - t0

    # escalate the rep spread until the delta clears the relay's +-1 ms
    # RTT jitter by >= 5x — a 10-20 us matvec needs thousands of in-loop
    # reps before its slope is resolvable (the 8:64 spread measured a
    # literal 0.0 for the 4096 k=16 HODLR matvec)
    for r_small, r_large in ((8, 64), (64, 512), (512, 4096)):
        f_s, f_l = make(r_small), make(r_large)
        timed(f_s, x1), timed(f_l, x1)  # compile + warm
        t_s = min(timed(f_s, (x1, x2)[i % 2]) for i in range(reps))
        t_l = min(timed(f_l, (x2, x1)[i % 2]) for i in range(reps))
        if t_l - t_s > 5e-3:
            break
    return max((t_l - t_s) / (r_large - r_small), 1e-9) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="4096,8192,16384,32768,65536")
    ap.add_argument("--ks", default="16,64")
    ap.add_argument("--solve-n", type=int, default=16384)
    ap.add_argument("--dense-max", type=int, default=32768,
                    help="largest n whose dense n x n fits in HBM")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import (
        hodlr_matvec,
        hodlr_solve,
    )

    log(f"devices: {jax.devices()}")

    for n in [int(s) for s in args.sizes.split(",")]:
        levels = int(np.log2(n // LEAF))
        key = jax.random.PRNGKey(n)
        x1 = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float32)
        x2 = jax.random.normal(jax.random.PRNGKey(2), (n,), jnp.float32)

        dense_ms = ""
        dense_mb = n * n * 4 / 1e6
        if n <= args.dense_max:
            a = jax.random.normal(key, (n, n), jnp.float32)
            dense_ms = round(mv_looped_ms(
                lambda aa, xx: aa @ xx, a, x1, x2), 4)
            append_row({"op": "dense_matvec", "n": n, "levels": "",
                        "k": "", "leaf": "", "ms": dense_ms,
                        "dense_ms": "", "speedup": "",
                        "bytes_mb": round(dense_mb, 1),
                        "dense_bytes_mb": round(dense_mb, 1), "note": ""})
            del a
        else:
            append_row({"op": "dense_matvec", "n": n, "levels": "",
                        "k": "", "leaf": "", "ms": "", "dense_ms": "",
                        "speedup": "",
                        "bytes_mb": round(dense_mb, 1),
                        "dense_bytes_mb": round(dense_mb, 1),
                        "note": "OOM: exceeds 16 GB HBM — capacity win "
                                "for HODLR"})

        for k in [int(s) for s in args.ks.split(",")]:
            h = synth_hodlr(n, levels, k, key)
            mb = hodlr_bytes_mb(h)
            ms = round(mv_looped_ms(
                lambda hh, xx: hodlr_matvec(hh, xx), h, x1, x2), 4)
            speedup = (round(dense_ms / ms, 2)
                       if dense_ms != "" and ms > 0 else "")
            append_row({"op": "hodlr_matvec", "n": n, "levels": levels,
                        "k": k, "leaf": LEAF, "ms": ms,
                        "dense_ms": dense_ms, "speedup": speedup,
                        "bytes_mb": round(mb, 1),
                        "dense_bytes_mb": round(dense_mb, 1), "note": ""})
            del h

    # one solve point: CG-on-HODLR vs dense Cholesky on the SAME matrix
    n = args.solve_n
    levels = int(np.log2(n // LEAF))
    k = 16
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import (
        hodlr_reconstruct,
    )

    h = synth_hodlr(n, levels, k, jax.random.PRNGKey(n), spd=True)
    b1 = jax.random.normal(jax.random.PRNGKey(3), (n,), jnp.float32)
    b2 = jax.random.normal(jax.random.PRNGKey(4), (n,), jnp.float32)
    per = chain_delta(lambda bb: hodlr_solve(h, bb, tol=1e-6),
                      [(b1,), (b2,)], n_small=2, n_large=8)
    ms = round(per * 1e3, 3)

    @jax.jit
    def dense_solve(a, bb):
        c = jnp.linalg.cholesky(a)
        return jax.scipy.linalg.cho_solve((c, True), bb)

    a_dense = hodlr_reconstruct(h)  # eager: one-time build, not timed
    per_d = chain_delta(dense_solve, [(a_dense, b1), (a_dense, b2)],
                        n_small=2, n_large=6)
    dense_ms = round(per_d * 1e3, 3)
    # residual check so the solve rows are factorizations of record
    x = hodlr_solve(h, b1, tol=1e-6)
    resid = float(jnp.linalg.norm(hodlr_matvec(h, x) - b1)
                  / jnp.linalg.norm(b1))
    append_row({"op": "hodlr_solve_cg", "n": n, "levels": levels, "k": k,
                "leaf": LEAF, "ms": ms, "dense_ms": dense_ms,
                "speedup": round(dense_ms / ms, 2),
                "bytes_mb": round(hodlr_bytes_mb(h), 1),
                "dense_bytes_mb": round(n * n * 4 / 1e6, 1),
                "note": f"rel resid {resid:.1e}; dense=chol+trsm on the "
                        f"reconstructed same matrix"})


if __name__ == "__main__":
    main()
