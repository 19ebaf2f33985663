"""rSVD scale sweep on the accelerator: size x rank grid with chain-delta
timing (see bench.py for why single-shot timing is invalid through the TPU
tunnel).  Writes CSV with per-iteration ms and achieved GFLOP/s per
(n, k, method, precision) configuration.

Usage: python benchmarks/scale_sweep.py [--sizes 2048,4096,8192,16384]
       [--ranks 64,128] [--method eigh] [--out bench_results/scale_sweep.csv]
"""

import argparse
import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2048,4096,8192,16384")
    ap.add_argument("--ranks", default="64,128")
    ap.add_argument("--method", default="eigh")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--q", type=int, default=2)
    ap.add_argument("--sketch", default="gaussian",
                    help="gaussian | fused (Pallas in-kernel Omega)")
    ap.add_argument("--reorth", default="full")
    ap.add_argument("--interior-qr", default=None)
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--on-device-operand", action="store_true",
                    help="generate A with device-side RNG (no H2D; "
                         "required for never-compiled multi-GiB shapes)")
    ap.add_argument("--out", default="bench_results/scale_sweep.csv")
    args = ap.parse_args()

    from functools import partial

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_core

    rng = np.random.default_rng(0)
    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        if args.on_device_operand:
            # generate A on the accelerator: a multi-GiB H2D combined
            # with a cold compile has killed the relay transport before
            # (CLAUDE.md "Giant single dispatches") — device-side RNG
            # removes the transfer entirely; the spectrum class (iid
            # Gaussian) is identical
            a = jax.block_until_ready(jax.random.normal(
                jax.random.PRNGKey(0), (n, n), jnp.float32))
        else:
            a = jnp.asarray(rng.standard_normal((n, n)).astype("float32"))
        for k in (int(r) for r in args.ranks.split(",")):
            l = min(k + 16, n)

            # pre-bound jitted callable (bench.py protocol): the rsvd()
            # convenience wrapper's per-call static-kwarg dispatch costs
            # ~0.5 ms through the relay transport, which is pipeline-sized
            # at small n — bind every static once so the chain measures
            # the pipeline, not the wrapper
            run = jax.jit(partial(
                rsvd_core, k=k, p=16, q=args.q,
                method=SVDMethod.parse(args.method).value,
                sketch=args.sketch, qr_method="robust",
                precision=args.precision, reorth=args.reorth,
                interior_qr=args.interior_qr))

            out = run(a, 0)
            jax.block_until_ready(out)
            np.asarray(out[1])

            # distinct traced seed per dispatch: identical (program, input)
            # pairs can be deduplicated by caching transports, yielding
            # impossible throughput (benchmarks/loop_truth.py is the
            # dispatch-cache-immune calibration reference for this file)
            seq = iter(range(1, 1 << 20))

            def chain(reps):
                t0 = time.perf_counter()
                o = None
                for _ in range(reps):
                    o = run(a, next(seq))
                jax.block_until_ready(o)
                np.asarray(o[1])
                return time.perf_counter() - t0

            # Adaptive chain lengths: relay timing jitter is ~1-2 ms per
            # chain, so the slope base must hold >= ~40 ms of real work or
            # fast configs read below their own single-dispatch fori_loop
            # ground truth (observed: 0.25 ms at a 0.35 ms floor with a
            # 16-iteration base).  Pilot-estimate the per-iteration time,
            # then size the base accordingly.
            pilot = max((chain(12) - chain(4)) / 8.0, 1e-6)
            n_large = int(max(20, min(400, 0.040 / pilot)))
            n_small = max(4, n_large // 5)
            t_small = min(chain(n_small) for _ in range(3))
            t_large = min(chain(n_large) for _ in range(3))
            per = max((t_large - t_small) / (n_large - n_small), 1e-9)
            gflops = rsvd_flops(n, n, l, args.q) / per / 1e9
            row = {
                "n": n,
                "k": k,
                "method": args.method,
                "sketch": args.sketch,
                "reorth": args.reorth,
                "interior_qr": args.interior_qr or "",
                "precision": args.precision,
                "ms_per_iter": round(per * 1e3, 3),
                "gflops": round(gflops, 1),
            }
            rows.append(row)
            print(row, flush=True)
        del a

    if not rows:
        print("no configurations ran; nothing to write")
        return
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    mode = "a" if args.append and os.path.exists(args.out) else "w"
    if mode == "a":
        with open(args.out) as f:
            existing = f.readline().strip()
            while existing.startswith("#"):  # provenance header comments
                existing = f.readline().strip()
        if existing != ",".join(rows[0].keys()):
            raise SystemExit(
                f"--append: {args.out} has a different column schema "
                f"({existing!r}); write to a fresh --out instead")
    with open(args.out, mode, newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        if mode == "w":
            w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
