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
    ap.add_argument("--out", default="bench_results/scale_sweep.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

    rng = np.random.default_rng(0)
    rows = []
    for n in (int(s) for s in args.sizes.split(",")):
        a = jnp.asarray(rng.standard_normal((n, n)).astype("float32"))
        for k in (int(r) for r in args.ranks.split(",")):
            l = min(k + 16, n)

            def run(x, seed, k=k):
                return rsvd(x, k=k, p=16, q=args.q, method=args.method,
                            sketch=args.sketch, precision=args.precision,
                            reorth=args.reorth,
                            interior_qr=args.interior_qr, seed=seed)

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

            t_small = min(chain(3) for _ in range(3))
            t_large = min(chain(12) for _ in range(3))
            per = max((t_large - t_small) / 9.0, 1e-9)
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
