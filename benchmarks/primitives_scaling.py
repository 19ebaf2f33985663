"""Primitive-op scaling benchmark (the reference report's Tables 4.1/4.2:
mat-vec and mat-mat CPU time for n in {10, 50, 100, 200, 400} across
Eigen / serial / MPI P=1..4).  The TPU translation: time the sharded
mat-vec and mat-mat on 1..D devices of the available platform and report
ms + speedup, plus the NumPy (BLAS) single-core figure in the "Eigen"
column role.

Usage (virtual 8-device CPU):
  PYTHONPATH=. JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python benchmarks/primitives_scaling.py
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _best(fn, iters=5):
    import jax

    jax.block_until_ready(fn())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100,400,1024,4096")
    ap.add_argument("--out", default="results/primitives_scaling.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import (
        make_mesh,
        pad_rows_for_mesh,
        shard_rows,
    )
    from rsvd_kamaneh_raganato_terrana_tpu.ops import primitives as ops

    sizes = [int(s) for s in args.sizes.split(",")]
    n_dev = len(jax.devices())
    rng = np.random.default_rng(0)
    rows = []
    for n in sizes:
        a_np = rng.standard_normal((n, n)).astype(np.float32)
        x_np = rng.standard_normal(n).astype(np.float32)
        t0 = time.perf_counter()
        a_np @ x_np
        numpy_mv = (time.perf_counter() - t0) * 1e3
        t0 = time.perf_counter()
        a_np @ a_np
        numpy_mm = (time.perf_counter() - t0) * 1e3

        row = {"n": n, "numpy_matvec_ms": round(numpy_mv, 3),
               "numpy_matmat_ms": round(numpy_mm, 3)}
        for d in sorted({1, max(1, n_dev // 2), n_dev}):
            mesh = make_mesh(devices=jax.devices()[:d])
            a_pad, _ = pad_rows_for_mesh(jnp.asarray(a_np), mesh)
            a = shard_rows(a_pad, mesh)
            b = jnp.asarray(a_np)
            x = jnp.asarray(x_np)
            mv = _best(lambda: jax.jit(ops.matvec)(a, x))
            mm = _best(lambda: jax.jit(ops.matmul)(a, b))
            row[f"matvec_d{d}_ms"] = round(mv, 3)
            row[f"matmat_d{d}_ms"] = round(mm, 3)
        rows.append(row)
        print(row)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    import csv

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
