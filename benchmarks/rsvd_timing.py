"""rSVD timing/precision benchmark (the reference rSVD_test2.cpp protocol,
tests/rSVD_test2.cpp:77-136): a 250x250 random matrix, ranks
{10,20,50,70,100,120,150,170,200,250}, timing the three tail engines and
recording relative precision ||A - USV^T|| / ||A||; writes
``rsvd_timing_and_precision_results.csv`` with the reference's columns.

Usage: python benchmarks/rsvd_timing.py [--n 250] [--out results/]
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
    ap.add_argument("--n", type=int, default=250)
    ap.add_argument("--ranks", default="10,20,50,70,100,120,150,170,200,250")
    ap.add_argument("--out", default="results")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((args.n, args.n)).astype(args.dtype)
    a = jnp.asarray(a_np)
    norm_a = float(np.linalg.norm(a_np))
    ranks = [min(int(r), args.n) for r in args.ranks.split(",")]
    methods = ["jacobi", "power", "parallel_jacobi"]

    rows = []
    for rank in ranks:
        row = {"Rank": rank}
        for method in methods:
            def run():
                return rsvd(a, k=rank, p=min(10, args.n - rank), q=2,
                            method=method)

            u, s, v = jax.block_until_ready(run())  # compile+warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(run())
                best = min(best, time.perf_counter() - t0)
            recon = np.asarray(u) * np.asarray(s)[None] @ np.asarray(v).T
            prec = float(np.linalg.norm(a_np - recon)) / norm_a
            tag = {"jacobi": "Jacobi", "power": "Power",
                   "parallel_jacobi": "DynamicJacobi"}[method]
            row[f"Time{tag}(ms)"] = round(best * 1e3, 3)
            row[f"Precision{tag}"] = round(prec, 8)
        rows.append(row)
        print(row)

    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "rsvd_timing_and_precision_results.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
