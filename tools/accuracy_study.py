"""rSVD accuracy vs target rank study (reference report section 4,
Fig 4.2): for matrix families A (slow spectral decay), B (block), and
C (rank-deficient), average the reconstruction error over ``--trials``
random matrices per family across a rank sweep.  Expected behavior
(report p.13-14): error -> 0 by k ~ 20 for B and C; family A converges
only as k -> n.

Usage: python tools/accuracy_study.py [--n 100] [--trials 5]
       [--ranks 2,5,10,20,40,60,80,100] [--out results/accuracy_study.csv]
       [--plot results/accuracy_study.png]
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.matrix_maker import make  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--ranks", default="2,5,10,20,40,60,80,100")
    ap.add_argument("--out", default="results/accuracy_study.csv")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        reconstruction_error,
        rsvd,
    )

    ranks = [min(int(r), args.n) for r in args.ranks.split(",")]
    rows = []
    for fam in ("A", "B", "C"):
        errs_by_rank = {r: [] for r in ranks}
        for t in range(args.trials):
            a = make(fam, args.n, seed=t)
            a_dev = jnp.asarray(a)
            norm = float(np.linalg.norm(a))
            for r in ranks:
                u, s, v = rsvd(a_dev, k=r, p=min(10, args.n - r), q=2,
                               seed=t)
                errs_by_rank[r].append(
                    float(reconstruction_error(a_dev, u, s, v)) / norm
                )
        for r in ranks:
            rows.append({
                "family": fam,
                "rank": r,
                "mean_rel_err": float(np.mean(errs_by_rank[r])),
            })
        print(f"family {fam}: " + " ".join(
            f"k={r}:{np.mean(errs_by_rank[r]):.2e}" for r in ranks))

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["family", "rank", "mean_rel_err"])
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(5.5, 4))
        for fam in ("A", "B", "C"):
            rs = [r["rank"] for r in rows if r["family"] == fam]
            es = [max(r["mean_rel_err"], 1e-17) for r in rows if r["family"] == fam]
            plt.semilogy(rs, es, "o-", label=f"family {fam}")
        plt.xlabel("target rank k")
        plt.ylabel("mean relative reconstruction error")
        plt.legend()
        plt.tight_layout()
        plt.savefig(args.plot, dpi=120)
        print(f"plot -> {args.plot}")


if __name__ == "__main__":
    main()
