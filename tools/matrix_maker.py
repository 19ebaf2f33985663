"""Test-matrix generator (reference python/matrix_maker.py:15-25 plus the
report's three accuracy-study families, report section 4 p.13-14):

- ``dense``  — the 100x100 matrix with entries 1..10000 (the reference's
  sparse_matrix.mtx).
- ``diag``   — identity-like diagonal matrices (sparse_matrix1NN.mtx).
- ``A``      — ill-conditioned: slow singular-value decay (hard for rSVD).
- ``B``      — block low-rank structure.
- ``C``      — exactly rank-deficient.

Usage: python tools/matrix_maker.py [--out data/input] [--n 100] [--family dense]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsvd_kamaneh_raganato_terrana_tpu.core.io import write_matrix_market


def make(family: str, n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if family == "dense":
        return np.arange(1.0, n * n + 1.0).reshape(n, n)
    if family == "diag":
        return np.eye(n)
    if family == "A":  # slow decay: sigma_i = 1/i
        u, _ = np.linalg.qr(rng.standard_normal((n, n)))
        v, _ = np.linalg.qr(rng.standard_normal((n, n)))
        return u * (1.0 / np.arange(1, n + 1)) @ v.T
    if family == "B":  # block structure, fast decay
        r = max(4, n // 10)
        blocks = [rng.standard_normal((r, r)) * (10.0 ** -i) for i in range(n // r)]
        out = np.zeros((n, n))
        for i, b in enumerate(blocks):
            out[i * r : (i + 1) * r, i * r : (i + 1) * r] = b
        return out
    if family == "C":  # exact rank n//5
        r = max(2, n // 5)
        return rng.standard_normal((n, r)) @ rng.standard_normal((r, n))
    raise ValueError(family)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="data/input")
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--family", default="dense",
                    choices=["dense", "diag", "A", "B", "C", "all"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    fams = ["dense", "diag", "A", "B", "C"] if args.family == "all" else [args.family]
    for fam in fams:
        a = make(fam, args.n, args.seed)
        path = os.path.join(args.out, f"matrix_{fam}_{args.n}.mtx")
        write_matrix_market(path, a)
        print(f"wrote {path} ({a.shape[0]}x{a.shape[1]})")


if __name__ == "__main__":
    main()
