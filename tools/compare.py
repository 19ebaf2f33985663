"""Oracle comparator (reference python/compare_QR.py + compare_rSVD.py):
for each matrix stem present in both ``<out>/<op>/my/`` and ``.../py/``,
print the sign-invariant mean absolute difference per factor —
mean(| |my| - |py| |), the reference's metric (compare_rSVD.py:32-39) —
and optionally plot it per matrix dimension.

Usage: python tools/compare.py --op rsvd [--out data/output] [--plot diff.png]
"""

import argparse
import glob
import os
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsvd_kamaneh_raganato_terrana_tpu.core.io import read_matrix_market


def sign_invariant_diff(a: np.ndarray, b: np.ndarray) -> float:
    k = min(a.shape[-1] if a.ndim > 1 else len(a),
            b.shape[-1] if b.ndim > 1 else len(b))
    a = a[..., :k] if a.ndim > 1 else a[:k]
    b = b[..., :k] if b.ndim > 1 else b[:k]
    return float(np.mean(np.abs(np.abs(a) - np.abs(b))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True, choices=["qr", "svd", "rsvd"])
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--plot", default=None)
    args = ap.parse_args()

    my_dir = os.path.join(args.out, args.op.upper(), "my")
    py_dir = os.path.join(args.out, args.op.upper(), "py")
    rows = defaultdict(dict)
    for my_path in sorted(glob.glob(os.path.join(my_dir, "*.mtx"))):
        name = os.path.basename(my_path)
        py_path = os.path.join(py_dir, name)
        if not os.path.exists(py_path):
            continue
        stem, factor = name.rsplit("_", 1)
        factor = factor.replace(".mtx", "")
        diff = sign_invariant_diff(
            read_matrix_market(my_path), read_matrix_market(py_path)
        )
        rows[stem][factor] = diff

    print(f"{'matrix':<28}" + "".join(f"{f:>14}" for f in ("U", "S", "V", "Q", "R")))
    for stem in sorted(rows):
        line = f"{stem:<28}"
        for f in ("U", "S", "V", "Q", "R"):
            line += f"{rows[stem].get(f, float('nan')):>14.3e}" if f in rows[stem] else " " * 14
        print(line)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        stems = sorted(rows)
        factors = sorted({f for r in rows.values() for f in r})
        fig, ax = plt.subplots(figsize=(8, 4))
        for f in factors:
            ax.plot(stems, [rows[s].get(f, np.nan) for s in stems],
                    marker="o", label=f)
        ax.set_yscale("log")
        ax.set_ylabel("sign-invariant mean abs diff")
        ax.legend()
        plt.xticks(rotation=45, ha="right")
        plt.tight_layout()
        plt.savefig(args.plot, dpi=120)
        print(f"plot -> {args.plot}")


if __name__ == "__main__":
    main()
