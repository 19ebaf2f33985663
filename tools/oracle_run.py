"""Oracle cross-validation runner.

The reference's accuracy-parity harness (python/test_run_QR.py,
python/test_run_rSVD.py): for every ``.mtx`` in the input directory, run our
TPU-native kernels writing factors to ``<out>/<op>/my/`` and the
NumPy/sklearn ground truth to ``<out>/<op>/py/``; then ``tools/compare.py``
reports the sign-invariant differences.

Usage:
  python tools/oracle_run.py --op qr   [--input data/input] [--out data/output]
  python tools/oracle_run.py --op rsvd [--rank 16]
  python tools/oracle_run.py --op svd
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsvd_kamaneh_raganato_terrana_tpu.core.io import (
    read_matrix_market,
    write_matrix_market,
)


def run_qr(a, stem, my_dir, py_dir):
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced

    q, r = qr_reduced(jnp.asarray(a), "cholqr2")
    write_matrix_market(os.path.join(my_dir, f"{stem}_Q.mtx"), np.asarray(q))
    write_matrix_market(os.path.join(my_dir, f"{stem}_R.mtx"), np.asarray(r))
    qn, rn = np.linalg.qr(a, mode="reduced")
    write_matrix_market(os.path.join(py_dir, f"{stem}_Q.mtx"), qn)
    write_matrix_market(os.path.join(py_dir, f"{stem}_R.mtx"), rn)


def run_svd(a, stem, my_dir, py_dir, rank=0):
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd

    u, s, v = svd(jnp.asarray(a), "parallel_jacobi", rank)
    for name, arr in (("U", u), ("S", s), ("V", v)):
        write_matrix_market(os.path.join(my_dir, f"{stem}_{name}.mtx"),
                            np.asarray(arr))
    un, sn, vtn = np.linalg.svd(a, full_matrices=False)
    k = rank if rank > 0 else len(sn)
    for name, arr in (("U", un[:, :k]), ("S", sn[:k]), ("V", vtn[:k].T)):
        write_matrix_market(os.path.join(py_dir, f"{stem}_{name}.mtx"), arr)


def run_rsvd(a, stem, my_dir, py_dir, rank=16):
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

    u, s, v = rsvd(jnp.asarray(a), k=0, p=rank, q=2, method="jacobi")
    for name, arr in (("U", u), ("S", s), ("V", v)):
        write_matrix_market(os.path.join(my_dir, f"{stem}_{name}.mtx"),
                            np.asarray(arr))
    # sklearn randomized_svd ground truth (the reference's test_run_rSVD.py
    # already imported it, python/test_run_rSVD.py:5)
    try:
        from sklearn.utils.extmath import randomized_svd

        un, sn, vtn = randomized_svd(a, n_components=rank, n_iter=2,
                                     random_state=0)
    except ImportError:
        un, sn, vtn = np.linalg.svd(a, full_matrices=False)
        un, sn, vtn = un[:, :rank], sn[:rank], vtn[:rank]
    for name, arr in (("U", un), ("S", sn), ("V", vtn.T)):
        write_matrix_market(os.path.join(py_dir, f"{stem}_{name}.mtx"), arr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--op", required=True, choices=["qr", "svd", "rsvd"])
    ap.add_argument("--input", default="data/input")
    ap.add_argument("--out", default="data/output")
    ap.add_argument("--rank", type=int, default=16)
    args = ap.parse_args()

    my_dir = os.path.join(args.out, args.op.upper(), "my")
    py_dir = os.path.join(args.out, args.op.upper(), "py")
    os.makedirs(my_dir, exist_ok=True)
    os.makedirs(py_dir, exist_ok=True)

    for path in sorted(glob.glob(os.path.join(args.input, "*.mtx"))):
        stem = os.path.splitext(os.path.basename(path))[0]
        a = read_matrix_market(path)
        if args.op == "qr":
            run_qr(a, stem, my_dir, py_dir)
        elif args.op == "svd":
            run_svd(a, stem, my_dir, py_dir)
        else:
            run_rsvd(a, stem, my_dir, py_dir, args.rank)
        print(f"{args.op}: {stem} done")


if __name__ == "__main__":
    main()
