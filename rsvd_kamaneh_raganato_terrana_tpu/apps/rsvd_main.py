"""rSVD CLI — the root-stack test workflow as a first-class command.

TPU counterpart of the reference's main entry point
(tests/rSVD_test.cpp:15-118: loop every MatrixMarket file in an input
directory, run rSVD with l = k + p, print ``||A - U S V^T||_F`` and the
wall time, write U/S/V as .mtx).  Reference hyperparameter preset
kept: k=0, p=16 => l=16, method=jacobi (rSVD_test.cpp:63-72).

  python -m rsvd_kamaneh_raganato_terrana_tpu rsvd data/input \
      [--k 0] [--p 16] [--q 2] [--method jacobi] [--precision highest] \
      [--save-dir data/output/rSVD/my]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="rsvd", description="randomized SVD over MatrixMarket inputs")
    ap.add_argument("input", help=".mtx file or directory of .mtx files")
    ap.add_argument("--k", type=int, default=0,
                    help="target rank (0 = all l = p components)")
    ap.add_argument("--p", type=int, default=16, help="oversampling")
    ap.add_argument("--q", type=int, default=2, help="power iterations")
    ap.add_argument("--method", default="jacobi",
                    help="small-SVD tail engine (jacobi|power|eigh|auto|...)")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--finish", default="project",
                    help="project|rowspace|utv|rowspace_utv (serving "
                         "modes — rsvd_with_omega docstring)")
    ap.add_argument("--qr-method", default="robust",
                    help="robust|robust1|cholqr1|cholqr2|cholqr3|"
                         "householder")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--save-dir", default=None,
                    help="write <stem>_U/S/V.mtx factor exports here")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() == "cpu":
        jax.config.update("jax_enable_x64", True)  # science CLI convention

    from rsvd_kamaneh_raganato_terrana_tpu.core.io import (
        read_matrix_market,
        write_matrix_market,
    )
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
        reconstruction_error,
        rsvd,
    )

    paths = (sorted(glob.glob(os.path.join(args.input, "*.mtx")))
             if os.path.isdir(args.input) else [args.input])
    if not paths:
        print(f"no .mtx files under {args.input}", file=sys.stderr)
        return 1
    if args.save_dir:
        os.makedirs(args.save_dir, exist_ok=True)

    for path in paths:
        a = jnp.asarray(read_matrix_market(path))
        t0 = time.perf_counter()
        u, s, v = rsvd(a, k=args.k, p=args.p, q=args.q, method=args.method,
                       precision=args.precision, seed=args.seed,
                       finish=args.finish, qr_method=args.qr_method)
        float(s[0])          # force the factorization before stopping the clock
        dt = (time.perf_counter() - t0) * 1e3
        err = float(reconstruction_error(a, u, s, v))
        stem = os.path.splitext(os.path.basename(path))[0]
        print(f"{stem}: {a.shape[0]}x{a.shape[1]} l={s.shape[0]} "
              f"||A-USV^T|| = {err:.6e}  ({dt:.1f} ms)")
        if not np.isfinite(err) and args.qr_method.startswith("cholqr"):
            print(f"  hint: {args.qr_method} has no rank-deficiency "
                  "fallback (linalg/qr.py) — rank-deficient input NaNs; "
                  "use --qr-method robust", file=sys.stderr)
        if args.save_dir:
            write_matrix_market(
                os.path.join(args.save_dir, f"{stem}_U.mtx"), np.asarray(u))
            write_matrix_market(
                os.path.join(args.save_dir, f"{stem}_S.mtx"),
                np.asarray(s)[:, None])
            write_matrix_market(
                os.path.join(args.save_dir, f"{stem}_V.mtx"), np.asarray(v))
    return 0


if __name__ == "__main__":
    sys.exit(main())
