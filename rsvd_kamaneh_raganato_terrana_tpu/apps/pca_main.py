"""PCA CLI (reference PCA/main/main.cpp: ``./bin/main <dataset> <yes/no>``:
load whitespace dataset, run ParallelJacobi PCA, print the R-style summary,
save results).

Usage:
  python -m rsvd_kamaneh_raganato_terrana_tpu.apps.pca_main <dataset> [yes|no]
      [--skip-cols N] [--method parallel_jacobi] [--save results.txt]
"""

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dataset")
    ap.add_argument("normalize", nargs="?", default="no", choices=["yes", "no"])
    ap.add_argument("--skip-cols", type=int, default=None,
                    help="leading categorical columns (auto by filename)")
    ap.add_argument("--method", default="parallel_jacobi")
    ap.add_argument("--save", default=None)
    args = ap.parse_args(argv)

    from rsvd_kamaneh_raganato_terrana_tpu.apps.pca import PCA
    from rsvd_kamaneh_raganato_terrana_tpu.core.io import load_whitespace_dataset

    skip = args.skip_cols
    if skip is None:
        # reference loaders: tourists has 3 categorical cols, athletic 1
        name = os.path.basename(args.dataset)
        skip = 3 if "tourist" in name else 1

    data, labels = load_whitespace_dataset(args.dataset, skip_cols=skip)
    print(f"dataset: {data.shape[0]} rows x {data.shape[1]} numeric cols")
    pca = PCA(data, normalize=(args.normalize == "yes"), method=args.method)
    print(pca.summary())
    print(f"orthogonality check ||V^T V - I|| = {pca.check_orthogonality():.3e}")
    if args.save:
        pca.save_results(args.save)
        print(f"saved results -> {args.save}")


if __name__ == "__main__":
    main()
