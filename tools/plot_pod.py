"""POD result plots (reference POD/.../scripts/{plot_solution,
plot_singular_values, plot_convergence}.py): reads the pipeline exports
(full.mtx, reconstruction.mtx, errors.mtx, sigma.txt, convergence.csv)
from a results directory and writes PNGs next to them.

Usage: python tools/plot_pod.py <results_dir> [--which all|solution|sigma|convergence]
"""

import argparse
import csv
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rsvd_kamaneh_raganato_terrana_tpu.core.io import read_matrix_market


def plot_solution(d):
    full = read_matrix_market(os.path.join(d, "full.mtx"))
    recon = read_matrix_market(os.path.join(d, "reconstruction.mtx"))
    x = np.linspace(0, 1, full.shape[0])
    fig, axes = plt.subplots(1, 3, figsize=(13, 4))
    axes[0].plot(x, full[:, -1], label="FOM (last snapshot)")
    axes[0].plot(x, recon[:, -1], "--", label="POD reconstruction")
    axes[0].set_title("solution")
    axes[0].legend()
    axes[1].plot(x, np.abs(full[:, -1] - recon[:, -1]))
    axes[1].set_yscale("log")
    axes[1].set_title("|FOM - reconstruction|")
    err_path = os.path.join(d, "errors.mtx")
    if os.path.exists(err_path):
        errs = read_matrix_market(err_path)
        for i in range(errs.shape[0]):
            axes[2].plot(errs[i], marker="o", label=f"row {i}")
        axes[2].set_yscale("log")
        axes[2].set_title("ROM rel-L2 error (rows = rom sizes)")
        axes[2].set_xlabel("parameter index")
    plt.tight_layout()
    out = os.path.join(d, "solution.png")
    plt.savefig(out, dpi=120)
    print(f"-> {out}")


def plot_sigma(d):
    sig = np.loadtxt(os.path.join(d, "sigma.txt"))
    plt.figure(figsize=(5, 4))
    plt.semilogy(np.arange(1, len(sig) + 1), np.maximum(sig, 1e-300), "o-")
    plt.xlabel("mode")
    plt.ylabel("singular value")
    plt.title("POD spectrum decay")
    plt.tight_layout()
    out = os.path.join(d, "sigma.png")
    plt.savefig(out, dpi=120)
    print(f"-> {out}")


def plot_convergence(d):
    path = os.path.join(d, "convergence.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    dts = np.array([float(r["deltat"]) for r in rows])
    l2 = np.array([float(r["fom_l2"]) for r in rows])
    plt.figure(figsize=(5, 4))
    plt.loglog(dts, l2, "o-", label="FOM L2 error")
    for p in (1, 2):
        guide = l2[0] * (dts / dts[0]) ** p
        plt.loglog(dts, guide, "--", label=f"dt^{p}")
    plt.xlabel("deltat")
    plt.legend()
    plt.tight_layout()
    out = os.path.join(d, "convergence.png")
    plt.savefig(out, dpi=120)
    print(f"-> {out}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results_dir")
    ap.add_argument("--which", default="all",
                    choices=["all", "solution", "sigma", "convergence"])
    args = ap.parse_args()
    d = args.results_dir
    if args.which in ("all", "solution") and os.path.exists(
        os.path.join(d, "full.mtx")
    ):
        plot_solution(d)
    if args.which in ("all", "sigma") and os.path.exists(
        os.path.join(d, "sigma.txt")
    ):
        plot_sigma(d)
    if args.which in ("all", "convergence") and os.path.exists(
        os.path.join(d, "convergence.csv")
    ):
        plot_convergence(d)


if __name__ == "__main__":
    main()
