"""PCA result plots (reference PCA/python/plot_tourists_results.py):
variance-ratio bar chart + scatter matrix of the leading scores, read from
a PCA.save_results file.

Usage: python tools/plot_pca.py <results.txt> [--out pca.png] [--n-scores 3]
"""

import argparse

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def parse_results(path):
    sections = {"cum": [], "scores": [], "loadings": []}
    current = None
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("#"):
                if "cumulative" in line:
                    current = "cum"
                elif "scores" in line:
                    current = "scores"
                elif "loadings" in line:
                    current = "loadings"
                continue
            if line and current:
                sections[current].append([float(x) for x in line.split()])
    cum = np.asarray(sections["cum"]).ravel()
    return cum, np.asarray(sections["scores"]), np.asarray(sections["loadings"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results")
    ap.add_argument("--out", default="pca_plots.png")
    ap.add_argument("--n-scores", type=int, default=3)
    args = ap.parse_args()

    cum, scores, _ = parse_results(args.results)
    ratios = np.diff(np.concatenate([[0.0], cum]))
    k = min(args.n_scores, scores.shape[1])

    fig = plt.figure(figsize=(4 + 3 * k, 4))
    ax = fig.add_subplot(1, k + 1, 1)
    ax.bar(np.arange(1, len(ratios) + 1), ratios)
    ax.plot(np.arange(1, len(cum) + 1), cum, "ro-", label="cumulative")
    ax.set_xlabel("PC")
    ax.set_ylabel("variance ratio")
    ax.legend()
    for i in range(k - 1):
        axs = fig.add_subplot(1, k + 1, i + 2)
        axs.scatter(scores[:, i], scores[:, i + 1], s=8)
        axs.set_xlabel(f"PC{i + 1}")
        axs.set_ylabel(f"PC{i + 2}")
    plt.tight_layout()
    plt.savefig(args.out, dpi=120)
    print(f"-> {args.out}")


if __name__ == "__main__":
    main()
