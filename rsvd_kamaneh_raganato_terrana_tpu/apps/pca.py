"""Principal Component Analysis on the SVD engine.

TPU counterpart of the reference's header-only ``PCA<method> : SVD<method>``
(PCA/include/PCA_class.hpp:12-197): mean-center (optionally z-score) the
data, run the dispatched SVD, and expose variance/score/loading accessors,
the R-style ``summary()`` table, saveResults, and addData.

Design differences: composition instead of inheritance (the engine is a
field, not a base class), a covariance-free ``use_rsvd`` fast path for wide
or large datasets (rSVD on the centered matrix — the BASELINE.json
"covariance-free PCA" config), and everything jit-friendly.
"""

from __future__ import annotations

import io as _io
import os
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd


class PCA:
    """PCA via SVD of the centered (optionally standardized) data matrix.

    Parameters mirror the reference ctor ``PCA(data, normalize=false)``
    (PCA_class.hpp:18-29); ``method`` picks the SVD engine and
    ``use_rsvd``/``rank`` enable the randomized fast path.
    """

    def __init__(
        self,
        data,
        normalize: bool = False,
        method: SVDMethod | str = SVDMethod.ParallelJacobi,
        use_rsvd: bool = False,
        rank: int = 0,
    ):
        self._method = SVDMethod.parse(method)
        self._normalize = bool(normalize)
        self._use_rsvd = bool(use_rsvd)
        self._rank = int(rank)
        self._assign(jnp.asarray(data))
        self._initialize()

    # ------------------------------------------------------------------
    def _assign(self, data):
        if data.ndim != 2 or data.shape[0] < 2 or data.shape[1] < 2:
            # reference validation (PCA_class.hpp:51-55)
            raise ValueError("PCA needs an at least 2 x 2 data matrix")
        self._raw = data

    def _initialize(self):
        x = self._raw
        self._mean = jnp.mean(x, axis=0)
        xc = x - self._mean[None, :]
        if self._normalize:
            self._std = jnp.std(xc, axis=0, ddof=1)
            xc = xc / jnp.where(self._std > 0, self._std, 1.0)[None, :]
        else:
            self._std = None
        self._centered = xc
        # Total variance of the centered/standardized matrix.  The ratio
        # accessors normalize by this rather than by sum(s^2) so that the
        # truncated use_rsvd/rank fast path reports honest proportions
        # (the reference always computes the full spectrum, so for it the
        # two denominators coincide — PCA_class.hpp:81-84).
        self._total_sq = jnp.sum(jnp.square(xc))
        if self._use_rsvd:
            k = self._rank if self._rank > 0 else min(xc.shape)
            self._u, self._s, self._v = rsvd(
                xc, k=min(k, min(xc.shape) - 1) if k >= min(xc.shape) else k,
                method=self._method,
            )
        else:
            self._u, self._s, self._v = svd(xc, self._method, self._rank)

    # -- reference accessors -------------------------------------------
    def getU(self):  # noqa: N802
        return self._u

    def getS(self):  # noqa: N802
        return self._s

    def getV(self):  # noqa: N802
        return self._v

    @property
    def mean(self):
        return self._mean

    def explained_variance(self):
        """Component standard deviations S / sqrt(n-1)
        (reference explainedVariance, PCA_class.hpp:76-79)."""
        n = self._raw.shape[0]
        return self._s / jnp.sqrt(n - 1.0)

    def explained_variance_ratio(self):
        var = jnp.square(self._s)
        return var / self._total_sq

    def scores(self):
        """Projections U diag(S) (reference scores, PCA_class.hpp:86-88)."""
        return self._u * self._s[None, :]

    def loadings(self):
        """Right singular vectors V (reference loadings, :90-92)."""
        return self._v

    def project(self, data, n_components: Optional[int] = None):
        """Map new rows into PC space (reference projectToPCA, :94-97)."""
        x = jnp.asarray(data) - self._mean[None, :]
        if self._std is not None:
            x = x / jnp.where(self._std > 0, self._std, 1.0)[None, :]
        v = self._v if n_components is None else self._v[:, :n_components]
        return x @ v

    def reconstruct(self, scores_mat, n_components: Optional[int] = None):
        """Back-map scores to data space (reference reconstructFromPCA,
        :98-100)."""
        v = self._v if n_components is None else self._v[:, :n_components]
        x = jnp.asarray(scores_mat) @ v.T
        if self._std is not None:
            x = x * jnp.where(self._std > 0, self._std, 1.0)[None, :]
        return x + self._mean[None, :]

    def check_orthogonality(self) -> float:
        """||V^T V - I|| (reference checkOrthogonality, :144-148)."""
        k = self._v.shape[1]
        return float(jnp.linalg.norm(self._v.T @ self._v - jnp.eye(k, dtype=self._v.dtype)))

    def add_data(self, new_rows):
        """Append observations and recompute (reference addData, :58-62)."""
        self._assign(jnp.concatenate([self._raw, jnp.asarray(new_rows)], axis=0))
        self._initialize()
        return self

    # -- reporting ------------------------------------------------------
    def summary(self, feature_names: Optional[Sequence[str]] = None) -> str:
        """R-style importance-of-components table (reference summary(),
        PCA_class.hpp:150-190)."""
        sd = np.asarray(self.explained_variance())
        ratio = np.asarray(self.explained_variance_ratio())
        cum = np.cumsum(ratio)
        k = len(sd)
        buf = _io.StringIO()
        buf.write("Importance of components:\n")
        header = "".join(f"{'PC' + str(i + 1):>12}" for i in range(k))
        buf.write(f"{'':24}{header}\n")
        rows = [
            ("Standard deviation", sd),
            ("Proportion of Variance", ratio),
            ("Cumulative Proportion", cum),
        ]
        for label, vals in rows:
            line = "".join(f"{v:12.4f}" for v in vals)
            buf.write(f"{label:<24}{line}\n")
        if feature_names is not None:
            buf.write("\nLoadings:\n")
            v = np.asarray(self._v)
            buf.write(f"{'':16}" + "".join(f"{'PC' + str(i + 1):>12}" for i in range(v.shape[1])) + "\n")
            for name, row in zip(feature_names, v):
                buf.write(f"{name[:15]:<16}" + "".join(f"{x:12.4f}" for x in row) + "\n")
        return buf.getvalue()

    def save_results(self, path: str) -> None:
        """Write cumulative variance + scores + loadings (reference
        saveResults, PCA_class.hpp:102-141)."""
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        ratio = np.asarray(self.explained_variance_ratio())
        cum = np.cumsum(ratio)
        scores = np.asarray(self.scores())
        loadings = np.asarray(self.loadings())
        with open(path, "w") as f:
            f.write("# cumulative explained variance ratio\n")
            f.write(" ".join(f"{x:.12e}" for x in cum) + "\n")
            f.write(f"# scores ({scores.shape[0]} x {scores.shape[1]})\n")
            for row in scores:
                f.write(" ".join(f"{x:.12e}" for x in row) + "\n")
            f.write(f"# loadings ({loadings.shape[0]} x {loadings.shape[1]})\n")
            for row in loadings:
                f.write(" ".join(f"{x:.12e}" for x in row) + "\n")


def load_tourists_dataset(path: str):
    """tourists.txt: skip 3 leading categorical columns, keep 8 numeric
    (reference PCA/tests/pca_test.cpp:8-59)."""
    from rsvd_kamaneh_raganato_terrana_tpu.core.io import load_whitespace_dataset

    return load_whitespace_dataset(path, skip_cols=3)


def load_athletic_dataset(path: str):
    """dataset_athletic.txt: country label + 7 event times (reference
    PCA/tests/athletic_test.cpp)."""
    from rsvd_kamaneh_raganato_terrana_tpu.core.io import load_whitespace_dataset

    return load_whitespace_dataset(path, skip_cols=1)


class StreamingPCA:
    """One-pass PCA over an unbounded row stream, O(l * d) memory.

    The reference's ``addData`` (PCA_class.hpp:58-62) recomputes from all
    retained rows; this class never retains rows: a Frequent Directions
    sketch (rsvd/fd.py) absorbs the UNcentered stream with its
    deterministic Gram bound, a running mean/count tracks centering, and
    ``finalize`` eigendecomposes the mean-corrected sketch Gram

        C_hat = (S^T S - n mu mu^T) / (n - 1)

    — equal to the true sample covariance up to FD's additive
    ``||A - A_k||_F^2 / (l - k)`` (so for streams whose centered rank is
    below ``l`` the result matches batch PCA to roundoff).

    >>> sp = StreamingPCA(n_features=d, l=64)
    >>> for batch in stream:
    ...     sp.update(batch)
    >>> lam, components = sp.finalize(k=8)   # descending eigenpairs
    """

    def __init__(self, n_features: int, l: int = 64, dtype=jnp.float32):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.fd import (
            FrequentDirections,
        )

        self.d = int(n_features)
        self._fd = FrequentDirections(self.d, int(l), dtype=dtype)
        self._sum = np.zeros((self.d,), dtype=np.float64)
        self._n = 0

    def update(self, rows) -> "StreamingPCA":
        rows = np.asarray(rows)
        if rows.ndim == 1:
            rows = rows[None, :]
        self._sum += rows.sum(axis=0, dtype=np.float64)
        self._n += rows.shape[0]
        self._fd.update(rows)
        return self

    @property
    def n_seen(self) -> int:
        return self._n

    @property
    def mean(self) -> np.ndarray:
        return self._sum / max(self._n, 1)

    def finalize(self, k: Optional[int] = None):
        """Top-k eigenpairs of the estimated sample covariance:
        ``(lam: k, V: d x k)`` descending; lam are UNDER-estimates within
        FD's deterministic bound."""
        if self._n < 2:
            raise ValueError("need at least 2 rows")
        s = np.asarray(self._fd.sketch(), dtype=np.float64)
        mu = self.mean
        g = (s.T @ s - self._n * np.outer(mu, mu)) / (self._n - 1)
        g = 0.5 * (g + g.T)
        w, v = np.linalg.eigh(g)
        w, v = np.maximum(w[::-1], 0.0), v[:, ::-1]
        kk = min(k or self.d, self.d)
        return w[:kk], v[:, :kk]

    def project(self, rows, k: Optional[int] = None) -> np.ndarray:
        """Center new rows with the STREAM mean and project onto the
        current principal axes."""
        _, v = self.finalize(k)
        return (np.asarray(rows) - self.mean[None, :]) @ v
