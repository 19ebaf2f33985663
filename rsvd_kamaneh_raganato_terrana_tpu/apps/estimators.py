"""scikit-learn-compatible estimators over the TPU factorization engine.

Beyond-parity convenience layer: the reference's PCA is a bespoke C++
class driven by its own CLI (PCA/include/PCA_class.hpp:12-197); the
audience that would reach for it today lives in the sklearn API.  These
wrappers expose the framework's rSVD driver through the standard
fit / transform / fit_transform / inverse_transform contract with
sklearn attribute names (`components_`, `singular_values_`,
`explained_variance_ratio_`, ...), so they drop into sklearn Pipelines
and `clone()` — while the actual compute is this framework's jitted
TPU pipeline (sharded GEMM stage A + replicated tail), not scipy.

sklearn itself is optional: if importable, the classes subclass
BaseEstimator/TransformerMixin (full get_params/set_params/clone
support); otherwise they fall back to a minimal duck-typed base with
the same methods.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - exercised through the subclass machinery
    from sklearn.base import BaseEstimator, TransformerMixin
except Exception:  # sklearn not installed: duck-typed fallback

    class BaseEstimator:  # type: ignore[no-redef]
        def get_params(self, deep=True):
            import inspect

            keys = inspect.signature(type(self).__init__).parameters
            return {k: getattr(self, k) for k in keys if k != "self"}

        def set_params(self, **params):
            for k, v in params.items():
                setattr(self, k, v)
            return self

    class TransformerMixin:  # type: ignore[no-redef]
        def fit_transform(self, x, y=None, **kw):
            return self.fit(x, **kw).transform(x)


def _is_bcoo(x) -> bool:
    try:
        from jax.experimental import sparse as jsparse

        return isinstance(x, jsparse.JAXSparse)
    except Exception:
        return False


def _total_column_variance(x) -> float:
    """sum_j Var(X[:, j]) without densifying sparse inputs (sklearn's
    TruncatedSVD ratio denominator)."""
    if _is_bcoo(x):
        xs = x.sum_duplicates() if hasattr(x, "sum_duplicates") else x
        data = np.asarray(xs.data)
        col = np.asarray(xs.indices)[:, 1]
        n, nf = xs.shape
        sq = np.zeros(nf)
        cs = np.zeros(nf)
        np.add.at(sq, col, data * data)
        np.add.at(cs, col, data)
        return float((sq / n - (cs / n) ** 2).sum())
    return float(np.var(np.asarray(x), axis=0).sum())


class RandomizedSVD(TransformerMixin, BaseEstimator):
    """sklearn-style TruncatedSVD on the TPU rSVD driver.

    Mirrors ``sklearn.decomposition.TruncatedSVD(algorithm='randomized')``
    attribute-for-attribute (components_, singular_values_,
    explained_variance_[ratio_]); `transform(X) = X @ components_.T`.
    No centering — suitable for sparse/BCOO inputs too (the driver
    accepts them natively).
    """

    def __init__(self, n_components: int = 2, p: int = 10, q: int = 2,
                 method: str = "eigh", precision: str = "highest",
                 seed: int = 0):
        self.n_components = n_components
        self.p = p
        self.q = q
        self.method = method
        self.precision = precision
        self.seed = seed

    def fit(self, x, y=None):
        self.fit_transform(x)
        return self

    def fit_transform(self, x, y=None):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        u, s, v = rsvd(x, k=self.n_components, p=self.p, q=self.q,
                       method=self.method, precision=self.precision,
                       seed=self.seed)
        u, s, v = (np.asarray(u), np.asarray(s), np.asarray(v))
        scores = u * s[None, :]
        self.components_ = v.T                          # (k, n_features)
        self.singular_values_ = s
        self.explained_variance_ = np.var(scores, axis=0)
        # ratio vs TOTAL variance of X (sklearn semantics; honest under
        # truncation — same policy as apps/pca.py, PARITY.md 6b)
        full_var = _total_column_variance(x)
        self.explained_variance_ratio_ = (
            self.explained_variance_ / full_var if full_var > 0
            else np.zeros_like(s))
        self.n_features_in_ = x.shape[1]
        return scores

    def transform(self, x):
        if _is_bcoo(x):
            return np.asarray(x @ self.components_.T)
        return np.asarray(x) @ self.components_.T

    def inverse_transform(self, z):
        return np.asarray(z) @ self.components_


class RandomizedPCA(TransformerMixin, BaseEstimator):
    """sklearn-style PCA (mean-centering, optional unit-variance scaling
    like the reference's normalize flag, PCA_class.hpp:38-42) on the TPU
    rSVD driver.  Attributes follow ``sklearn.decomposition.PCA``:
    mean_, components_, singular_values_, explained_variance_[ratio_],
    noise_variance_ (0 for the truncated fit)."""

    def __init__(self, n_components: int = 2, scale: bool = False,
                 p: int = 10, q: int = 2, method: str = "eigh",
                 precision: str = "highest", seed: int = 0):
        self.n_components = n_components
        self.scale = scale
        self.p = p
        self.q = q
        self.method = method
        self.precision = precision
        self.seed = seed

    def fit(self, x, y=None):
        self.fit_transform(x)
        return self

    def fit_transform(self, x, y=None):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        x = np.asarray(x)
        if x.dtype not in (np.float32, np.float64):
            x = x.astype(np.float64)
        n = x.shape[0]
        self.mean_ = x.mean(axis=0)
        xc = x - self.mean_
        if self.scale:
            self.scale_ = xc.std(axis=0, ddof=1)
            self.scale_ = np.where(self.scale_ > 0, self.scale_, 1.0)
            xc = xc / self.scale_
        else:
            self.scale_ = None
        u, s, v = rsvd(xc, k=self.n_components, p=self.p, q=self.q,
                       method=self.method, precision=self.precision,
                       seed=self.seed)
        u, s, v = (np.asarray(u), np.asarray(s), np.asarray(v))
        self.components_ = v.T
        self.singular_values_ = s
        self.explained_variance_ = (s ** 2) / (n - 1)
        total_var = float((xc ** 2).sum()) / (n - 1)
        self.explained_variance_ratio_ = (
            self.explained_variance_ / total_var if total_var > 0
            else np.zeros_like(s))
        # sklearn PCA semantics: average variance in the discarded
        # dimensions (0 when nothing is discarded)
        n_rest = x.shape[1] - self.n_components
        self.noise_variance_ = (
            max(total_var - float(self.explained_variance_.sum()), 0.0)
            / n_rest if n_rest > 0 else 0.0)
        self.n_features_in_ = x.shape[1]
        return u * s[None, :]

    def _center(self, x):
        xc = np.asarray(x) - self.mean_
        return xc / self.scale_ if self.scale_ is not None else xc

    def transform(self, x):
        return self._center(x) @ self.components_.T

    def inverse_transform(self, z):
        xr = np.asarray(z) @ self.components_
        if self.scale_ is not None:
            xr = xr * self.scale_
        return xr + self.mean_
