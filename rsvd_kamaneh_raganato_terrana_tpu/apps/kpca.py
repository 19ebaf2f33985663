"""Kernel PCA with randomized eigensolvers (beyond-parity application).

The reference's PCA (PCA_class.hpp:33-47) is linear: covariance +
spectrum.  Kernel PCA generalizes it to nonlinear feature spaces via the
kernel trick — and its computational core is EXACTLY the matrix family
this framework's PSD machinery targets: an n x n centered kernel Gram,
symmetric PSD with (for smooth kernels) fast spectral decay, needing only
its top-k eigenpairs.  The `auto` solver uses exact eigh below n=1024
(where its cost is trivial) and the power-iterated Rayleigh-Ritz sketch
(rsvd/nystrom.py::reigh) above.

TPU shape: every kernel here is GEMM-dominated (the RBF distance matrix
is ||x||^2 + ||y||^2 - 2 x y^T — one MXU GEMM + rank-1 corrections, no
pairwise loops); centering is rank-1 updates; the eigensolve is either a
replicated `eigh` or the randomized pipeline.  fit and transform each
dispatch ONE jitted program (kernel + centering + eigensolve + scaling
fused — eager small-op chains cost ~30-80 ms/primitive through a relay
transport, CLAUDE.md).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import (
    _nystrom_impl,
    _reigh_impl,
)

_KERNELS = ("rbf", "poly", "linear")


def _mm(a, b):
    return jnp.matmul(a, b, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def _kernel(x, y, kernel: str, gamma, degree: int, coef0):
    """Traced kernel block k(x_i, y_j) — called inside the jitted fit and
    transform programs."""
    if kernel == "linear":
        return _mm(x, y.T)
    if kernel == "poly":
        return (gamma * _mm(x, y.T) + coef0) ** degree
    # rbf: ||x_i - y_j||^2 = ||x_i||^2 + ||y_j||^2 - 2 <x_i, y_j>
    xx = jnp.sum(x * x, axis=1)[:, None]
    yy = jnp.sum(y * y, axis=1)[None, :]
    d2 = jnp.maximum(xx + yy - 2.0 * _mm(x, y.T), 0.0)
    return jnp.exp(-gamma * d2)


@partial(jax.jit, static_argnames=("kernel", "degree"))
def _kernel_jit(x, y, kernel: str, gamma, degree: int, coef0):
    return _kernel(x, y, kernel, gamma, degree, coef0)


def kernel_matrix(x, y, kernel: str = "rbf", gamma: Optional[float] = None,
                  degree: int = 3, coef0: float = 1.0):
    """K[i, j] = k(x_i, y_j) for rows of x (n x d) and y (m x d) — one
    jitted dispatch."""
    if kernel not in _KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}")
    x = jnp.asarray(x)
    y = jnp.asarray(y, dtype=x.dtype)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return _kernel_jit(x, y, kernel, jnp.asarray(gamma, x.dtype), degree,
                       jnp.asarray(coef0, x.dtype))


def _finish(w, v, kc):
    """Shared fit tail: clamp the spectrum, zero rank-deficient
    components, and build scores.  Components whose eigenvalue is
    negligible relative to the leading one get a ZERO projection scale —
    dividing by sqrt(~0) would emit huge garbage in transform (the
    centered kernel's rank is at most the data's intrinsic rank)."""
    w = jnp.maximum(w, 0.0)
    floor = jnp.finfo(kc.dtype).eps * kc.shape[0] * jnp.maximum(w[0], 0.0)
    ok = w > floor
    inv_sqrt = jnp.where(ok, 1.0 / jnp.sqrt(jnp.where(ok, w, 1.0)), 0.0)
    scores = v * jnp.sqrt(w)[None, :] * ok
    return w * ok, v, inv_sqrt, scores


@partial(jax.jit, static_argnames=("kernel", "degree", "k", "solver", "p"))
def _fit_impl(x, kernel: str, gamma, degree: int, coef0, k: int,
              solver: str, p: int, seed):
    kmat = _kernel(x, x, kernel, gamma, degree, coef0)
    col_means = jnp.mean(kmat, axis=0)
    tot = jnp.mean(kmat)
    row = jnp.mean(kmat, axis=1, keepdims=True)
    kc = kmat - row - col_means[None, :] + tot       # feature-space center
    kc = 0.5 * (kc + kc.T)
    if solver == "exact":
        w, v = jnp.linalg.eigh(kc)
        w, v = w[::-1][:k], v[:, ::-1][:, :k]
    elif solver == "randomized":
        w, v = _reigh_impl(kc, k=k, p=p, q=2, seed=seed,
                           precision="highest")
    else:                                            # nystrom (one pass)
        v, w = _nystrom_impl(kc, k=k, p=p, seed=seed,
                             precision="highest")
    return (col_means, tot) + _finish(w, v, kc)


@partial(jax.jit, static_argnames=("kernel", "degree"))
def _transform_impl(y, x, kernel: str, gamma, degree: int, coef0,
                    col_means, tot, alphas, inv_sqrt):
    k_new = _kernel(y, x, kernel, gamma, degree, coef0)
    row = jnp.mean(k_new, axis=1, keepdims=True)
    kc = k_new - row - col_means[None, :] + tot
    return _mm(kc, alphas) * inv_sqrt[None, :]


class KernelPCA:
    """Nonlinear PCA via the kernel trick, randomized eigensolver inside.

    >>> kp = KernelPCA(n_components=8, kernel="rbf", gamma=0.5).fit(x)
    >>> z = kp.transform(x_new)          # (m, 8) kernel principal scores

    ``solver``: 'exact' (replicated eigh), 'randomized' (power-iterated
    Rayleigh-Ritz, rsvd/nystrom.py::reigh — matches exact to ~6 digits on
    kernel spectra), 'nystrom' (ONE streamed pass over K, fastest, biased
    low on slowly-decaying spectra unless p is generous), or 'auto'
    (exact below n=1024 where eigh's cost is trivial, randomized above).
    Attributes after fit: ``eigenvalues_`` (k, zeroed past the kernel's
    numerical rank), ``alphas_`` (n x k kernel-space eigenvectors),
    ``scores_`` (n x k, = alphas * sqrt(eigenvalues), the training
    projections).  Components beyond the centered kernel's numerical
    rank transform to exactly zero (not noise).
    """

    def __init__(self, n_components: int, kernel: str = "rbf",
                 gamma: Optional[float] = None, degree: int = 3,
                 coef0: float = 1.0, solver: str = "auto", p: int = 10,
                 seed: int = 0):
        self.k = int(n_components)
        self.kernel = kernel
        self.gamma = gamma
        self.degree = degree
        self.coef0 = coef0
        self.solver = solver
        self.p = p
        self.seed = seed

    def _params(self, dtype):
        gamma = self.gamma if self.gamma is not None else 1.0 / self._d
        return (jnp.asarray(gamma, dtype), self.degree,
                jnp.asarray(self.coef0, dtype))

    def fit(self, x) -> "KernelPCA":
        if self.kernel not in _KERNELS:
            raise ValueError(f"unknown kernel {self.kernel!r}")
        x = jnp.asarray(x)
        self._x = x
        self._d = x.shape[1]
        solver = self.solver
        if solver == "auto":
            solver = "exact" if x.shape[0] <= 1024 else "randomized"
        if solver not in ("exact", "randomized", "nystrom"):
            raise ValueError(f"unknown solver {solver!r}")
        gamma, degree, coef0 = self._params(x.dtype)
        (self._col_means, self._tot, self.eigenvalues_, self.alphas_,
         self._inv_sqrt, self.scores_) = _fit_impl(
            x, self.kernel, gamma, degree, coef0, self.k, solver,
            self.p, self.seed)
        return self

    def transform(self, y) -> jax.Array:
        """Project new rows onto the kernel principal axes:
        z = K_c(new, train) alphas / sqrt(eigenvalues), with
        rank-deficient components pinned to zero."""
        gamma, degree, coef0 = self._params(self._x.dtype)
        return _transform_impl(
            jnp.asarray(y, self._x.dtype), self._x, self.kernel, gamma,
            degree, coef0, self._col_means, self._tot, self.alphas_,
            self._inv_sqrt)

    def fit_transform(self, x) -> jax.Array:
        return self.fit(x).scores_


@partial(jax.jit, static_argnames=("kernel", "degree"))
def _nystrom_feature_map(x, landmarks, kernel: str, gamma, degree: int,
                         coef0):
    k_ll = _kernel(landmarks, landmarks, kernel, gamma, degree, coef0)
    k_ll = 0.5 * (k_ll + k_ll.T)
    w, u = jnp.linalg.eigh(k_ll)
    # pseudo-inverse square root: drop directions below a spectrum-
    # relative floor (rank-deficient landmark sets are common)
    floor = jnp.finfo(x.dtype).eps * k_ll.shape[0] * jnp.maximum(
        w[-1], 0.0)
    inv_sqrt = jnp.where(w > floor, 1.0 / jnp.sqrt(jnp.where(
        w > floor, w, 1.0)), 0.0)
    k_xl = _kernel(x, landmarks, kernel, gamma, degree, coef0)
    return _mm(_mm(k_xl, u), jnp.diag(inv_sqrt))


def nystrom_features(x, landmarks, kernel: str = "rbf",
                     gamma: Optional[float] = None, degree: int = 3,
                     coef0: float = 1.0) -> jax.Array:
    """Data-dependent kernel feature map (Williams-Seeger Nyström):
    z(x) = K(x, L) K(L, L)^{-1/2} for a landmark set L (rows), so
    z(x) z(y)^T ~ k(x, y) with error set by how well the landmarks cover
    the data — usually far fewer features than RFF for the same accuracy
    on clustered data, at the cost of a landmark pass.  Combine with
    :func:`rsvd.interp.leverage_sample` to pick landmarks by importance.
    One jitted program: two kernel GEMMs + a replicated landmark eigh.
    """
    if kernel not in _KERNELS:
        raise ValueError(f"unknown kernel {kernel!r}")
    x = jnp.asarray(x)
    landmarks = jnp.asarray(landmarks, x.dtype)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    return _nystrom_feature_map(x, landmarks, kernel,
                                jnp.asarray(gamma, x.dtype), degree,
                                jnp.asarray(coef0, x.dtype))


@partial(jax.jit, static_argnames=("n_features",))
def rff_features(x, n_features: int = 256, gamma: float = 1.0, seed=0
                 ) -> jax.Array:
    """Random Fourier features for the RBF kernel (Rahimi-Recht 2007):
    z(x) (n x D) with E[z(x) z(y)^T] = exp(-gamma ||x - y||^2), error
    O(1/sqrt(D)) uniformly.

    The scalable companion to :class:`KernelPCA`: where the exact kernel
    Gram is n x n, RFF maps the data to an explicit D-dimensional feature
    space — run LINEAR PCA (apps/pca.py, rSVD fast path) or any linear
    model on z(x) and the kernel is approximated without ever forming the
    Gram.  One GEMM + cos, MXU-dense, deterministic in the seed.
    """
    from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed

    x = jnp.asarray(x)
    kw, kb = jax.random.split(key_from_seed(seed))
    # k(x,y) = exp(-gamma d^2) is the Gaussian kernel with sigma^2 =
    # 1/(2 gamma); its spectral measure is N(0, 2 gamma I)
    w = jax.random.normal(kw, (x.shape[1], n_features), x.dtype) * \
        jnp.sqrt(jnp.asarray(2.0 * gamma, x.dtype))
    b = jax.random.uniform(kb, (n_features,), x.dtype, 0.0,
                           2.0 * jnp.pi)
    proj = _mm(x, w) + b[None, :]
    return jnp.sqrt(jnp.asarray(2.0 / n_features, x.dtype)) * jnp.cos(proj)
