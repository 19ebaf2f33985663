"""Kernel PCA with randomized eigensolvers (beyond-parity application).

The reference's PCA (PCA_class.hpp:33-47) is linear: covariance +
spectrum.  Kernel PCA generalizes it to nonlinear feature spaces via the
kernel trick — and its computational core is EXACTLY the matrix family
this framework's PSD machinery targets: an n x n centered kernel Gram,
symmetric PSD with (for smooth kernels) fast spectral decay, needing only
its top-k eigenpairs.  The `auto` solver uses the one-pass stabilized
Nystrom sketch (rsvd/nystrom.py) above the exact-eigh crossover.

TPU shape: every kernel here is GEMM-dominated (the RBF distance matrix
is ||x||^2 + ||y||^2 - 2 x y^T — one MXU GEMM + rank-1 corrections, no
pairwise loops); centering is rank-1 updates; the eigensolve is either a
replicated `eigh` or the Nystrom pipeline.  fit/transform are each one
jitted program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.nystrom import nystrom_psd, reigh


def _mm(a, b):
    return jnp.matmul(a, b, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def kernel_matrix(x, y, kernel: str = "rbf", gamma: Optional[float] = None,
                  degree: int = 3, coef0: float = 1.0):
    """K[i, j] = k(x_i, y_j) for rows of x (n x d) and y (m x d)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y, dtype=x.dtype)
    if gamma is None:
        gamma = 1.0 / x.shape[1]
    if kernel == "linear":
        return _mm(x, y.T)
    if kernel == "poly":
        return (gamma * _mm(x, y.T) + coef0) ** degree
    if kernel == "rbf":
        # ||x_i - y_j||^2 = ||x_i||^2 + ||y_j||^2 - 2 <x_i, y_j>: one GEMM
        xx = jnp.sum(x * x, axis=1)[:, None]
        yy = jnp.sum(y * y, axis=1)[None, :]
        d2 = jnp.maximum(xx + yy - 2.0 * _mm(x, y.T), 0.0)
        return jnp.exp(-gamma * d2)
    raise ValueError(f"unknown kernel {kernel!r}")


@jax.jit
def _center_train(k):
    """Feature-space centering: K_c = (I - 1/n) K (I - 1/n) as rank-1
    updates (Scholkopf-Smola-Muller 1998, eq. 4.12)."""
    row = jnp.mean(k, axis=1, keepdims=True)
    col = jnp.mean(k, axis=0, keepdims=True)
    tot = jnp.mean(k)
    return k - row - col + tot


@jax.jit
def _center_cross(k_new, col_means, tot):
    """Center a cross-kernel block k(new, train) against the TRAINING
    feature mean: rows use the new block's own row means, columns the
    stored training column means."""
    row = jnp.mean(k_new, axis=1, keepdims=True)
    return k_new - row - col_means[None, :] + tot


class KernelPCA:
    """Nonlinear PCA via the kernel trick, randomized eigensolver inside.

    >>> kp = KernelPCA(n_components=8, kernel="rbf", gamma=0.5).fit(x)
    >>> z = kp.transform(x_new)          # (m, 8) kernel principal scores

    ``solver``: 'exact' (replicated eigh), 'randomized' (power-iterated
    Rayleigh-Ritz, rsvd/nystrom.py::reigh — matches exact to ~6 digits on
    kernel spectra), 'nystrom' (ONE streamed pass over K, fastest, biased
    low on slowly-decaying spectra unless p is generous), or 'auto'
    (exact below n=1024 where eigh's cost is trivial, randomized above).
    Attributes after fit: ``eigenvalues_`` (k,), ``alphas_`` (n x k,
    unit-norm kernel-space eigenvectors), ``scores_`` (n x k,
    = alphas * sqrt(eigenvalues), the training projections).
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

    def fit(self, x) -> "KernelPCA":
        x = jnp.asarray(x)
        self._x = x
        kmat = kernel_matrix(x, x, self.kernel, self.gamma, self.degree,
                             self.coef0)
        # stored for transform-time centering
        self._col_means = jnp.mean(kmat, axis=0)
        self._tot = jnp.mean(kmat)
        kc = _center_train(kmat)
        n = kc.shape[0]
        solver = self.solver
        if solver == "auto":
            solver = "exact" if n <= 1024 else "randomized"
        if solver == "exact":
            w, v = jnp.linalg.eigh(0.5 * (kc + kc.T))
            w, v = w[::-1][: self.k], v[:, ::-1][:, : self.k]
            w = jnp.maximum(w, 0.0)
        elif solver == "randomized":
            w, v = reigh(0.5 * (kc + kc.T), self.k, p=self.p, q=2,
                         seed=self.seed)
            w = jnp.maximum(w, 0.0)
        elif solver == "nystrom":
            v, w = nystrom_psd(0.5 * (kc + kc.T), self.k, p=self.p,
                               seed=self.seed)
        else:
            raise ValueError(f"unknown solver {solver!r}")
        self.eigenvalues_ = w
        self.alphas_ = v
        self.scores_ = v * jnp.sqrt(w)[None, :]
        return self

    def transform(self, y) -> jax.Array:
        """Project new rows onto the kernel principal axes:
        z = K_c(new, train) alphas / sqrt(eigenvalues)."""
        k_new = kernel_matrix(jnp.asarray(y, self._x.dtype), self._x,
                              self.kernel, self.gamma, self.degree,
                              self.coef0)
        kc = _center_cross(k_new, self._col_means, self._tot)
        safe = jnp.sqrt(jnp.maximum(self.eigenvalues_, 1e-30))
        return _mm(kc, self.alphas_) / safe[None, :]

    def fit_transform(self, x) -> jax.Array:
        return np.asarray(self.fit(x).scores_)
