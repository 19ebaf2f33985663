"""Gaussian-process regression with hierarchical kernel compression.

Beyond-parity application tying the kernel machinery (apps/kpca.py's
kernel functions), the HODLR compressor (rsvd/hodlr.py), and the SLQ
log-det estimator (rsvd/slq.py) into the classic O(n^2)-memory-bound
workload: GP posterior inference.

    mean  = K_*  (K + sigma^2 I)^{-1} y
    var   = k_** - diag(K_*  (K + sigma^2 I)^{-1} K_*^T)
    logML = -1/2 [ y^T alpha + logdet(K + sigma^2 I) + n log 2 pi ]

The train-kernel solve runs through `hodlr_solve` (CG on the
O(kn log n) hierarchical matvec with leaf-block preconditioning)
instead of an O(n^3) Cholesky, and the log-marginal-likelihood's
log-det through stochastic Lanczos quadrature — every piece is the
framework's randomized machinery, nothing dense beyond the n x m test
cross-kernel.

1D/low-D note: HODLR off-diagonal blocks are numerically low-rank when
the inputs are ordered so that index distance tracks metric distance
(sort 1D inputs; use a space-filling-curve order in low D).
`GP.fit` sorts 1D inputs automatically.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import (
    hodlr_build,
    hodlr_build_implicit,
    hodlr_matvec,
    hodlr_solve,
)


def _hodlr_apply(v, h):
    """Stable module-level operator for slq_trace (its callable is a
    static jit argument keyed by identity — rsvd/slq.py docstring)."""
    return hodlr_matvec(h, v)


def rbf_kernel(x1, x2, lengthscale: float = 0.2, variance: float = 1.0):
    """k(x, x') = variance * exp(-||x - x'||^2 / (2 l^2)); x1 (n, d),
    x2 (m, d) -> (n, m).  Sq-norms + one GEMM (MXU) rather than the
    (n, m, d) broadcast difference — at the large n this module targets
    the broadcast intermediate alone would dwarf the kernel matrix."""
    from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import (
        DOT_PRECISION,
    )

    x1 = jnp.asarray(x1)
    x2 = jnp.asarray(x2)
    s1 = jnp.sum(x1 * x1, axis=1)
    s2 = jnp.sum(x2 * x2, axis=1)
    d2 = jnp.maximum(
        s1[:, None] + s2[None, :]
        - 2.0 * jnp.matmul(x1, x2.T, precision=DOT_PRECISION), 0.0)
    return variance * jnp.exp(-0.5 * d2 / (lengthscale * lengthscale))


class GP:
    """GP regression with an optional HODLR-compressed train kernel.

    solver='hodlr' (default above `dense_threshold` points) compresses
    K + sigma^2 I hierarchically and solves by preconditioned CG;
    solver='dense' is the exact Cholesky reference path.
    """

    def __init__(self, kernel: Optional[Callable] = None,
                 noise: float = 1e-2, solver: str = "auto",
                 levels: int = 4, rank: int = 24,
                 dense_threshold: int = 512,
                 implicit_threshold: int = 8192):
        self.kernel = kernel or rbf_kernel
        self.noise = noise
        self.solver = solver
        self.levels = levels
        self.rank = rank
        self.dense_threshold = dense_threshold
        # above this, the n x n train kernel is NEVER materialized: the
        # HODLR factors build from kernel-slice callbacks
        # (hodlr_build_implicit) and the log-marginal-likelihood's
        # log-det runs SLQ on the hierarchical matvec — the O(n^2)
        # kernel matrix stops being the memory ceiling
        self.implicit_threshold = implicit_threshold

    @staticmethod
    def _hodlr_lambda_max(h, n: int, iters: int = 8) -> float:
        """Crude power-iteration lambda_max of the compressed operator —
        only sets the SCALE of the NaN-retry jitter, so 8 iterations is
        plenty."""
        v = jnp.ones((n,), h.leaves.dtype) / float(np.sqrt(n))
        nrm = jnp.ones((), h.leaves.dtype)
        for _ in range(iters):
            w = hodlr_matvec(h, v)
            nrm = jnp.linalg.norm(w)
            v = w / jnp.maximum(nrm, jnp.finfo(w.dtype).tiny)
        return float(nrm)

    def _resolve_solver(self, n: int) -> str:
        if self.solver != "auto":
            return self.solver
        return "hodlr" if n > self.dense_threshold else "dense"

    def fit(self, x, y):
        x = jnp.atleast_2d(jnp.asarray(x))
        if x.shape[0] == 1 and x.size > 1:
            x = x.T
        y = jnp.asarray(y)
        if x.shape[1] == 1:
            order = jnp.argsort(x[:, 0])
            x, y = x[order], y[order]
        n = x.shape[0]
        self.x_train_ = x
        self.y_train_ = y
        # clear any previous fit's solver state: predict() dispatches on
        # which attribute exists, so a stale factor from an earlier fit
        # with the other solver must not survive a refit
        for attr in ("_cho", "_hodlr"):
            if hasattr(self, attr):
                delattr(self, attr)
        self._implicit = False
        mode = self._resolve_solver(n)
        if mode == "hodlr":
            levels = self.levels
            while n % (2 ** levels) or n // 2 ** levels < 2 * self.rank:
                levels -= 1
                if levels == 0:
                    break
            if levels >= 1:
                if n > self.implicit_threshold:
                    # beyond-memory regime: K never materializes — each
                    # HODLR block is a kernel slice computed on demand
                    kern, noise2 = self.kernel, self.noise ** 2

                    def block_fn(i0, j0, rows, cols):
                        blk = kern(x[i0:i0 + rows], x[j0:j0 + cols])
                        if i0 == j0 and rows == cols:  # leaf: + sigma^2 I
                            blk = blk + noise2 * jnp.eye(rows,
                                                         dtype=blk.dtype)
                        return blk

                    h = hodlr_build_implicit(block_fn, n, levels=levels,
                                             k=self.rank)
                    self._implicit = True
                else:
                    kmat = (self.kernel(x, x)
                            + self.noise ** 2 * jnp.eye(n, dtype=x.dtype))
                    h = hodlr_build(kmat, levels=levels, k=self.rank)
                self.alpha_ = hodlr_solve(h, y)
                jitter = 0.0
                if not bool(jnp.all(jnp.isfinite(self.alpha_))):
                    # The compressed K + sigma^2 I can be slightly
                    # INDEFINITE when the compression floor exceeds
                    # sigma^2 (measured f32 at n=2048: lambda_min
                    # -0.0077 vs the 3e-5/entry rSVD floor — bounded by
                    # ~n*eps*lambda_max), which sends CG to NaN.  Retry
                    # with escalating diagonal jitter on the LEAVES
                    # (extra ridge noise — bounded accuracy loss beats
                    # a NaN fit).
                    # escalate from 1/16 of the worst-case bound: the
                    # actual indefiniteness ||E||_2 is usually well
                    # below n*eps*lam_max (measured 32768: bound 3.25),
                    # and a tighter jitter keeps the posterior variance
                    # honest; each failed step costs one NaN CG solve
                    lam_max = self._hodlr_lambda_max(h, n)
                    base = (np.finfo(np.dtype(str(x.dtype))).eps
                            * n * lam_max)
                    for mult in (0.0625, 0.25, 1.0, 4.0, 16.0):
                        jitter = mult * base
                        eye = jitter * jnp.eye(h.leaves.shape[1],
                                               dtype=h.leaves.dtype)
                        h_j = h._replace(leaves=h.leaves + eye[None])
                        self.alpha_ = hodlr_solve(h_j, y)
                        if bool(jnp.all(jnp.isfinite(self.alpha_))):
                            h = h_j
                            break
                    else:
                        # every escalation failed: the stored operator is
                        # the UN-jittered h, so solver_used_ must not
                        # claim jitter=16*base — reset and surface the
                        # NaN fit instead of returning silently
                        jitter = 0.0
                        raise FloatingPointError(
                            "GP fit: CG produced non-finite alpha even "
                            f"after jitter escalation to 16*{base:.2e}; "
                            "the compressed kernel is too indefinite — "
                            "raise rank, noise, or use the dense path")
                self._hodlr = h
                self.solver_used_ = (
                    f"hodlr(levels={levels}, k={self.rank}"
                    + (", implicit" if self._implicit else "")
                    + (f", jitter={jitter:.2e}" if jitter else "") + ")")
                return self
            mode = "dense"              # too small to split: exact path
        kmat = self.kernel(x, x) + self.noise ** 2 * jnp.eye(n, dtype=x.dtype)
        c = jax.scipy.linalg.cho_factor(kmat)
        self.alpha_ = jax.scipy.linalg.cho_solve(c, y)
        self._cho = c
        self.solver_used_ = "dense"
        return self

    def predict(self, x_test, return_var: bool = False):
        x_test = jnp.atleast_2d(jnp.asarray(x_test))
        if x_test.shape[1] != self.x_train_.shape[1]:
            x_test = x_test.T
        k_star = self.kernel(x_test, self.x_train_)      # m x n
        mean = k_star @ self.alpha_
        if not return_var:
            return mean
        if hasattr(self, "_cho"):
            w = jax.scipy.linalg.cho_solve(self._cho, k_star.T)
        else:
            w = jax.vmap(lambda col: hodlr_solve(self._hodlr, col),
                         in_axes=1, out_axes=1)(k_star.T)
        k_ss = jax.vmap(lambda xt: self.kernel(xt[None], xt[None])[0, 0]
                        )(x_test)
        var = jnp.maximum(k_ss - jnp.sum(k_star.T * w, axis=0),
                          0.0) + self.noise ** 2
        return mean, var

    def log_marginal_likelihood(self, num_probes: int = 8,
                                steps: int = 30, seed: int = 0) -> float:
        """-1/2 [y^T alpha + logdet(K + s^2 I) + n log 2pi]; log-det by
        SLQ — on the dense train kernel, or matrix-free on the HODLR
        matvec for implicit fits (where the dense K was never formed;
        the log-det then inherits the compressor's truncation error,
        consistent with the solve path it scores)."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.slq import logdet_psd

        n = self.x_train_.shape[0]
        if getattr(self, "_implicit", False):
            ld = float(logdet_psd(_hodlr_apply, seed=seed,
                                  num_probes=num_probes, steps=steps,
                                  n=n, dtype=self.x_train_.dtype,
                                  operands=(self._hodlr,)))
        else:
            kmat = (self.kernel(self.x_train_, self.x_train_)
                    + self.noise ** 2
                    * jnp.eye(n, dtype=self.x_train_.dtype))
            ld = float(logdet_psd(kmat, seed=seed, num_probes=num_probes,
                                  steps=steps))
        fit = float(self.y_train_ @ self.alpha_)
        return -0.5 * (fit + ld + n * float(np.log(2 * np.pi)))
