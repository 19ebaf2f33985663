"""Method-dispatched SVD engine.

The TPU counterpart of the reference's header-only ``SVD<SVDMethod>``
template class (include/SVD_class.hpp:28-97): an enum of three engines —
Jacobi, Power, ParallelJacobi — behind one interface with optional
truncation rank r.  The reference dispatched with ``if constexpr``; here
the dispatch picks a jitted kernel:

- ``Jacobi``          -> one-sided tournament Jacobi, VPU scatter rotations
                         (linalg/jacobi.py), the analogue of `jacobiSVD`.
- ``ParallelJacobi``  -> same sweeps with rotation rounds applied as MXU
                         GEMMs — the blocked/parallel variant standing in
                         for the OpenMP weight-sorted `ParallelJacobiSVD`.
- ``Power``           -> power iteration with deflation (linalg/power.py).

API parity notes: the class form mirrors the reference ctor
``SVD(data, r=0)`` + ``compute()`` + ``getU/getS/getV`` so ported user code
reads the same; the functional `svd()` is the idiomatic JAX entry point.
Unlike the reference, V is returned in the standard orientation for every
method (the reference's Power path returned V transposed —
SVD_class.hpp:214 — and made callers compensate; we do not replicate that).
"""

from __future__ import annotations

import enum
from typing import Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import jacobi_svd
from rsvd_kamaneh_raganato_terrana_tpu.linalg.power import power_svd


class SVDMethod(enum.Enum):
    Jacobi = "jacobi"
    Power = "power"
    ParallelJacobi = "parallel_jacobi"
    # TPU fast path beyond the reference's three engines: one eigh of the
    # small-side Gram (accuracy ~sqrt(eps) for trailing singular values —
    # fine for rSVD tails where the spectrum is truncated anyway).
    GramEigh = "eigh"
    # Same Gram route but the eigh runs as ONE Pallas kernel launch
    # (linalg/pallas_kernels.eigh_small) instead of XLA's multi-kernel
    # tridiagonalization — trades ~f32-eps accuracy for a single-dispatch
    # tail on latency-bound pipelines.
    GramEighPallas = "eigh_pallas"
    # XLA's built-in SVD (QDWH-based on TPU — polar decomposition via
    # MXU GEMM iterations).  The measured production engine for full
    # decompositions: bench_results/svd_engines.csv shows it 6-100x
    # faster than the Jacobi engines at n >= 512 with the best accuracy
    # of any engine at every condition number tested.
    XLA = "xla"
    # Data-driven dispatch (see svd() for the policy and the table that
    # set it).
    Auto = "auto"

    @classmethod
    def parse(cls, value) -> "SVDMethod":
        if isinstance(value, cls):
            return value
        return cls(str(value).lower())


def _gram_eigh_svd(a, eigh_fn=jnp.linalg.eigh):
    """SVD via eigendecomposition of the small-side Gram matrix: a single
    batched-friendly eigh + one GEMM — minimal sequential depth on TPU.

    ``eigh_fn`` must follow the ``jnp.linalg.eigh`` contract (ascending
    eigenvalues, eigenvectors in columns)."""
    m, n = a.shape
    dtype = a.dtype
    if dtype in (jnp.bfloat16, jnp.float16):
        # no low-precision eigh kernel; factor in f32, return input dtype
        u, s, v = _gram_eigh_svd(a.astype(jnp.float32), eigh_fn)
        return u.astype(dtype), s.astype(dtype), v.astype(dtype)
    if m <= n:
        g = jnp.matmul(a, a.T, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST)
        lam, u = eigh_fn(g)                   # ascending
        lam = jnp.maximum(lam[::-1], 0.0)
        u = u[:, ::-1]
        s = jnp.sqrt(lam)
        safe = jnp.maximum(s, jnp.finfo(dtype).tiny)
        v = jnp.matmul(a.T, u, preferred_element_type=dtype,
                       precision=jax.lax.Precision.HIGHEST) / safe[None, :]
        v = jnp.where(s[None, :] > 0, v, 0.0)
        return u, s, v
    v, s, u = _gram_eigh_svd(a.T, eigh_fn)
    return u, s, v


def svd(
    a,
    method: SVDMethod | str = SVDMethod.Jacobi,
    r: int = 0,
    **kwargs,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute A = U diag(s) V^T; truncate to rank ``r`` if r > 0
    (reference semantics: r=0 means full min(m,n) decomposition).

    ``method='auto'`` is the data-driven production dispatch
    (bench_results/svd_engines.csv, measured on TPU v5-lite over
    spectra with condition number 1..1e6 at every n in {512..4096} —
    the 4096 cond >= 1e3 cells measured via the chunked-dispatch
    engine, so no threshold rests on extrapolation): tournament Jacobi
    via GEMM rounds for tiny factors (single fused program, exact to
    f64-level), XLA's QDWH SVD above — it is both the fastest and the
    most accurate engine at every n >= 512 tested (e.g. n=4096 cond
    1e6: 1.05 s vs 201 s chunked block Jacobi, with ~40x better sigma
    accuracy).  The Jacobi/Power engines remain for reference parity
    (SVD_class.hpp:28-97 dispatches the same names).
    """
    method = SVDMethod.parse(method)
    a = jnp.asarray(a)
    if jnp.iscomplexobj(a) and method is not SVDMethod.XLA:
        raise TypeError("the Jacobi/Power/Gram engines are real-only "
                        "(plain transposes throughout, like the "
                        "reference's Eigen::MatrixXd stack); use "
                        "method='xla' for complex input")
    if method is SVDMethod.Auto:
        method = (SVDMethod.ParallelJacobi if min(a.shape) <= 256
                  else SVDMethod.XLA)
    if method is SVDMethod.XLA:
        # engine kwargs (Jacobi tolerances etc.) have no XLA counterpart;
        # dropping them keeps svd(a, 'auto', tol=...) working at every
        # input size instead of crashing past the dispatch threshold
        u, s, vt = jnp.linalg.svd(a, full_matrices=False)
        # numpy contract: a = u @ diag(s) @ vt with vt = V^H; our V has
        # the right singular vectors as columns (conj is a no-op for the
        # real dtypes the rest of the stack is restricted to)
        v = jnp.conj(vt).T
    elif method is SVDMethod.Jacobi:
        u, s, v = jacobi_svd(a, apply="scatter", **kwargs)
    elif method is SVDMethod.ParallelJacobi:
        # measured crossover: GEMM rotation rounds for small n, scatter
        # to 512, block tournament above (see jacobi_svd's dispatch)
        u, s, v = jacobi_svd(a, apply="auto", **kwargs)
    elif method is SVDMethod.Power:
        k = r if r > 0 else min(a.shape)
        res = power_svd(a, k=k, **kwargs)
        u, s, v = res.u, res.s, res.v
    elif method is SVDMethod.GramEigh:
        u, s, v = _gram_eigh_svd(a)
    elif method is SVDMethod.GramEighPallas:
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
            eigh_small,
        )

        u, s, v = _gram_eigh_svd(a, eigh_small)
    else:  # pragma: no cover
        raise ValueError(method)
    if r > 0:
        u, s, v = u[:, :r], s[:r], v[:, :r]
    return u, s, v


class SVD:
    """Class-style engine mirroring the reference API
    (include/SVD_class.hpp:35-71)."""

    def __init__(self, data, r: int = 0,
                 method: SVDMethod | str = SVDMethod.Jacobi):
        self._data = jnp.asarray(data)
        self._r = int(r)
        self._method = SVDMethod.parse(method)
        self._u = self._s = self._v = None

    # -- reference API ----------------------------------------------------
    def setData(self, data):  # noqa: N802  (reference name)
        self._data = jnp.asarray(data)
        self._u = self._s = self._v = None
        return self

    def compute(self, **kwargs) -> "SVD":
        self._u, self._s, self._v = svd(
            self._data, self._method, self._r, **kwargs
        )
        return self

    def getU(self):  # noqa: N802
        self._ensure()
        return self._u

    def getS(self):  # noqa: N802
        self._ensure()
        return self._s

    def getV(self):  # noqa: N802
        self._ensure()
        return self._v

    # -- conveniences -----------------------------------------------------
    @property
    def rank(self) -> int:
        return self._r

    @property
    def method(self) -> SVDMethod:
        return self._method

    def reconstruction(self):
        self._ensure()
        return (self._u * self._s[None, :]) @ self._v.T

    def reconstruction_error(self):
        return jnp.linalg.norm(self._data - self.reconstruction())

    def _ensure(self):
        if self._u is None:
            self.compute()


# ---------------------------------------------------------------------------
# SVD-derived utilities (beyond-parity).
# ---------------------------------------------------------------------------


def polar(a, side: str = "right", method: SVDMethod | str = SVDMethod.XLA):
    """Polar decomposition A = U_p H (side='right', H SPD on the column
    space) or A = H U_p (side='left').  On TPU the default engine is
    XLA's QDWH SVD, which *is* a polar iteration internally — this
    recombines its factors: U_p = U V^T, H = V diag(s) V^T."""
    a = jnp.asarray(a)
    u, s, v = svd(a, method)
    u_p = jnp.matmul(u, v.T, precision=jax.lax.Precision.HIGHEST)
    if side == "right":
        h = jnp.matmul(v * s[None, :], v.T,
                       precision=jax.lax.Precision.HIGHEST)
    elif side == "left":
        h = jnp.matmul(u * s[None, :], u.T,
                       precision=jax.lax.Precision.HIGHEST)
    else:
        raise ValueError(f"side must be 'right' or 'left', got {side!r}")
    return u_p, h


def procrustes(a, b, method: SVDMethod | str = SVDMethod.XLA):
    """Orthogonal Procrustes: the rotation Q = argmin_{Q^T Q = I}
    ||A Q - B||_F, via the SVD of A^T B — the embedding/factor alignment
    primitive (e.g. aligning U factors across rSVD runs, whose columns
    are sign/rotation-indeterminate in degenerate subspaces)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    m = jnp.matmul(a.T, b, precision=jax.lax.Precision.HIGHEST)
    u, _, v = svd(m, method)
    return jnp.matmul(u, v.T, precision=jax.lax.Precision.HIGHEST)
