"""GEMM-only orthonormalization by Newton--Schulz polar iteration.

The serving pipeline's QR chains are its latency bottleneck
(bench_results/phase_profile_serving_4096.csv): every `cholqr1` is a
Gram GEMM -> l x l Cholesky CUSTOM CALL -> triangular-solve CUSTOM CALL
-> apply GEMM, and the two custom calls are sequential non-MXU kernels.
This module replaces the whole chain with MXU-only work: a degree-2
polynomial iteration on the normalized Gram matrix that converges to
G^{-1/2}, so

    Q = Y (G/alpha)^{-1/2} / sqrt(alpha),    G = Y^T Y

is orthonormal with range(Q) = range(Y) EXACTLY for any invertible
iterate (the subspace never moves; only orthonormality converges).
Reference role: this is the TPU counterpart of the reference owning its
QR kernel (src/QR.cpp:43-80) — the framework-owned orthonormalization
for the latency-bound serving path, built from the one primitive the
hardware is best at.

Algorithm: per-iteration near-minimax degree-2 polynomial p_k with

    W   <- W  p_k(H),      H <- H p_k(H)^2,       W_0 = p_1 path,

where H = G~ W^2 tracks the eigenvalue map mu -> mu p_k(mu)^2 toward 1
(the "polar express" acceleration of Newton--Schulz: each p_k is fit to
mu^{-1/2} on the CURRENT eigenvalue interval [lo_k, 1] by Lawson-
iterated least squares, so early iterations expand the small eigenvalues
~two orders of magnitude per step instead of Newton--Schulz's fixed
9/4).  The schedule is computed once per (iters, mu_min) in NumPy at
trace time and baked into the program as constants.

Contracts (serving-mode, like `cholqr1` — linalg/qr.py:106):
- Q columns are orthonormal to ~(1 - lo_final) + O(f32 eps); with the
  default schedule (iters=8, mu_min=1e-6) that is ~f32 roundoff for
  cond(Y) <= ~300 — the same domain cholqr1 serves.
- `polar_qr` returns (Q, R) with R = W_s G symmetric positive
  (semi)definite — NOT triangular.  Y = Q R holds to the same accuracy
  as Q's orthogonality.  Everything the serving tail consumes from R is
  column norms and the fold product Q (R / ||R_col||); for those the
  triangularity of R is irrelevant (||R e_j|| = ||Y e_j|| for any
  factorization with orthonormal Q).
- Rank deficiency: zero/below-mu_min directions converge toward 0, not
  NaN — Q's corresponding columns come out short-normed (graceful,
  unlike cholqr1's NaNs), flagged by `diagnostics.factor_health`.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


@lru_cache(maxsize=None)
def ns_schedule(iters: int = 8, mu_min: float = 1e-6):
    """Per-iteration degree-2 coefficients ((a, b, c), ...) plus the
    final guaranteed eigenvalue interval lower bound.

    Each iteration fits p(mu) = a + b mu + c mu^2 to mu^{-1/2} on the
    current [lo, 1] in relative minimax sense (Lawson's iteratively
    reweighted least squares), then rescales so the mapped interval's
    upper edge returns to exactly 1.  Pure NumPy, cached — runs once per
    (iters, mu_min) ever.
    """
    lo, hi = float(mu_min), 1.0
    coeffs = []
    for _ in range(iters):
        mu = np.geomspace(lo, hi, 4096)
        # minimize max |p(mu) sqrt(mu) - 1|  (relative error of p vs
        # mu^{-1/2}): Lawson re-weighting drives LSQ toward minimax
        basis = np.stack([np.ones_like(mu), mu, mu * mu], axis=1)
        design = basis * np.sqrt(mu)[:, None]
        w = np.full(mu.shape, 1.0 / mu.size)
        sol = None
        for _ in range(80):
            sw = np.sqrt(w)[:, None]
            sol, *_ = np.linalg.lstsq(design * sw, np.sqrt(w), rcond=None)
            err = np.abs(design @ sol - 1.0)
            w = w * (err + 1e-14)
            w /= w.sum()
        g = mu * (basis @ sol) ** 2
        g_hi = float(g.max())
        g_lo = float(g.min())
        if not (g_lo > 0.0):          # pragma: no cover - schedule guard
            raise RuntimeError("ns_schedule: non-positive map (mu_min "
                               f"{mu_min} too small for degree-2 fit)")
        # renormalize the mapped interval's top back to 1
        s = 1.0 / np.sqrt(g_hi)
        coeffs.append((float(sol[0] * s), float(sol[1] * s),
                       float(sol[2] * s)))
        lo, hi = g_lo / g_hi, 1.0
    return tuple(coeffs), lo


def _gram(y):
    return jnp.matmul(y.T, y, precision=DOT_PRECISION,
                      preferred_element_type=y.dtype)


def _mm(a, b):
    return jnp.matmul(a, b, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def _ns_inverse_sqrt(g, iters: int, mu_min: float):
    """(W_s, alpha): W_s ~ G^{-1/2} via the scheduled iteration; every
    op is an l x l GEMM or a VPU elementwise — no custom calls."""
    coeffs, _ = ns_schedule(iters, mu_min)
    l = g.shape[-1]
    eye = jnp.eye(l, dtype=g.dtype)
    # ||G||_F >= lambda_max for SPD G, so eigenvalues of gt land in
    # (0, 1]; flat spectra land below 1 and simply ride the schedule's
    # small-eigenvalue expansion
    alpha = jnp.sqrt(jnp.sum(g * g)) + jnp.finfo(g.dtype).tiny
    gt = g / alpha
    a0, b0, c0 = coeffs[0]
    h2 = _mm(gt, gt)
    w = a0 * eye + b0 * gt + c0 * h2          # W_1 = p_1(G~)
    h = _mm(gt, _mm(w, w))                    # H_1 = G~ W_1^2
    for a, b, c in coeffs[1:]:
        h2 = _mm(h, h)
        p = a * eye + b * h + c * h2
        w = _mm(w, p)
        p2 = _mm(p, p)
        h = _mm(h, p2)
        h = 0.5 * (h + h.T)                   # keep symmetry drift out
    return w * jax.lax.rsqrt(alpha), alpha


def polar_orthonormalize(y, iters: int = 8, mu_min: float = 1e-6):
    """Orthonormal basis of range(Y) by GEMM-only Newton--Schulz."""
    w_s, _ = _ns_inverse_sqrt(_gram(y), iters, mu_min)
    return _mm(y, w_s)


def polar_qr(y, iters: int = 8, mu_min: float = 1e-6):
    """(Q, R) with Q orthonormal, R = Q^T Y symmetric PSD (NOT
    triangular) and Y ~ Q R; see module docstring for the contract."""
    g = _gram(y)
    w_s, _ = _ns_inverse_sqrt(g, iters, mu_min)
    q = _mm(y, w_s)
    r = _mm(w_s, g)      # = Q^T Y without another tall GEMM
    return q, r


# ---------------------------------------------------------------------
# Fused single-kernel variant: Gram + the whole iteration + apply in ONE
# Pallas program, operands resident in VMEM throughout.
# ---------------------------------------------------------------------

def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:      # pragma: no cover
        return False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _polar_kernel(y_ref, q_ref, r_ref, *, coeffs, l_pad: int):
    f32 = jnp.float32
    y = y_ref[:]
    g = jax.lax.dot_general(y, y, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32)
    alpha = jnp.sqrt(jnp.sum(g * g)) + jnp.float32(1e-30)
    gt = g * (1.0 / alpha)
    row = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)
    eye = (row == col).astype(f32)

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    a0, b0, c0 = coeffs[0]
    h2 = dot(gt, gt)
    w = a0 * eye + b0 * gt + c0 * h2
    h = dot(gt, dot(w, w))
    for a, b, c in coeffs[1:]:
        h2 = dot(h, h)
        p = a * eye + b * h + c * h2
        w = dot(w, p)
        h = dot(h, dot(p, p))
        h = 0.5 * (h + h.T)
    w_s = w * jax.lax.rsqrt(alpha)
    q_ref[:] = dot(y, w_s)
    r_ref[:] = dot(w_s, g)


def polar_qr_fused(y, iters: int = 8, mu_min: float = 1e-6,
                   interpret: bool | None = None):
    """`polar_qr` as ONE Pallas kernel: the Gram, the entire polynomial
    iteration, and both output GEMMs execute with Y resident in VMEM —
    zero intermediate HBM round-trips and zero XLA op-dispatch gaps on
    the latency-bound chain.  f32 only; m * l_pad * 4 B * 2 must fit in
    VMEM (~ m <= 8192 at l <= 128) — callers fall back to `polar_qr`
    above that (linalg/qr.py does this automatically)."""
    if interpret is None:
        interpret = not _is_tpu()
    m, l = y.shape
    coeffs, _ = ns_schedule(iters, mu_min)
    l_pad = max(128, _round_up(l, 128))
    m_pad = _round_up(m, 8)
    y32 = y.astype(jnp.float32)
    if (m_pad, l_pad) != (m, l):
        # zero rows/cols are exact: they add zero Gram blocks whose
        # eigenvalues (0) are NS fixed points, zero Q rows, zero R rows
        y32 = jnp.pad(y32, ((0, m_pad - m), (0, l_pad - l)))
    kernel = partial(_polar_kernel, coeffs=coeffs, l_pad=l_pad)
    q, r = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((l_pad, l_pad), jnp.float32),
        ),
        interpret=interpret,
    )(y32)
    return q[:m, :l].astype(y.dtype), r[:l, :l].astype(y.dtype)
