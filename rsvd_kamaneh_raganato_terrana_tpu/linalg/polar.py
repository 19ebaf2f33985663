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

    W   <- W  p_k(H),      H = W^T G~ W   (recomputed every iteration),

where H — the TRUE Gram of the implicit iterate X = Y W — follows the
eigenvalue map mu -> mu p_k(mu)^2 toward 1
(the "polar express" acceleration of Newton--Schulz: each p_k is fit to
mu^{-1/2} on the CURRENT eigenvalue interval [lo_k, 1] by Lawson-
iterated least squares, so early iterations expand the small eigenvalues
~two orders of magnitude per step instead of Newton--Schulz's fixed
9/4).  The schedule is computed once per (iters, mu_min) in NumPy at
trace time and baked into the program as constants.

Contracts (serving-mode, like `cholqr1` — linalg/qr.py:106):
- Q columns are orthonormal to ~sqrt(l) eps cond-ish at f32 (measured
  4e-5 to 1e-4 over cond 100-1000) with a schedule fit floor of ~4e-8
  (the 1% overshoot margin, `ns_schedule` docstring) — the same order
  as cholqr1's O(eps cond^2) serving contract over its domain
  cond(Y) <= ~1/(10 sqrt(eps)).
- `polar_qr` returns (Q, R) with R = W_s G symmetric positive
  (semi)definite — NOT triangular.  Y = Q R holds to the same accuracy
  as Q's orthogonality.  Everything the serving tail consumes from R is
  column norms and the fold product Q (R / ||R_col||); for those the
  triangularity of R is irrelevant (||R e_j|| = ||Y e_j|| for any
  factorization with orthonormal Q).
- Rank deficiency is OUT OF DOMAIN, exactly like cholqr1: directions
  whose true singular value sits below the matmul noise floor can be
  rounded to NEGATIVE Gram eigenvalues, which the sign-preserving map
  explodes — factors come back NaN/garbage.  Check with
  `diagnostics.factor_health` (one tiny fetch) after serving-path
  factorizations, or use qr_method='robust' where deficiency is
  expected (`_ns_inverse_sqrt` numerical notes).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


@lru_cache(maxsize=None)
def ns_schedule(iters: int = 8, mu_min: float = 1e-6,
                hi_margin: float = 0.01):
    """Per-iteration degree-2 coefficients ((a, b, c), ...) plus the
    final guaranteed eigenvalue interval lower bound.

    Each iteration fits p(mu) = a + b mu + c mu^2 to mu^{-1/2} on the
    current [lo, 1 + hi_margin] in relative minimax sense (Lawson's
    iteratively reweighted least squares), then rescales so the mapped
    interval's upper edge returns to exactly 1.  Pure NumPy, cached —
    runs once per (iters, mu_min, hi_margin) ever.

    ``hi_margin`` is the OVERSHOOT SAFETY BAND: unlike classical
    Newton--Schulz (whose cubic tolerates eigenvalues up to 3), a
    zero-margin minimax fit explodes any eigenvalue that floating-point
    noise pushes above the designed interval — measured on TPU: the
    Mosaic kernel's matmul noise sent an eigenvalue over 1, and four
    iterations later H was at norm 7 and then NaN (round-5 ladder
    configs 3-4).  Designing each fit on [lo, 1+margin] makes the map
    CONTRACT everything up to 1+margin back inside.  The margin sets a
    convergence floor (the best degree-2 relative fit on a never-
    narrower-than-margin interval): ~4e-8 orthogonality at the default
    1% — far below serving tolerances and ~1000x above the HIGHEST-
    precision matmul noise (~1e-5) it must absorb.  Single-pass bf16
    matmul noise (4e-3) is NOT absorbable by any practical margin
    (simulated: diverges even at 5%), which is why every dot on this
    path runs at HIGHEST."""
    lo, hi = float(mu_min), 1.0 + float(hi_margin)
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
        # renormalize so the mapped top edge lands at 1 (real eigenvalues
        # sit at <= 1/(1+margin) of the designed interval, so they map
        # strictly inside; the margin band above them is the noise trap)
        s = 1.0 / np.sqrt(g_hi)
        coeffs.append((float(sol[0] * s), float(sol[1] * s),
                       float(sol[2] * s)))
        lo, hi = g_lo / g_hi, 1.0 + float(hi_margin)
    return tuple(coeffs), lo


def _gram(y):
    return jnp.matmul(y.T, y, precision=DOT_PRECISION,
                      preferred_element_type=y.dtype)


def _mm(a, b):
    return jnp.matmul(a, b, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def _ns_inverse_sqrt(g, iters: int, mu_min: float):
    """(W_s, alpha): W_s ~ G^{-1/2} via the scheduled iteration; every
    op is an l x l GEMM or a VPU elementwise — no custom calls.

    Numerical notes (settled by round-5 measurements):
    - alpha is the ROW-SUM (inf) norm: a guaranteed lambda_max upper
      bound like ||G||_F, but typically within ~2x of lambda_max instead
      of sqrt(l)x, so the normalized spectrum starts near 1 and fewer
      schedule iterations are spent lifting it.
    - NO diagonal shift: a shift delta poisons orthogonality by
      delta/mu_min (W converges to the SHIFTED inverse sqrt, so
      Q^T Q = I - delta W^2 ~ I - delta/mu — measured 0.11-0.46 error
      at f32 across cond 100-1000 with delta = 256 eps).  Without it,
      eigenvalues that matmul roundoff pushes NEGATIVE (true mu below
      ~sqrt(m) eps lambda_max, i.e. rank-deficient input) EXPLODE under
      the sign-preserving map — the same out-of-domain behavior as
      cholqr1's NaNs, flagged post-hoc by diagnostics.factor_health."""
    coeffs, _ = ns_schedule(iters, mu_min)
    l = g.shape[-1]
    eye = jnp.eye(l, dtype=g.dtype)
    alpha = jnp.max(jnp.sum(jnp.abs(g), axis=1)) \
        + jnp.finfo(g.dtype).tiny
    gt = g / alpha
    def actual_h(w):
        # H = W^T G~ W — the TRUE Gram of the implicit iterate X = Y W
        # (symmetric PSD by construction even after W drifts
        # non-symmetric), so W's roundoff feeds back into the next
        # polynomial instead of accumulating (the propagated
        # H <- H p(H)^2 form is the classic uncoupled Newton--Schulz
        # whose W drift is never corrected).
        h = _mm(w.T, _mm(gt, w))
        return 0.5 * (h + h.T)

    a0, b0, c0 = coeffs[0]
    h2 = _mm(gt, gt)
    w = a0 * eye + b0 * gt + c0 * h2          # W_1 = p_1(G~)
    h = actual_h(w)
    for a, b, c in coeffs[1:]:
        h2 = _mm(h, h)
        p = a * eye + b * h + c * h2
        w = _mm(w, p)
        h = actual_h(w)
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


def _polar_kernel(y_ref, q_ref, r_ref, *, coeffs, l: int,
                  l_pad: int):
    f32 = jnp.float32
    y = y_ref[:]
    g = jax.lax.dot_general(y, y, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
    # row-sum lambda_max bound, NO shift — see _ns_inverse_sqrt notes.
    # The PAD block needs its identity restored on gt (zero pad
    # eigenvalues sit exactly at the sign-preserving map's explosive
    # fixed-point boundary; a pad eigenvalue of 1 is inert).
    alpha = jnp.max(jnp.sum(jnp.abs(g), axis=1)) + jnp.float32(1e-30)
    row = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)
    eye = (row == col).astype(f32)
    pad_eye = ((row == col) & (row >= l)).astype(f32)
    gt = g * (1.0 / alpha) + pad_eye

    def dot(a, b):
        # HIGHEST is load-bearing: Mosaic's default f32 matmul is a
        # single bf16 pass (measured 3.3e-3 relative Gram error on TPU);
        # that noise level needs the schedule's overshoot margin AND the
        # multi-pass product to stay inside the convergence basin
        return jnp.dot(a, b, preferred_element_type=f32,
                       precision=jax.lax.Precision.HIGHEST)

    def actual_h(w):
        # H = W^T G~ W coupling (stability; see _ns_inverse_sqrt)
        h = dot(w.T, dot(gt, w))
        return 0.5 * (h + h.T)

    a0, b0, c0 = coeffs[0]
    h2 = dot(gt, gt)
    w = a0 * eye + b0 * gt + c0 * h2
    h = actual_h(w)
    for a, b, c in coeffs[1:]:
        h2 = dot(h, h)
        p = a * eye + b * h + c * h2
        w = dot(w, p)
        h = actual_h(w)
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
    kernel = partial(_polar_kernel, coeffs=coeffs, l=l, l_pad=l_pad)
    q, r = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((l_pad, l_pad), jnp.float32),
        ),
        interpret=interpret,
    )(y32)
    return q[:m, :l].astype(y.dtype), r[:l, :l].astype(y.dtype)
