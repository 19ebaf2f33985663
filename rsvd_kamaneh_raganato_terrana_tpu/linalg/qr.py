"""Thin/full QR factorization, TPU-native.

The reference builds QR from scalar Givens rotations (src/QR.cpp:12-80 and
the QRDecomposition class hierarchy, image_compression/src/QR.cpp) — an
inherently sequential, scalar-rotation algorithm that cannot use a systolic
matmul unit.  The TPU-native equivalent with the same (Q, R) contract (up to
column signs) is **CholeskyQR2**: Gram matrix -> Cholesky -> triangular
solve, done twice for numerical stability, optionally with a spectral shift
(shifted CholeskyQR3) when the sketch is ill-conditioned (the reference's
"family A" matrices, report p.13).  Every step is a large GEMM or a tiny
replicated l x l factorization, exactly matching the rSVD access pattern:
tall-skinny Y (row-sharded over the mesh) with l <= a few hundred columns.

For row-sharded inputs the Gram matmul is a per-shard GEMM + XLA-inserted
psum; the l x l Cholesky and triangular solve run replicated on every
device — the same "replicated small-problem tail" structure the reference
used (src/rSVD.cpp:89-128).
"""

from __future__ import annotations



import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


def _gram(a):
    return jnp.matmul(a.T, a, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def _chol_maybe_shifted(g, n_rows: int):
    """Cholesky of G with an automatic shifted retry.

    If G is numerically indefinite (rank-deficient or cond(A) near
    1/sqrt(eps)), plain Cholesky produces NaNs; we then retry with the
    shift  s = 11 (m l + l (l+1)) eps ||G||_2-ish  from the shifted
    CholeskyQR literature (Fukaya et al. 2020).  Both factorizations are
    l x l and replicated, so computing the backup is nearly free relative
    to the Gram GEMM.
    """
    l = g.shape[-1]
    eps = jnp.finfo(g.dtype).eps
    norm_g = jnp.linalg.norm(g)
    shift = 11.0 * (n_rows * l + l * (l + 1)) * eps * norm_g
    eye = jnp.eye(l, dtype=g.dtype)

    # One batched kernel factors the plain, shifted, and last-resort
    # (large diagonal regularization — always SPD, keeps downstream finite
    # for the pure cholqr paths) Grams together: the three l x l problems
    # run in parallel lanes, costing one kernel latency instead of three
    # sequential ones on the latency-bound QR chain.
    stacked = jnp.stack([g, g + shift * eye, g + (norm_g + 1.0) * eye])
    c_plain, c_shift, c_last = jnp.linalg.cholesky(stacked)
    bad = ~jnp.all(jnp.isfinite(c_plain))
    # Near-singular (not only failing) Grams also degrade CholeskyQR2:
    # accuracy needs cond(A)^2 * eps << 1.  diag(chol) tracks the singular
    # value scale, so flag when (min/max)^2 falls under ~100 eps
    # (cond(A) > 1/(10 sqrt(eps)): ~300 in f32, ~6.7e6 in f64).
    diag = jnp.abs(jnp.diagonal(c_plain))
    min_d, max_d = jnp.nanmin(diag), jnp.nanmax(diag)
    tiny_diag = ~(min_d * min_d > 100.0 * eps * max_d * max_d)
    bad2 = ~jnp.all(jnp.isfinite(c_shift))
    c = jnp.where(bad, jnp.where(bad2, c_last, c_shift), c_plain)
    return c, bad | bad2 | tiny_diag


def _solve_right_upper(a, r):
    """Return A @ R^{-1} for upper-triangular R: invert the replicated
    l x l factor with one tiny triangular solve, then apply it as a
    row-partitioned GEMM.

    The direct m x l trsm is (a) sequential back-substitution on TPU — it
    cannot use the MXU — and (b) un-partitionable by XLA's SPMD pass, so
    on a row-sharded mesh it all-gathers the full m x l panel per QR
    (measured: the dominant non-ring traffic of the sharded driver).  The
    explicit-inverse form is the standard distributed-CholeskyQR
    formulation; its error is the same O(eps cond(R)) as the solve, and
    the second CholeskyQR pass restores O(eps) orthogonality."""
    l = r.shape[-1]
    r_inv = jax.lax.linalg.triangular_solve(
        r, jnp.eye(l, dtype=r.dtype), left_side=True, lower=False,
        transpose_a=False,
    )
    return jnp.matmul(a, r_inv, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def _cholesky_qr_flagged(a):
    g = _gram(a)
    c, degraded = _chol_maybe_shifted(g, a.shape[0])
    r = c.T
    q = _solve_right_upper(a, r)
    return q, r, degraded


def cholesky_qr(a):
    """Single-pass CholeskyQR: Q = A R^{-1}, R = chol(A^T A)^T."""
    q, r, _ = _cholesky_qr_flagged(a)
    return q, r


def cholesky_qr1(a):
    """PURE single-pass CholeskyQR — the minimum-depth orthonormalization:
    one Gram GEMM, ONE plain l x l Cholesky, one trsm-GEMM.  No shifted
    retry, no degradation flag, no fallback branch: for serving paths on
    inputs known well-conditioned (cond(A) <= ~1/(10 sqrt(eps))); on
    rank-deficient input it returns NaNs instead of degrading
    gracefully.  Exists because the robust1 chain's 3-way stacked
    Cholesky + finiteness/diagonal reductions + `lax.cond` are
    measurable depth on the latency-bound QR chain
    (bench_results/phase_profile_serving_4096.csv)."""
    r = jnp.linalg.cholesky(_gram(a)).T
    return _solve_right_upper(a, r), r


def cholesky_qr2(a):
    """CholeskyQR2 — orthogonality error O(eps) for cond(A) < ~1/sqrt(eps).

    The drop-in TPU replacement for the reference's
    ``qr_decomposition_reduced`` (src/QR.cpp:43-80): same thin (Q, R)
    contract, but built from two GEMM+Cholesky passes that run at MXU speed
    instead of O(m n^2) sequential Givens rotations.
    """
    q, r = robust_cholesky_qr2(a)[:2]
    return q, r


def robust_cholesky_qr2(a):
    """(Q, R, degraded): CholeskyQR2 plus a flag marking inputs (rank
    deficiency / cond ~ 1/sqrt(eps)) where a Householder fallback is
    required for full accuracy."""
    q1, r1, d1 = _cholesky_qr_flagged(a)
    q2, r2, d2 = _cholesky_qr_flagged(q1)
    return q2, jnp.matmul(r2, r1, precision=DOT_PRECISION), d1 | d2


def cholesky_qr3(a):
    """Three-pass variant for ill-conditioned (but full-rank) inputs (the
    reference's slow-decay family A)."""
    q1, r1, _ = _cholesky_qr_flagged(a)
    q2, r2 = cholesky_qr2(q1)
    return q2, jnp.matmul(r2, r1, precision=DOT_PRECISION)


def qr_reduced(a, method: str = "robust"):
    """Reduced QR: Q (m x n), R (n x n) for m >= n.

    ``method``:
    - ``robust`` (default): CholeskyQR2, with a `lax.cond` fallback to
      Householder when the Gram factorization degrades — rank-deficient
      sketches are the *normal* case when rSVD oversamples a low-rank
      matrix, and no Cholesky-based method can orthonormalize columns
      beyond the numerical rank (Householder completes the basis, the role
      Eigen HouseholderQR played at src/rSVD.cpp:60-69).  The fallback
      branch only executes when taken, so the fast path stays two GEMMs.
    - ``robust1``: single-pass CholeskyQR with the same degradation
      fallback.  Orthogonality error is O(eps cond(A)^2) instead of
      O(eps) — intended for the *interior* orthonormalizations of power
      iteration, where Q only needs to be a well-conditioned basis of the
      subspace and the final (pre-projection) QR restores full
      orthogonality.  Halves the latency-bound small-op chain per round.
    - ``cholqr1`` / ``cholqr2`` / ``cholqr3``: pure CholeskyQR with 1/2/3
      passes (benchmark/HPC/serving paths, full-rank well-conditioned
      inputs; ``cholqr1`` is the minimum-depth serving variant — no
      retry, no fallback, NaNs on rank deficiency).
    - ``cholqr1_fused``: `cholqr1` as ONE Pallas kernel (Gram +
      augmented-elimination Cholesky + inverse + apply;
      linalg/pallas_kernels.py::fused_cholqr1) when the operand fits
      VMEM, else the XLA composition.  Same contract incl. NaNs on
      rank deficiency.
    - ``polar`` / ``polar_fused``: GEMM-only Newton--Schulz polar
      orthonormalization (linalg/polar.py) — no Cholesky/trsm custom
      calls on the chain; R is symmetric PSD, NOT triangular (exact
      Y ~ QR contract, serving-tail compatible).  ``polar_fused`` runs
      Gram + iteration + apply as ONE Pallas kernel when m * 128 * 8 B
      fits VMEM, falling back to the XLA composition above that.
      Rank deficiency is out of domain like cholqr1 (NaN/garbage —
      linalg/polar.py contract; check diagnostics.factor_health).
    - ``householder``: XLA's built-in QR.
    """

    if a.dtype in (jnp.bfloat16, jnp.float16):
        # XLA's cholesky/triangular_solve/qr have no low-precision
        # kernels; factor in f32 and hand back the input dtype (the bf16
        # serving mode — Q's orthogonality is then bf16-limited by
        # construction).
        q, r = qr_reduced(a.astype(jnp.float32), method)
        return q.astype(a.dtype), r.astype(a.dtype)

    def _householder(op):
        res = jnp.linalg.qr(op, mode="reduced")
        return res[0], res[1]  # QRResult namedtuple -> plain tuple

    if method == "robust":
        q, r, degraded = robust_cholesky_qr2(a)
        return jax.lax.cond(degraded, _householder, lambda _: (q, r), a)
    if method == "robust1":
        q, r, degraded = _cholesky_qr_flagged(a)
        return jax.lax.cond(degraded, _householder, lambda _: (q, r), a)
    if method == "cholqr1":
        return cholesky_qr1(a)
    if method == "cholqr1_fused":
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
            fused_cholqr1,
        )

        m, l = a.shape
        if (a.dtype == jnp.float32
                and m * max(128, ((l + 127) // 128) * 128) * 8 <= 12 << 20):
            return fused_cholqr1(a)
        return cholesky_qr1(a)
    if method in ("polar", "polar_fused"):
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.polar import (
            polar_qr,
            polar_qr_fused,
        )

        m, l = a.shape
        # fused kernel budget: Y + Q resident in VMEM (~16 MB/core)
        if (method == "polar_fused" and a.dtype == jnp.float32
                and m * max(128, ((l + 127) // 128) * 128) * 8 <= 12 << 20):
            return polar_qr_fused(a)
        return polar_qr(a)
    if method == "cholqr2":
        return cholesky_qr2(a)
    if method == "cholqr3":
        return cholesky_qr3(a)
    if method == "householder":
        return jnp.linalg.qr(a, mode="reduced")
    raise ValueError(f"unknown QR method {method!r}")


def qr_full(a):
    """Full QR: Q (m x m), R (m x n) — reference qr_decomposition_full
    (src/QR.cpp:22-41)."""
    return jnp.linalg.qr(a, mode="complete")


def orthonormal_basis(y, method: str = "robust"):
    """Thin orthonormal basis of range(Y) — the projection step used
    throughout rSVD stage A (reference: HouseholderQR + thin-Q extraction,
    src/rSVD.cpp:60-61)."""
    q, _ = qr_reduced(y, method)
    return q
