"""Randomized SVD driver (Halko–Martinsson–Tropp stage A/B).

TPU-native re-design of the reference rSVD (src/rSVD.cpp:12-133 and
image_compression/src/rSVD.cpp:7-186):

  stage A:  Y = A Omega  ->  Q = orth(Y)  ->  q rounds of power-iteration
            subspace refinement with re-orthonormalization,
  stage B:  B = Q^T A  ->  small SVD of B by a dispatched engine
            {jacobi, parallel_jacobi, power}  ->  U = Q U_tilde.

All stage-A work is GEMMs + CholeskyQR2 — MXU-dense and sharding-oblivious:
pass a row-sharded A (core.mesh.shard_rows) and XLA partitions every matmul
with psum/all-gather collectives over the mesh, replacing the reference's
Gatherv/Bcast MPI choreography.  The l x l / l x n tail runs replicated on
every device, matching the reference's replicated small-problem structure.

Hyperparameter parity: the root stack used q=2 (src/rSVD.cpp:83) with
l = k + p and p=16 in tests; the image stack used q=1 and p=10
(image_compression/src/rSVD.cpp:103, image_com.cpp:294-298).  Both are
presets here (`rsvd` default q=2; `rsvd_image_preset` q=1).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed, sketch_matrix
from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import (
    orthonormal_basis,
    qr_reduced,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVDMethod, svd as small_svd
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


def generate_omega(key_or_seed, n: int, l: int, dtype=jnp.float32,
                   kind: str = "gaussian", sharding=None):
    """The n x l Gaussian test matrix (reference generateOmega,
    src/rSVD.cpp:12-55) — deterministic and shard-count-invariant."""
    key = key_from_seed(key_or_seed)
    return sketch_matrix(key, n, l, dtype, kind, sharding)


# Matmul precision for the big stage-A GEMMs.  On TPU f32 inputs:
#   highest -> 6-pass bf16 (full f32 accuracy, 6x MXU cost)
#   high    -> 3-pass bf16 (~f32 minus ~1 digit, 3x cost)
#   default -> 1-pass bf16 (fastest, ~3 significant digits)
#   bf16    -> same MXU math as 'default' (operands rounded to bf16,
#              f32 accumulation), but A is CAST ONCE to bf16 storage.
#              Measured: inside one fused pipeline XLA already CSEs the
#              operand convert, so this mode matches 'default' there
#              (docs/ARCHITECTURE.md); it pays when A is used once per
#              program (standalone skinny GEMM: 0.151 vs 0.653 ms at
#              4096^2 x 80) and halves A's HBM footprint.  Numerics
#              match 'default' (the per-GEMM operand rounding 'default'
#              performs is the same round-to-nearest cast).
# Orthonormalization Grams (linalg/qr.py) always run at HIGHEST — their
# FLOP share is l/n of the pipeline, and Q's orthogonality sets the final
# factorization accuracy.
_PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
    "bf16": jax.lax.Precision.DEFAULT,
    "bfloat16": jax.lax.Precision.DEFAULT,
    "int8": jax.lax.Precision.DEFAULT,
}
_STORE_BF16 = ("bf16", "bfloat16")
_STORE_INT8 = ("int8",)


class Int8Stored:
    """Row-scaled int8 storage of the stage-A operand: A ~ diag(s) Q8.

    The int8 SERVING storage mode (round 5): every stage-A pass reads
    ONE byte per element (half of bf16 storage, a quarter of f32) and
    contracts on the MXU's native int8 path, with the scales folded
    into the SMALL operands:

        A B   ~ diag(s) (Q8 B8) diag(t),   B ~ B8 diag(t)  (per-column)
        A^T C ~ Q8^T quant(diag(s) C)      (scales folded BEFORE the
                                            column quantization)

    Registered as a pytree (q8 + row_scale children, `transposed` as
    static aux), so it flows through jit/vmap/sharding like an array;
    `_mm` dispatches on it.  Per-entry quantization error is
    ~absmax/(127*sqrt(12)) per operand (~0.5% relative for Gaussian
    rows) — invisible under truncation-dominated serving spectra, the
    same argument as the streaming wire's ``panel_dtype='int8'``
    (rsvd/streaming.py), which validated these numerics at 100k scale.
    Serving-only: quantization is not differentiable."""

    def __init__(self, q8, row_scale, transposed: bool = False):
        self.q8 = q8
        self.row_scale = row_scale
        self.transposed = transposed

    @property
    def T(self):
        return Int8Stored(self.q8, self.row_scale, not self.transposed)

    @property
    def shape(self):
        m, n = self.q8.shape
        return (n, m) if self.transposed else (m, n)

    @property
    def dtype(self):          # logical compute dtype of the products
        return self.row_scale.dtype

    def tree_flatten(self):
        return (self.q8, self.row_scale), self.transposed

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)


jax.tree_util.register_pytree_node(
    Int8Stored,
    lambda x: x.tree_flatten(),
    Int8Stored.tree_unflatten,
)


def quantize_int8_rows(a) -> Int8Stored:
    """Per-row absmax int8 quantization of A (serving storage mode)."""
    a = jnp.asarray(a)
    out_dtype = jnp.promote_types(a.dtype, jnp.float32)
    absmax = jnp.max(jnp.abs(a), axis=1, keepdims=True)
    scale = jnp.maximum(absmax, jnp.finfo(out_dtype).tiny) / 127.0
    q8 = jnp.round(a / scale).astype(jnp.int8)
    return Int8Stored(q8, scale[:, 0].astype(out_dtype))


def _quant_cols(b):
    """(B8, t): per-column int8 quantization of a small dense operand."""
    t = jnp.maximum(jnp.max(jnp.abs(b), axis=0, keepdims=True),
                    jnp.finfo(b.dtype).tiny) / 127.0
    return jnp.round(b / t).astype(jnp.int8), t


def _int8_mm(a: Int8Stored, b):
    """A @ B (or A^T @ B when a.transposed) on the native int8 MXU path;
    result in b's dtype."""
    out_dtype = jnp.promote_types(b.dtype, jnp.float32)
    if a.transposed:
        # A^T B = Q8^T (diag(s) B): fold the row scales into the small
        # operand BEFORE quantizing it (costs m*l flops, keeps one
        # quantization step on the chain)
        b8, t = _quant_cols(b * a.row_scale[:, None].astype(b.dtype))
        z32 = jax.lax.dot_general(a.q8, b8, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return z32.astype(out_dtype) * t.astype(out_dtype)
    b8, t = _quant_cols(b)
    y32 = jax.lax.dot_general(a.q8, b8, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return (y32.astype(out_dtype) * a.row_scale[:, None]
            * t.astype(out_dtype))


def _mm(a, b, precision=DOT_PRECISION):
    from jax.experimental import sparse as jsparse

    if isinstance(a, Int8Stored):
        return _int8_mm(a, b)
    if isinstance(b, Int8Stored):
        # X @ A = (A^T @ X^T)^T — one transposed int8 product
        return _int8_mm(b.T, a.T).T
    if isinstance(a, jsparse.JAXSparse) or isinstance(b, jsparse.JAXSparse):
        # sparse operand (BCOO interaction matrices — the recsys_embed
        # role): sparse-dense product, precision flags don't apply
        return a @ b
    if a.dtype != b.dtype:
        lo, out = ((a.dtype, b.dtype) if jnp.dtype(a.dtype).itemsize
                   < jnp.dtype(b.dtype).itemsize else (b.dtype, a.dtype))
        if lo == jnp.bfloat16:
            # mixed-storage GEMM (bf16 A x f32 small operand — the only
            # mix the bf16 storage mode creates): round the SMALL
            # operand down to bf16 and accumulate in the wide dtype —
            # never widen the big operand (that would re-read it at full
            # width, defeating bf16 storage)
            return jnp.matmul(a.astype(lo), b.astype(lo),
                              precision=precision,
                              preferred_element_type=out)
        # any other mismatch (e.g. an accidental f64 x f32 from an x64
        # science CLI) keeps numpy promotion semantics — silently
        # narrowing f64 would be a precision downgrade the caller never
        # asked for
        wide = jnp.promote_types(a.dtype, b.dtype)
        return jnp.matmul(a.astype(wide), b.astype(wide),
                          precision=precision,
                          preferred_element_type=wide)
    return jnp.matmul(a, b, precision=precision,
                      preferred_element_type=a.dtype)


def _colnormalize(y):
    """Diagonal column scaling to unit norms — the span-preserving
    stand-in for interior orthonormalizations (`interior_qr='none'`,
    see power_refine).  One reduction + one VPU scale, zero
    factorization depth."""
    acc = jnp.promote_types(y.dtype, jnp.float32)
    norms = jnp.sqrt(jnp.sum(jnp.square(y.astype(acc)), axis=0))
    return y * (1.0 / jnp.maximum(
        norms, jnp.finfo(acc).tiny)).astype(y.dtype)[None, :]


def _interior_basis(y, method: str):
    return _colnormalize(y) if method == "none" else \
        orthonormal_basis(y, method)


def _fold_weights(tri):
    """Column norms of a triangular middle factor (the UTV finishes'
    decomposition weights) and their divide-safe floor.  Norms
    accumulate in at least f32 (a bf16 sum of squares loses the small
    columns) but NEVER narrower than the input — an f32 norm of an f64
    factor would silently cap x64 science runs at 1e-7."""
    acc = jnp.promote_types(tri.dtype, jnp.float32)
    s = jnp.linalg.norm(tri.astype(acc), axis=0).astype(tri.dtype)
    return s, jnp.maximum(s, jnp.finfo(acc).tiny)


def power_refine(a, q_mat, q: int, qr_method: str = "robust",
                 precision=DOT_PRECISION, reorth: str = "full",
                 interior_qr: Optional[str] = None):
    """q rounds of power-iteration subspace refinement with
    re-orthonormalization (the loop of reference intermediate_step,
    src/rSVD.cpp:62-69).

    ``reorth='full'`` orthonormalizes both the Z and Y sides each round
    (reference behavior, safest); ``'half'`` skips the Z-side QR — the
    round becomes Y = A A^T Q with one orthonormalization, halving the
    QR-chain latency at the cost of squaring the intermediate condition
    number (the robust QR's Householder fallback still catches
    degeneracy).

    ``interior_qr`` (default: same as ``qr_method``) is used for every
    orthonormalization except the final one before projection — interior
    bases only need to be well-conditioned, so e.g. ``'robust1'``
    (single-pass CholeskyQR) halves the latency-bound small-op chain.
    ``interior_qr='none'`` drops the interior orthonormalizations
    entirely and only COLUMN-NORMALIZES (a diagonal scaling): the
    subspace span is mathematically unchanged (neither QR nor diagonal
    scaling moves span(Y)), so the final QR recovers the same basis —
    but WITHOUT re-orthogonalization the columns collapse onto the
    dominant directions at rate (sigma_1/sigma_l)^(2q), and f32
    cancellation loses the subdominant components once
    cond(A)^(2q) ~ 1/eps: at q=2 the safe domain is cond ~<= 50.
    Minimum-depth serving for flat/near-Gaussian spectra only
    (tests/test_int8_serving.py::TestNoInteriorQR pins both sides)."""
    inner = qr_method if interior_qr is None else interior_qr
    for i in range(q):
        last = i == q - 1
        z = _mm(a.T, q_mat, precision)
        if reorth == "full" and inner != "none":
            z = orthonormal_basis(z, inner)
        y = _mm(a, z, precision)
        q_mat = (_interior_basis(y, qr_method) if last
                 else _interior_basis(y, inner))
    return q_mat


def subspace_iteration(a, omega, q: int, qr_method: str = "robust",
                       precision=DOT_PRECISION, reorth: str = "full",
                       interior_qr: Optional[str] = None):
    """Stage A: range finder with q power-iteration refinements
    (reference intermediate_step, src/rSVD.cpp:57-70)."""
    y = _mm(a, omega, precision)
    inner = qr_method if interior_qr is None or q == 0 else interior_qr
    q_mat = _interior_basis(y, inner)
    return power_refine(a, q_mat, q, qr_method, precision, reorth,
                        interior_qr)


def rsvd_with_omega(a, omega, q: int = 2, k: int = 0,
                    method: str = "jacobi", qr_method: str = "robust",
                    precision: str | jax.lax.Precision = "highest",
                    reorth: str = "full", interior_qr: Optional[str] = None,
                    finish: str = "project"):
    """rSVD given an explicit sketch matrix — the vmappable core (used by
    the tile-parallel image path, where each tile draws an independent
    Omega like the reference's per-rank RNG, image rSVD.cpp:89-101).

    ``finish``:
    - ``'project'`` (default, reference semantics src/rSVD.cpp:85-128):
      2q+2 passes over A — sketch, q power rounds, projection B = Q^T A.
    - ``'rowspace'`` (q >= 1): stop stage A at the last co-range block
      Z = A^T Q, orthonormalize it, and factor C = A Z_q directly:
      A ~ C Z_q^T = U S (Z_q U_t)^T.  **2q+1 passes** — one full read of
      A fewer, worth ~1/(2q+2) of the wall at HBM-bound sizes (measured
      32768^2 k=128: docs/ARCHITECTURE.md).  The subspace quality sits a
      half power iteration behind 'project' (the row basis has seen one
      fewer application of A), indistinguishable on decaying spectra but
      measurably looser on flat ones — hence opt-in.
    - ``'utv'`` (serving mode): same 2q+2 passes as 'project', but the
      tail factors B = Q^T A by a thin QR of B^T (powerURV's end-game,
      rsvd/utv.py; Gopal & Martinsson 2018) instead of the Gram
      eigendecomposition: B = L V^T with L = R^T lower-triangular, then
      the triangular middle folds into the diagonal contract as
      A ~ (Q L / ||L_col||) diag(||L_col||) V^T.  All GEMMs + one
      Cholesky — no eigh, so it dodges the depth-bound l x l eigh that
      is ~44% of the small-size pipeline (docs/ARCHITECTURE.md
      "small-op latency decomposition").  Honesty gates: at full rank l
      the reconstruction is EXACTLY 'project''s Q B, but (a) the
      returned s are the unit-u decomposition weights ||L_col||, NOT
      singular values — the energy identity sum s^2 = ||B||_F^2 (the
      range's captured energy, = the eigh tail's sum sigma(B)^2) is
      exact to arithmetic, yet per-entry tracking needs strongly gapped
      spectra
      (measured, q=2 f64: max rel error 0.27% at sigma ratio 0.3, 4.3%
      at 0.4, 26% at 0.5 — tests/test_utv.py); (b) V is orthonormal
      while U has exactly unit-norm columns that are orthogonal only to
      O(offdiag(L)); and (c) rank-k truncation keeps the largest-weight
      columns, which is near- but not SVD-optimal (reconstruction
      within 1.2x of the eigh tail on decaying spectra, tested).  Use
      for latency-critical SERVING of A_k; use 'project' when singular
      values/vectors are the product.
    - ``'rowspace_utv'`` (q >= 1): both serving levers composed — the
      2q+1-pass rowspace stage A ending in C = A Z_q, factored by one
      thin QR of C (no eigh): A ~ (Q_c T/||T_col||) diag(||T_col||)
      Z_q^T.  Same weight/unit-column contract as 'utv', plus
      rowspace's half-iteration-weaker subspace; the fastest serving
      configuration at depth-bound sizes (measured in
      bench_results/scale_ondevice.csv).
    """
    from jax.experimental import sparse as jsparse

    prec = _PRECISIONS.get(precision, precision)
    a_stage = a
    if precision in _STORE_BF16 and not isinstance(a, jsparse.JAXSparse) \
            and jnp.dtype(a.dtype).itemsize > 2:
        # one cast, then every stage-A pass reads bf16 (half/quarter the
        # HBM bytes); _mm keeps f32 accumulation via preferred_element_type
        a_stage = a.astype(jnp.bfloat16)
    elif precision in _STORE_INT8 \
            and not isinstance(a, (jsparse.JAXSparse, Int8Stored)):
        # int8 SERVING storage: one quantization, then every stage-A
        # pass reads ONE byte/element on the native int8 MXU path
        # (Int8Stored docstring; ~0.5%/operand quantization noise —
        # truncation-dominated serving spectra only).  NOTE: quantizing
        # here costs one f32 read of A per factorization; serving
        # deployments that factor the same A repeatedly should call
        # quantize_int8_rows ONCE and pass the Int8Stored directly
        # (accepted as `a` with any precision value — measured: the
        # in-loop quantize erases most of the HBM win, bench.py does
        # exactly this pre-quantization for BENCH_PRECISION=int8).
        a_stage = quantize_int8_rows(a)
    if finish in ("rowspace", "rowspace_utv"):
        if q < 1:
            raise ValueError(f"finish={finish!r} needs q >= 1 (its final "
                             "half-round IS a power iteration)")
        inner = qr_method if interior_qr is None else interior_qr
        y = _mm(a_stage, omega, prec)
        q_mat = _interior_basis(y, inner)
        # q-1 full rounds; every basis here is interior (the rowspace
        # tail re-orthonormalizes), so interior-quality QR throughout
        q_mat = power_refine(a_stage, q_mat, q - 1, inner, prec, reorth,
                             interior_qr)
        z = _mm(a_stage.T, q_mat, prec)                 # n x l co-range
        z_q = orthonormal_basis(z, qr_method)           # final (full) QR
        c = _mm(a_stage, z_q, prec)                     # m x l: LAST pass
        if finish == "rowspace_utv":
            # serving tail on 2q+1 passes: QR of C instead of the Gram
            # eigh — A ~ Q_c T Z_q^T folds to (Q_c T/||T_col||)
            # diag(||T_col||) Z_q^T.  Same honesty gates as 'utv' (s are
            # weights, U unit-column), one fewer pass over A than it.
            q_c, t = qr_reduced(c, qr_method)
            s, safe = _fold_weights(t)
            u = _mm(q_c, t / safe[None, :])
            order = jnp.argsort(-s)
            u, s, v = u[:, order], s[order], z_q[:, order]
        else:
            u_t, s, v_small = small_svd(c.T, method)    # c = v_small s u_t^T
            u = v_small
            v = _mm(z_q, u_t)
        if k > 0:
            u, s, v = u[:, :k], s[:k], v[:, :k]
        return u, s, v
    if finish == "utv":
        q_mat = subspace_iteration(a_stage, omega, q, qr_method, prec,
                                   reorth, interior_qr)     # m x l
        b = _mm(q_mat.T, a_stage, prec)                     # l x n
        v, r = qr_reduced(b.T, qr_method)                   # B^T = V R
        el = r.T                                            # B = L V^T
        s, safe = _fold_weights(el)
        u = _mm(q_mat, el / safe[None, :])                  # unit columns
        order = jnp.argsort(-s)                             # weights are
        u, s, v = u[:, order], s[order], v[:, order]        # near-sorted
        if k > 0:
            u, s, v = u[:, :k], s[:k], v[:, :k]
        return u, s, v
    if finish != "project":
        raise ValueError(f"unknown finish {finish!r} (use 'project', "
                         "'rowspace', 'utv' or 'rowspace_utv')")
    q_mat = subspace_iteration(a_stage, omega, q, qr_method, prec, reorth,
                               interior_qr)  # m x l
    b = _mm(q_mat.T, a_stage, prec)                         # l x n (replicated)
    u_t, s, v = small_svd(b, method)
    u = _mm(q_mat, u_t)
    if k > 0:
        u, s, v = u[:, :k], s[:k], v[:, :k]
    return u, s, v


def rsvd_core(a, seed, *, k, p, q, method, sketch, qr_method, precision,
              reorth, interior_qr, finish="project"):
    """Traceable (un-jitted) core of `rsvd`: jit/vmap/pre-bind it yourself
    when per-dispatch Python overhead matters (benchmarks pre-bind one
    `jax.jit(partial(rsvd_core, ...))` per configuration — through a
    relay transport the static-kwarg cache lookup of the convenience
    wrapper is measurable).  `seed` is a traced argument — changing it
    does NOT recompile."""
    m, n = a.shape
    l = min(k + p if k > 0 else p, min(m, n))
    prec = _PRECISIONS.get(precision, precision)
    if sketch == "fused":
        # Pallas fused sketch: Omega generated in-kernel, never in HBM.
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.pallas_kernels import (
            fused_sketch_matmul,
        )

        if finish != "project":
            raise ValueError("sketch='fused' (a documented negative-"
                             "result experiment) only supports "
                             "finish='project'")
        y = fused_sketch_matmul(a, l, seed).astype(a.dtype)
        inner = qr_method if interior_qr is None or q == 0 else interior_qr
        q_mat = _interior_basis(y, inner)
        q_mat = power_refine(a, q_mat, q, qr_method, prec, reorth,
                             interior_qr)
        b = _mm(q_mat.T, a, prec)
        u_t, s, v = small_svd(b, method)
        u = _mm(q_mat, u_t)
        if k > 0:
            u, s, v = u[:, :k], s[:k], v[:, :k]
        return u, s, v
    omega = generate_omega(seed, n, l, a.dtype, sketch)
    return rsvd_with_omega(a, omega, q, k, method, qr_method, precision,
                           reorth, interior_qr, finish)


_rsvd_impl = partial(
    jax.jit,
    static_argnames=("k", "p", "q", "method", "sketch", "qr_method",
                     "precision", "reorth", "interior_qr", "finish"),
)(rsvd_core)


def rsvd(
    a,
    k: int = 0,
    p: int = 10,
    q: int = 2,
    method: SVDMethod | str = SVDMethod.Jacobi,
    sketch: str = "gaussian",
    qr_method: str = "robust",
    seed: int = 0,
    precision: str = "highest",
    reorth: str = "full",
    interior_qr: Optional[str] = None,
    finish: str = "project",
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Randomized truncated SVD (reference rSVD, src/rSVD.cpp:72-133).

    k: target rank (0 = return all l = p components, the root-test preset
    k=0, p=16 => l=16 of tests/rSVD_test.cpp:63-67); p: oversampling;
    q: power iterations; method: small-SVD engine for the l x n tail;
    precision: MXU pass count for the stage-A GEMMs ('highest' = f32
    parity, 'high'/'default' trade digits for throughput on TPU;
    'bf16' = 'default' numerics with A cast once to bf16 storage so
    every HBM-bound stage-A pass reads half the bytes — the throughput
    mode for truncation-dominated spectra; 'int8' = row-scaled int8
    storage on the native int8 MXU path, ONE byte per element per pass
    — the serving mode, pre-quantize with `quantize_int8_rows` when
    factoring the same A repeatedly).
    """
    from jax.experimental import sparse as jsparse

    method = SVDMethod.parse(method)
    if not isinstance(a, (jsparse.JAXSparse, Int8Stored)):
        a = jnp.asarray(a)
    if not isinstance(a, Int8Stored) and jnp.iscomplexobj(a):
        # The pipeline is real-only by design, like the reference
        # (all Eigen::MatrixXd): every Gram/projection uses .T, not a
        # conjugate transpose, so complex input would run and silently
        # return a WRONG factorization — refuse instead.
        raise TypeError("rsvd supports real dtypes only (the Gram/"
                        "projection chain uses plain transposes); "
                        "factor real and imaginary parts separately or "
                        "use jnp.linalg.svd for complex input")
    return _rsvd_impl(
        a, k=k, p=p, q=q, method=method.value, sketch=sketch,
        qr_method=qr_method, seed=seed, precision=precision,
        reorth=reorth, interior_qr=interior_qr, finish=finish,
    )


def rsvd_sharded(
    a,
    mesh,
    k: int = 0,
    row_axis: str = "rows",
    **kwargs,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """``rsvd`` on a device mesh with automatic ragged-row handling.

    The reference balances non-dividing row counts with its
    rows_per_proc/rows_remainder idiom at every MPI call site
    (src/PM.cpp:31-35).  Here the padding is applied once: zero rows are
    appended so dim 0 divides the ``row_axis`` device count, the padded
    matrix is placed row-sharded, and the zero factor rows are cropped
    from U afterwards — exact, because rsvd([A; 0]) yields ([U; 0], s, V)
    (zero rows contribute nothing to any Gram, sketch, or projection).

    Accepts every ``rsvd`` keyword (p/q/method/precision/...).  A
    pre-quantized :class:`Int8Stored` operand works too (the multi-chip
    serving layout): the int8 values pad with zero rows and the row
    scales with ones — both exact, zero rows contribute nothing to any
    product and their scale never multiplies data.
    """
    from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import (
        pad_rows_for_mesh,
        shard_rows,
    )

    if isinstance(a, Int8Stored):
        if a.transposed:
            raise ValueError("rsvd_sharded shards ROWS: pass the "
                             "untransposed Int8Stored")
        from jax.sharding import NamedSharding, PartitionSpec

        q_pad, rows = pad_rows_for_mesh(a.q8, mesh, row_axis)
        pad = q_pad.shape[0] - rows
        scale_pad = jnp.concatenate(
            [a.row_scale, jnp.ones((pad,), a.row_scale.dtype)])
        a_sh = Int8Stored(
            shard_rows(q_pad, mesh, row_axis),
            jax.device_put(scale_pad,
                           NamedSharding(mesh, PartitionSpec(row_axis))),
        )
        kwargs.setdefault("precision", "int8")
        u, s, v = rsvd(a_sh, k=k, **kwargs)
        return u[:rows], s, v
    a = jnp.asarray(a)
    a_pad, rows = pad_rows_for_mesh(a, mesh, row_axis)
    a_sh = shard_rows(a_pad, mesh, row_axis)
    u, s, v = rsvd(a_sh, k=k, **kwargs)
    return u[:rows], s, v


def rsvd_image_preset(a, k: int = -1, seed: int = 0):
    """The image-compression stack's preset (image_compression/src/
    image_com.cpp:288-317): default k = min(m, n) / 4, p = 10, q = 1."""
    m, n = a.shape
    if k is None or k < 0:
        k = min(m, n) // 4
    return rsvd(a, k=k, p=10, q=1, seed=seed)


@partial(jax.jit, static_argnames=("q", "qr_method"))
def _grow_basis_block(a, q_prev, omega_new, q: int, qr_method: str = "robust"):
    """Orthonormal extension of an existing range basis: power-iterate the
    new sketch block against the *deflated* operator (I - QQ^T) A, so the
    block converges to the NEXT singular directions instead of re-finding
    the subspace Q already spans (Halko et al. sec. 4.4, blocked adaptive
    range finder)."""

    def deflate(y):
        return y - _mm(q_prev, _mm(q_prev.T, y))

    y = deflate(_mm(a, omega_new))
    y = orthonormal_basis(y, qr_method)
    for _ in range(q):
        y = _mm(a, _mm(a.T, y))
        y = deflate(y)
        y = orthonormal_basis(y, qr_method)
    # second-pass deflation ("twice is enough") for numerical cleanliness
    y = deflate(y)
    return orthonormal_basis(y, qr_method)


# jitted per-round pieces of rsvd_adaptive: eager op-by-op dispatch costs
# ~30-80 ms per primitive through a relay transport (CLAUDE.md rule)
@partial(jax.jit, static_argnames=("q",))
def _adaptive_init(a, omega, q: int):
    q_mat = subspace_iteration(a, omega, q)
    return q_mat, _mm(q_mat.T, a)


@partial(jax.jit, static_argnames=("method",))
def _adaptive_svd(b, method: str):
    return small_svd(b, method)


@jax.jit
def _adaptive_project(a, q_blk):
    return _mm(q_blk.T, a)


def _predict_rank(s64: np.ndarray, a_norm_sq: float, target_sq: float,
                  l: int, k_cap: int) -> int:
    """Log-linear extrapolation of the computed spectrum tail: the next
    sketch size that should meet the energy target, with a 15% margin.
    Falls back to doubling on flat/non-decaying tails."""
    resid_now = max(a_norm_sq - float(np.sum(s64 * s64)), 0.0)
    fit_lo = max(l // 2, 1)
    tail = s64[fit_lo:l]
    if tail.size >= 2 and np.all(tail > 0):
        idx = np.arange(fit_lo, l, dtype=np.float64)
        slope, intercept = np.polyfit(idx, np.log(tail), 1)
        if slope < -1e-6:
            # sum_{j>=l} s_j^2 ~ geometric with ratio r = exp(2*slope)
            r = float(np.exp(2.0 * slope))
            need = l
            acc = resid_now
            sj_sq = float(np.exp(2.0 * (intercept + slope * l)))
            while acc > target_sq and need < k_cap:
                acc -= sj_sq
                sj_sq *= r
                need += 1
            return min(k_cap, max(int(np.ceil(1.15 * need)), l + 8))
    return min(k_cap, 2 * l)


def adaptive_work_ratio(m: int, n: int, block_sizes, q: int) -> float:
    """GEMM-work ratio of an incremental adaptive run over the single
    right-sized run it converged to: (sum of per-block pipeline FLOPs +
    deflation projections) / flops(final l).  The VERDICT acceptance bar
    for the incremental scheme is ~<= 1.3x for decaying spectra."""
    from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import rsvd_flops

    total = 0.0
    l_prev = 0
    for dl in block_sizes:
        total += rsvd_flops(m, n, dl, q)
        if l_prev:
            # deflation (I - QQ^T) applied q+2 times per grown block:
            # two GEMMs of 2*m*l_prev*dl each per application
            total += (q + 2) * 2 * (2.0 * m * l_prev * dl)
        l_prev += dl
    return total / rsvd_flops(m, n, l_prev, q)


def rsvd_adaptive(
    a,
    tol: float,
    k0: int = 16,
    k_max: Optional[int] = None,
    q: int = 2,
    method: SVDMethod | str = "eigh",
    seed: int = 0,
    return_stats: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, int]:
    """Adaptive-rank rSVD: the smallest rank k (within sketch-growth
    granularity) with ||A - A_k||_F <= tol ||A||_F.

    Returns (U[:, :k], s[:k], V[:, :k], k) — plus a stats dict
    (block_sizes, rounds, work_ratio vs a single right-sized run) when
    ``return_stats`` is set.  The error estimate is free:
    for the projection A_l = Q Q^T A,
    ||A - A_l||_F^2 = ||A||_F^2 - sum_i s_i^2 (Pythagoras), so each round
    reads the energy off the computed spectrum without touching A again.

    Unlike a restart-with-bigger-sketch scheme, the basis is grown
    INCREMENTALLY: each round power-iterates only the new sketch block
    against the deflated operator and appends orthonormalized columns to
    Q and rows to B = Q^T A, so no work on previously captured directions
    is repeated; the block size comes from log-linear extrapolation of
    the spectrum already in hand (total GEMM work typically ~1.2x a
    single right-sized run).  No reference counterpart (the reference
    takes k as input); this is the "choose rank for an accuracy budget"
    workflow.
    """
    from jax.experimental import sparse as jsparse

    if isinstance(a, jsparse.JAXSparse):
        # canonicalize first: duplicate indices are summed into one logical
        # entry, so summing raw .data squares would overcount ||A||_F^2.
        # A stays sparse through the whole pipeline (all products below
        # are sparse x dense with small dense intermediates).
        if hasattr(a, "sum_duplicates"):
            a = a.sum_duplicates()
        a_norm_sq = float(jnp.sum(jnp.square(a.data)))
    else:
        a = jnp.asarray(a)
        a_norm_sq = float(jnp.sum(jnp.square(a)))
    min_dim = min(a.shape)
    k_cap = min(k_max or min_dim, min_dim)
    target_sq = (tol * tol) * a_norm_sq

    l = min(k0, k_cap)
    omega = generate_omega(seed, a.shape[1], l, a.dtype)
    q_mat, b = _adaptive_init(a, omega, q)           # m x l, l x n
    round_no = 0
    blocks = [l]
    method_v = SVDMethod.parse(method).value
    while True:
        u_t, s, v = _adaptive_svd(b, method_v)
        s64 = np.asarray(s, dtype=np.float64)
        energy = np.cumsum(s64 * s64)
        resid_sq = np.maximum(a_norm_sq - energy, 0.0)
        ok = np.nonzero(resid_sq <= target_sq)[0]
        if ok.size or l >= k_cap:
            k = int(ok[0]) + 1 if ok.size else int(s.shape[0])
            u = _mm(q_mat, u_t)
            out = (u[:, :k], s[:k], v[:, :k], k)
            if return_stats:
                m_rows = a.shape[0]
                stats = {
                    "block_sizes": tuple(blocks),
                    "rounds": round_no,
                    "work_ratio": adaptive_work_ratio(
                        m_rows, a.shape[1], blocks, q),
                }
                return out + (stats,)
            return out
        l_next = _predict_rank(s64, a_norm_sq, target_sq, l, k_cap)
        dl = max(l_next - l, 1)
        round_no += 1
        omega_new = generate_omega(seed + 7919 * round_no, a.shape[1], dl,
                                   a.dtype)
        q_blk = _grow_basis_block(a, q_mat, omega_new, q)
        q_mat = jnp.concatenate([q_mat, q_blk], axis=1)
        b = jnp.concatenate([b, _adaptive_project(a, q_blk)], axis=0)
        l += dl
        blocks.append(dl)


@partial(jax.jit, static_argnames=("k", "p", "s_factor", "method",
                                   "precision"))
def rsvd_onepass(
    a,
    k: int,
    p: int = 16,
    s_factor: int = 2,
    method: str = "eigh",
    seed: int = 0,
    precision: str | jax.lax.Precision = "highest",
):
    """Rank-k rSVD of an IN-CORE operand in a SINGLE pass over A
    (two-sided sketch of Tropp, Yurtsever, Udell & Cevher 2017) — the
    minimum-bandwidth serving mode.

    The power-iterated driver reads A 2q+1..2q+2 times; this
    algorithm touches the DATA once: the range sketch Y = A Omega and
    the co-range sketch W = Psi^T A, then A ~ Q (Psi^T Q)^+ W with a
    small SVD finishing the l x n core.  (In the compiled program the
    two sketches are two GEMMs, i.e. TWO hardware reads of A — XLA
    does not co-schedule contractions over a shared operand — so the
    measured win over the 5-pass serving driver is ~35%, not 5x:
    scale_ondevice.csv onepass rows.)  Same end-game as
    :func:`rsvd.streaming.rsvd_streaming_onepass` (that driver streams
    host panels; this one is for device-resident A).  Accuracy is a
    constant factor behind one power iteration — the bandwidth trade.
    Composes with the int8 storage mode: pass a pre-quantized
    :class:`Int8Stored` (or ``precision='int8'``) and the single pass
    reads ONE byte per element.  Returns (U, s, V) truncated to k."""
    from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import (
        orthonormal_basis,
        qr_reduced,
    )
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import (
        svd as small_svd,
    )

    prec = _PRECISIONS.get(precision, precision)
    m, n = a.shape
    dtype = a.dtype
    l = min(k + p, min(m, n))
    s_cols = min(s_factor * l + 1, m)
    a_stage = a
    if precision in _STORE_INT8 and not isinstance(a, Int8Stored):
        a_stage = quantize_int8_rows(a)
    key = key_from_seed(seed)
    k_om, k_psi = jax.random.split(key)
    omega = jax.random.normal(k_om, (n, l), dtype)
    psi = jax.random.normal(k_psi, (m, s_cols), dtype)
    y = _mm(a_stage, omega, prec)                  # m x l   (THE pass)
    w = _mm(psi.T, a_stage, prec)                  # s x n   (same read)
    q_mat = orthonormal_basis(y, "robust")
    p_mat = _mm(psi.T, q_mat)                      # s x l
    qp, rp = qr_reduced(p_mat, "householder")
    x = jax.lax.linalg.triangular_solve(
        rp, _mm(qp.T, w), left_side=True, lower=False)   # l x n core
    u_t, sv, v = small_svd(x, method)
    u = _mm(q_mat, u_t)
    return u[:, :k], sv[:k], v[:, :k]


def reconstruct(u, s, v):
    """A_k = U diag(s) V^T."""
    return _mm(u * s[None, :], v.T)


def reconstruction_error(a, u, s, v):
    """||A - U diag(s) V^T||_F — the reference's pass criterion
    (tests/rSVD_test.cpp:77-84)."""
    return jnp.linalg.norm(jnp.asarray(a) - reconstruct(u, s, v))


@partial(jax.jit, static_argnames=("k", "q", "method", "qr_method",
                                   "precision", "reorth"))
def rsvd_warm(
    a,
    q_prev,
    k: int = 0,
    q: int = 1,
    method: str = "eigh",
    qr_method: str = "robust",
    precision: str = "highest",
    reorth: str = "full",
):
    """rSVD warm-started from an existing range basis.

    For a sweep/time-series of slowly varying matrices (POD parameter
    sweeps, streaming covariance updates), the previous factorization's
    Q already spans most of the new range: power-iterating IT instead of
    a fresh Gaussian sketch reaches the same accuracy with fewer passes
    over A (typically q=1 warm ~ q=2 cold; the contamination of the new
    range is the subspace drift, not a random sketch's full-spectrum
    leakage).  ``q_prev`` is any m x l orthonormal(ish) basis — e.g. U
    from the previous step (pad columns if you want oversampling).
    Returns (U, s, V) truncated to k (all l when k=0)."""
    prec = _PRECISIONS.get(precision, precision)
    q_mat = orthonormal_basis(jnp.asarray(q_prev), qr_method)
    q_mat = power_refine(a, q_mat, q, qr_method, prec, reorth)
    b = _mm(q_mat.T, a, prec)
    u_t, s, v = small_svd(b, method)
    u = _mm(q_mat, u_t)
    if k > 0:
        u, s, v = u[:, :k], s[:k], v[:, :k]
    return u, s, v


@partial(jax.jit, static_argnames=("k", "p", "q", "method", "precision",
                                   "reorth", "finish", "mode"))
def rsvd_batched(
    a_batch,
    k: int,
    p: int = 10,
    q: int = 2,
    method: str = "eigh",
    seed: int = 0,
    precision: str = "highest",
    reorth: str = "full",
    finish: str = "project",
    mode: str = "scan",
):
    """Batched rSVD of a stacked (b, m, n) operand — ONE compiled program
    (the serving shape: no per-matrix dispatch overhead; each element
    draws an independent sketch, ``seed + index``, like the reference's
    per-rank RNG role, image rSVD.cpp:89-101).

    ``mode`` (measured, TPU v5e, ms/matrix batched vs single-matrix
    fori_loop):

    - ``'scan'`` (default): ``lax.map`` over the batch — each element
      runs the EXACT single-matrix pipeline (robust QR included) back to
      back on one device.  Matches the single-matrix per-iteration cost
      (0.035 ms at 32x256^2 k=16, 0.37 ms at 8x2048^2 k=64).
    - ``'vmap'``: every stage vmapped over the batch axis.  Use ONLY to
      shard the batch over a device MESH (embarrassing parallelism —
      the image tile path): on a single device XLA's batched
      small-factorization kernels are SLOWER than running the matrices
      back to back (measured 0.21 vs 0.035 ms/matrix at 32x256^2,
      0.70 vs 0.37 at 8x2048^2), and the robust QR must fall back to
      vmap-safe cholqr2 (a ``lax.cond`` under vmap executes both
      branches).

    Returns (U, s, V) with shapes (b, m, k), (b, k), (b, n, k).
    """
    b, m, n = a_batch.shape
    if k <= 0:
        raise ValueError("rsvd_batched needs an explicit k > 0")
    l = min(k + p, min(m, n))
    seeds = seed + jnp.arange(b, dtype=jnp.int32)
    if mode == "scan":
        def one(xi_seed):
            xi, s_i = xi_seed
            omega = generate_omega(s_i, n, l, a_batch.dtype)
            return rsvd_with_omega(xi, omega, q=q, k=k, method=method,
                                   precision=precision, reorth=reorth,
                                   finish=finish)

        return jax.lax.map(one, (a_batch, seeds))
    if mode != "vmap":
        raise ValueError(f"unknown mode {mode!r} (use 'scan' or 'vmap')")
    omegas = jax.vmap(
        lambda s: generate_omega(s, n, l, a_batch.dtype))(seeds)
    return jax.vmap(
        lambda x, om: rsvd_with_omega(
            x, om, q=q, k=k, method=method, qr_method="cholqr2",
            precision=precision, reorth=reorth, finish=finish)
    )(a_batch, omegas)
