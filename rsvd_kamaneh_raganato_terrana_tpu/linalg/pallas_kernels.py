"""Pallas TPU kernels for the rSVD hot path — including two MEASURED
NEGATIVE RESULTS kept as documented experiments.

The reference's native layer is hand-written C++/MPI/OpenMP loops; the TPU
counterpart is XLA GEMMs for everything the compiler already schedules
optimally, plus Pallas kernels where manual fusion was hypothesized to
beat XLA.  Round-2/3 measurements settled each hypothesis:

- ``quantize_uint8`` — the affine factor quantizer of the image codec
  (native/codec.cpp's device-side twin) as a single VPU pass.  **Keeper**:
  earns its single fused pass over the factors.
- ``fused_sketch_matmul`` — stage A's Y = A @ Omega with the Gaussian test
  matrix generated **inside the kernel** (per-tile counter-based PRNG +
  Box-Muller on the VPU, fed straight into MXU dot tiles), so Omega never
  exists in HBM.  **Negative result** (kept as an experiment, NOT a
  production path): it loses to the plain XLA gaussian sketch at every
  measured size — 4.24 vs 3.64 ms at 8192^2, 14.2 vs ~10.8 ms at 16384^2,
  52.2 vs 39.2 ms at 32768^2 (bench_results/sketch_compare*.csv): the
  in-kernel PRNG+Box-Muller VPU work serializes against the MXU inner
  loop, while XLA overlaps Omega generation with other work and the
  Omega HBM traffic it saves is only l/n of a pass.
- ``eigh_small`` (rsvd ``method='eigh_pallas'``) — single-kernel
  fixed-sweep parallel-Jacobi eigensolver for the l x l tail Gram.
  **Negative result** (kept as an experiment): 2.07 ms pipeline vs
  1.44 ms with XLA eigh at `highest` (round 2); round 3's in-loop phase
  profile explains why no kernel rewrite can win here: an l=80 eigh
  needs O(sweeps x l) ~ 500 SEQUENTIAL rotation rounds, and at
  ~0.3-0.5 us of dependent-chain latency per round (MXU/VPU pipeline
  depth) every Jacobi variant — Pallas, unrolled XLA, or XLA's own
  QDWH-eig at 0.24 ms — lands on the same ~0.2-0.5 ms floor.  The tail
  eigh is DEPTH-bound, not compiler-bound (docs/ARCHITECTURE.md
  "Small-op latency decomposition").

All kernels run in interpret mode on CPU (tests/test_pallas.py) and
compiled on TPU.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


TWO_PI = 2.0 * math.pi


def _round_up(x: int, mult: int) -> int:
    return ((x + mult - 1) // mult) * mult


def _mix(h):
    """murmur3 finalizer — a counter-based uint32 mixer.  Stateless and
    keyed purely on global indices, so the draw is bit-identical on every
    backend, block decomposition, and device count (the same property the
    threefry host sketch has, unlike pltpu.prng_seed whose stream is
    per-core and unavailable in interpret mode)."""
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def _bits_to_unit_floats(bits):
    """uint32 -> float32 in (0, 1): top 24 bits for a dense dyadic grid,
    offset away from 0 so log() is safe.  The cast routes through int32
    (values < 2^24 so no sign issues) because Mosaic has no direct
    uint32 -> float32 conversion."""
    f = (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        1.0 / (1 << 24)
    )
    return jnp.maximum(f, 1e-12)


def _gaussian_tile(seed, row0, block_k: int, l_pad: int):
    """Box-Muller normals for the omega tile at global rows
    [row0, row0+block_k) x [0, l_pad), hashed from (seed, global index)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, (block_k, l_pad), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (block_k, l_pad), 1)
    idx = (rows + row0.astype(jnp.uint32)) * jnp.uint32(l_pad) + cols
    h0 = _mix(idx ^ _mix(seed.astype(jnp.uint32)))
    h1 = _mix(h0 ^ jnp.uint32(0x68BC21EB))
    u1 = _bits_to_unit_floats(h0)
    u2 = _bits_to_unit_floats(h1)
    return jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos(TWO_PI * u2)


def _sketch_kernel(seed_ref, a_ref, y_ref, *, block_k: int, l_pad: int):
    """Grid (m_tiles, k_tiles): accumulate y[i] += a[i, k] @ omega[k] with
    omega tiles drawn deterministically from (seed, global row index)."""
    k_idx = pl.program_id(1)

    @pl.when(k_idx == 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    row0 = k_idx * block_k
    omega = _gaussian_tile(seed_ref[0], row0, block_k, l_pad)
    y_ref[:] += jnp.dot(a_ref[:], omega, preferred_element_type=jnp.float32)


def fused_sketch_matmul(a, l: int, seed: int = 0, block_m: int = 512,
                        block_k: int = 512, interpret: bool | None = None):
    """Y = A @ Omega with Omega ~ N(0,1)^(n x l) generated in-kernel.

    Returns (m x l) float32.  Deterministic in (seed, l) only — independent
    of block decomposition and backend; the draw differs from
    `generate_omega`'s threefry stream.  Selected with
    ``rsvd(..., sketch='fused')``.

    .. note:: **Measured negative result — not a production path.**  The
       plain XLA gaussian sketch is faster at every measured size (module
       docstring; bench_results/sketch_compare*.csv).  Kept as a working
       example of in-kernel RNG fused into an MXU contraction, and for
       the corner where Omega genuinely cannot be materialized.
    """
    m, n = a.shape
    if interpret is None:
        interpret = not _is_tpu()
    l_pad = max(128, ((l + 127) // 128) * 128)
    # Zero-pad A up to block multiples (a zero row/column of A contributes
    # nothing to Y for any omega, so padding is exact); shrinking blocks to
    # divide instead would collapse to 1-wide blocks for dims with a large
    # prime factor and explode the grid.
    block_m = min(block_m, _round_up(m, 8))
    block_k = min(block_k, _round_up(n, 128))
    m_pad = _round_up(m, block_m)
    n_pad = _round_up(n, block_k)
    if (m_pad, n_pad) != (m, n):
        a = jnp.pad(a, ((0, m_pad - m), (0, n_pad - n)))
    grid = (m_pad // block_m, n_pad // block_k)

    kernel = functools.partial(_sketch_kernel, block_k=block_k, l_pad=l_pad)
    y = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (block_m, block_k),
                    # with num_scalar_prefetch=1 index maps receive the
                    # scalar ref as a trailing argument
                    lambda i, k, seed_ref: (i, k),
                ),
            ],
            out_specs=pl.BlockSpec((block_m, l_pad),
                                   lambda i, k, seed_ref: (i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, l_pad), jnp.float32),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), a.astype(jnp.float32))
    return y[:m, :l]


def _quantize_kernel(x_ref, lo_ref, scale_ref, q_ref):
    lo = lo_ref[0]
    inv = 1.0 / scale_ref[0]
    q = jnp.round((x_ref[:] - lo) * inv)
    # Mosaic has no direct f32 -> uint8 cast; hop through int32
    q_ref[:] = jnp.clip(q, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def _quantize_sr_kernel(x_ref, lo_ref, scale_ref, seed_ref, q_ref):
    """Stochastic-rounding variant: round up with probability equal to
    the fractional part (in-kernel TPU PRNG, per-block seed) — the
    quantizer becomes mean-unbiased, E[dequant(q)] = x, so quantization
    error averages out of downstream reductions instead of biasing them."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    lo = lo_ref[0]
    inv = 1.0 / scale_ref[0]
    scaled = (x_ref[:] - lo) * inv
    fl = jnp.floor(scaled)
    frac = scaled - fl
    bits = pltpu.bitcast(pltpu.prng_random_bits(scaled.shape), jnp.uint32)
    # top 24 bits -> [0, 1); route through int32 (no direct u32->f32 in
    # Mosaic, see _bits_to_unit_floats)
    u = (bits >> jnp.uint32(8)).astype(jnp.int32).astype(jnp.float32) * (
        jnp.float32(1.0 / (1 << 24)))
    q = fl + (u < frac).astype(jnp.float32)
    q_ref[:] = jnp.clip(q, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


def quantize_uint8(x, interpret: bool | None = None,
                   stochastic: bool = False, seed: int = 0):
    """Device-side affine uint8 quantization (codec twin): returns
    (q, scale, offset).

    The array is flattened, padded, and reshaped to (rows, 1024) lanes,
    then quantized with a row-tiled grid so each program touches one
    VMEM-sized block — a whole-array single block would exceed VMEM for
    large factor matrices on real TPU.
    """
    if interpret is None:
        interpret = not _is_tpu()
    x = x.astype(jnp.float32)
    lo = jnp.min(x)
    hi = jnp.max(x)
    scale = jnp.maximum((hi - lo) / 255.0, jnp.finfo(jnp.float32).tiny)

    shape = x.shape
    total = int(np.prod(shape)) if shape else 1
    cols = 1024
    block_r = 256  # 256 x 1024 f32 = 1 MB per block
    rows = _round_up(max(1, -(-total // cols)), block_r)
    flat = jnp.pad(jnp.ravel(x), (0, rows * cols - total))
    tiled = flat.reshape(rows, cols)
    if stochastic:
        if interpret:
            # pltpu.prng_* has no CPU interpreter lowering (this JAX
            # version); same math with the host PRNG — the kernel path
            # below runs on real TPU
            scaled = (tiled - lo) / scale
            fl = jnp.floor(scaled)
            u = jax.random.uniform(jax.random.PRNGKey(seed), tiled.shape)
            q = jnp.clip(fl + (u < scaled - fl), 0.0, 255.0
                         ).astype(jnp.uint8)
        else:
            q = pl.pallas_call(
                _quantize_sr_kernel,
                grid=(rows // block_r,),
                in_specs=[
                    pl.BlockSpec((block_r, cols), lambda i: (i, 0)),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((block_r, cols), lambda i: (i, 0)),
                out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.uint8),
                interpret=interpret,
            )(tiled, lo[None], scale[None],
              jnp.asarray([seed], jnp.int32))
        return jnp.ravel(q)[:total].reshape(shape), scale, lo
    q = pl.pallas_call(
        _quantize_kernel,
        grid=(rows // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, cols), lambda i: (i, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_r, cols), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, cols), jnp.uint8),
        interpret=interpret,
    )(tiled, lo[None], scale[None])
    return jnp.ravel(q)[:total].reshape(shape), scale, lo


def _cholqr_kernel(y_ref, q_ref, r_ref, mw, *, l: int, l_pad: int):
    """Single-kernel CholeskyQR1: Gram -> augmented-elimination Cholesky
    (producing R AND L^{-1} in one l-step sweep) -> apply, with Y resident
    in VMEM throughout.

    The elimination maintains M = [G | I] and applies the row operations
    E with E G = R upper-triangular; then E = L^{-1} (G = L L^T), so the
    augmented half finishes holding L^{-1} and Q = Y (L^{-1})^T needs no
    separate triangular solve.  Every step is expressed as one-hot
    matvecs + a rank-1 MXU update — no dynamic lane indexing, which
    Mosaic lowers poorly.  Pad columns are decoupled by an identity pad
    block, so only `l` REAL steps run."""
    f32 = jnp.float32
    y = y_ref[:]
    g = jax.lax.dot_general(y, y, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
    row = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)
    eye = (row == col).astype(f32)
    pad_eye = ((row == col) & (row >= l)).astype(f32)
    mw[:, :l_pad] = g + pad_eye
    mw[:, l_pad:] = eye

    def step(j, _):
        m_cur = mw[:]
        e_j = (jax.lax.broadcasted_iota(jnp.int32, (l_pad, 1), 0) == j
               ).astype(f32)                        # (l_pad, 1) one-hot
        row_j = jax.lax.dot_general(e_j, m_cur, (((0,), (0,)), ((), ())),
                                    preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)  # (1, 2l)
        pivot = jnp.sum(row_j[:, :l_pad] * e_j.T)   # M[j, j]
        d = jax.lax.rsqrt(pivot)
        row_n = row_j * d                           # normalized pivot row
        col_j = jnp.dot(m_cur[:, :l_pad], e_j,
                        preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)  # (l_pad, 1) = M[:, j]
        below = (jax.lax.broadcasted_iota(jnp.int32, (l_pad, 1), 0) > j
                 ).astype(f32)
        mult = col_j * below * d                    # elimination coeffs
        upd = m_cur - jnp.dot(mult, row_n, preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
        # write back with pivot row replaced by its normalized form
        mw[:] = upd * (1.0 - e_j) + jnp.dot(e_j, row_n,
                                            preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)
        return _

    jax.lax.fori_loop(0, l, step, jnp.int32(0))
    m_fin = mw[:]
    r_ref[:] = m_fin[:, :l_pad] - pad_eye           # R = L^T (strip pad I)
    l_inv = m_fin[:, l_pad:]
    # Q = Y R^{-1} = Y (L^{-1})^T
    q_ref[:] = jax.lax.dot_general(y, l_inv, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32,
                            precision=jax.lax.Precision.HIGHEST)


def fused_cholqr1(y, interpret: bool | None = None):
    """CholeskyQR1 as ONE Pallas kernel (Gram + Cholesky + inverse +
    apply, zero custom calls / zero op-dispatch gaps).  Same contract as
    ``linalg.qr.cholesky_qr1``: (Q, R) with R upper-triangular; NaNs on
    rank-deficient input (no fallback) — serving paths only.  f32; VMEM
    budget m <= ~8192 at l <= 128 (qr_reduced falls back to the XLA
    composition above that)."""
    if interpret is None:
        interpret = not _is_tpu()
    m, l = y.shape
    l_pad = max(128, _round_up(l, 128))
    m_pad = _round_up(m, 8)
    y32 = y.astype(jnp.float32)
    if (m_pad, l_pad) != (m, l):
        y32 = jnp.pad(y32, ((0, m_pad - m), (0, l_pad - l)))
    kernel = functools.partial(_cholqr_kernel, l=l, l_pad=l_pad)
    q, r = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, l_pad), jnp.float32),
            jax.ShapeDtypeStruct((l_pad, l_pad), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((l_pad, 2 * l_pad), jnp.float32)],
        interpret=interpret,
    )(y32)
    return q[:m, :l].astype(y.dtype), r[:l, :l].astype(y.dtype)


def _eigh_kernel(g_ref, pi_ref, lam_ref, v_ref, gw, vw, *,
                 n_pad: int, steps: int):
    """Single-kernel two-sided Jacobi eigensolver for a symmetric matrix
    resident in VMEM.

    Brent-Luk-style tournament with CONSTANT structure: every round
    rotates the mirror pairs (i, n-1-i) — their rotation matrix J is
    mask-built (diagonal c + anti-diagonal s, no gathers/scatters) — and
    then re-shuffles rows/columns with the constant circle-method
    permutation Pi so that after n-1 rounds every index pair has met.
    Each round is therefore 4 MXU matmuls (J@Pi, two-sided update, V
    update) plus a few VPU vector ops; `steps = sweeps * (n-1)` rounds
    run inside one `fori_loop` — one kernel launch for the whole
    eigendecomposition, replacing XLA's ~0.2 ms `eigh` for the rSVD
    tail's l x l Gram (the reference's small-problem role is Eigen's
    SelfAdjointEigenSolver, POD.cpp:272-279)."""
    eps = jnp.float32(jnp.finfo(jnp.float32).eps)
    row = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
    eye = (row == col).astype(jnp.float32)
    anti = (row + col == n_pad - 1).astype(jnp.float32)

    gw[:] = g_ref[:]
    vw[:] = eye

    def body(_, carry):
        g = gw[:]
        d = jnp.sum(g * eye, axis=1, keepdims=True)        # (n, 1) diag
        r = jnp.sum(g * anti, axis=1, keepdims=True)       # G[i, n-1-i]
        rev_d = jnp.dot(anti, d, preferred_element_type=jnp.float32)
        do = r * r > (eps * eps) * jnp.abs(d * rev_d)
        g_safe = jnp.where(do, r, 1.0)
        tau = (rev_d - d) / (2.0 * g_safe)
        sgn = jnp.where(tau >= 0, 1.0, -1.0)
        t = jnp.where(do, sgn / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau)),
                      0.0)
        c = jax.lax.rsqrt(1.0 + t * t)
        s = t * c
        # J[i,i] = c_i, J[i, n-1-i] = s_i (s_i = -s_{n-1-i} by tau's
        # antisymmetry, giving the (+s, -s) plane-rotation pair)
        j = eye * c + anti * s
        mrot = jnp.dot(j, pi_ref[:], preferred_element_type=jnp.float32)
        gm = jnp.dot(g, mrot, preferred_element_type=jnp.float32)
        gw[:] = jnp.dot(mrot.T, gm, preferred_element_type=jnp.float32)
        vw[:] = jnp.dot(vw[:], mrot, preferred_element_type=jnp.float32)
        return carry

    jax.lax.fori_loop(0, steps, body, jnp.int32(0))
    lam_ref[:] = jnp.sum(gw[:] * eye, axis=1, keepdims=True).T
    v_ref[:] = vw[:]


def eigh_small(g, sweeps: int = 8, interpret: bool | None = None):
    """Eigendecomposition of a small symmetric matrix (indefinite OK) in
    ONE Pallas kernel launch: returns (eigenvalues ascending, V) like
    ``jnp.linalg.eigh``.

    Accuracy ~f32 eps relative to the dominant eigenvalue (two-sided
    cyclic Jacobi, `sweeps` full tournaments).  Pad eigenvalues are placed
    at -(||G||_F + 1), strictly below every genuine eigenvalue
    (|lambda_min| <= ||G||_F), so the ascending sort can never confuse pad
    and real eigenpairs.

    .. note:: **Measured negative result — not a production path** (module
       docstring): slower than ``jnp.linalg.eigh`` on every tested tail
       (0.24 ms floor at l=80 is DEPTH-bound — ~500 sequential rotation
       rounds x MXU pipeline latency — so one-kernel residency cannot
       win).  Kept as a working single-kernel Jacobi reference; use
       ``method='eigh'`` in production.
    """
    if interpret is None:
        interpret = not _is_tpu()
    n = g.shape[-1]
    n_pad = _round_up(n, 2) if interpret else max(128, _round_up(n, 128))
    g = g.astype(jnp.float32)
    if n_pad != n:
        g = jnp.pad(g, ((0, n_pad - n), (0, n_pad - n)))
        # pad block: decoupled eigenvalues at -(||G||_F + 1), strictly
        # below every genuine eigenvalue (|lambda_min| <= ||G||_F), so the
        # sort can never confuse pad eigenpairs with real ones — even for
        # indefinite (non-PSD) symmetric inputs
        pad_diag = (jnp.arange(n_pad) >= n).astype(jnp.float32)
        g = g - (jnp.linalg.norm(g) + 1.0) * jnp.diag(pad_diag)

    perm = np.empty(n_pad, dtype=np.int32)
    perm[0] = 0
    perm[1] = n_pad - 1
    perm[2:] = np.arange(1, n_pad - 1, dtype=np.int32)
    pi = jnp.asarray(np.eye(n_pad, dtype=np.float32)[:, perm])

    steps = sweeps * (n_pad - 1)
    kernel = functools.partial(_eigh_kernel, n_pad=n_pad, steps=steps)
    lam, v = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, n_pad), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n_pad, n_pad), jnp.float32),
            pltpu.VMEM((n_pad, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(g, pi)
    lam = lam[0]
    order = jnp.argsort(lam)[n_pad - n:]   # ascending, drop pad (-1) eigs
    return lam[order], v[:n, order]
