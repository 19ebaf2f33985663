"""One-sided (Hestenes) Jacobi SVD with a round-robin tournament schedule.

TPU-native re-design of the reference's three Jacobi components:

- two-sided 2x2 Jacobi sweeps (`jacobiSVD`, include/SVD_class.hpp:101-180),
- the OpenMP weight-sorted variant (`ParallelJacobiSVD`,
  include/SVD_class.hpp:224-333), and
- the 2x2 rotation kernels (src/JacobiOperations.cpp).

Design: the reference picks rotation pairs greedily by off-diagonal weight
and applies them one at a time — a data-dependent, sequential schedule that
is poison for a systolic-array machine.  Here each *round* of a round-robin
tournament rotates n/2 **disjoint** column pairs simultaneously; the n/2
independent 2x2 rotations are assembled into one sparse orthogonal matrix J
and applied as a single dense GEMM  W <- W J,  V <- V J  on the MXU
(``apply='gemm'``), or as two vectorized column scatter-updates on the VPU
(``apply='scatter'``, cheaper for large n).  A full sweep = n-1 rounds
touches every pair exactly once, matching the cyclic-sweep convergence
theory.  Everything sits inside ``lax.while_loop`` / ``fori_loop`` with
static shapes, so it compiles once.

The convergence test mirrors the reference's: sweep until the off-diagonal
Frobenius mass of W^T W falls below tol times the diagonal mass
(reference: offdiag < 2 eps * maxDiag, SVD_class.hpp:127-136).
"""

from __future__ import annotations


from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION


def make_jacobi(x, y, z):
    """Symmetric Schur rotation (c, s) annihilating the off-diagonal y of
    the 2x2 symmetric [[x, y], [y, z]] — the reference's
    JacobiRotation::makeJacobi (src/Jacobi_Class.cpp:39-60), exposed for
    parity; the batched tournament path computes rotations with
    `_pair_rotations` instead."""
    x, y, z = (jnp.asarray(v) for v in (x, y, z))
    tau = (z - x) / (2.0 * jnp.where(y == 0, 1.0, y))
    w = jnp.sqrt(tau * tau + 1.0)
    t_pos = 1.0 / (tau + w)
    t_neg = 1.0 / (tau - w)
    t = jnp.where(tau > 0, t_pos, t_neg)
    c = 1.0 / jnp.sqrt(t * t + 1.0)
    s = t * c
    c = jnp.where(y == 0, jnp.ones_like(c), c)
    s = jnp.where(y == 0, jnp.zeros_like(s), s)
    return c, s


def givens_rotation(a, b):
    """(c, s, r) with [[c, s], [-s, c]]^T [a, b] = [r, 0] — the reference's
    givens_rotation (src/QR.cpp:12-20).  The QR pipeline here uses
    CholeskyQR2 instead; this is the scalar building block for parity and
    for small replicated updates."""
    a, b = jnp.asarray(a), jnp.asarray(b)
    r = jnp.hypot(a, b)
    safe = jnp.where(r == 0, 1.0, r)
    c = jnp.where(r == 0, jnp.ones_like(a), a / safe)
    s = jnp.where(r == 0, jnp.zeros_like(b), b / safe)
    return c, s, r


def round_robin_schedule(n: int) -> np.ndarray:
    """Circle-method tournament: (n_eff-1) rounds of n_eff/2 disjoint pairs
    covering all unordered pairs exactly once (n_eff = n rounded up to
    even; pairs touching the phantom index are masked with index n)."""
    n_eff = n + (n % 2)
    players = list(range(n_eff))  # index n (if present) is the bye marker
    rounds = []
    for _ in range(n_eff - 1):
        pairs = [
            (players[i], players[n_eff - 1 - i]) for i in range(n_eff // 2)
        ]
        rounds.append(pairs)
        players = [players[0]] + [players[-1]] + players[1:-1]
    sched = np.asarray(rounds, dtype=np.int32)  # (n_eff-1, n_eff//2, 2)
    if n % 2:
        # mark bye pairs: any pair containing the phantom index n
        mask = (sched == n).any(axis=-1)
        sched = np.where(mask[..., None], n, sched)  # whole pair -> n
    return sched


def _pair_rotations(wp, wq, eps_rel):
    """Closed-form Hestenes rotations for a batch of column pairs.

    Returns (c, s) such that replacing (wp, wq) by
    (c*wp - s*wq, s*wp + c*wq) annihilates the Gram cross-term — the batch
    counterpart of the reference's real_2x2_jacobi_svd
    (src/JacobiOperations.cpp:25-88)."""
    alpha = jnp.sum(wp * wp, axis=0)
    beta = jnp.sum(wq * wq, axis=0)
    gamma = jnp.sum(wp * wq, axis=0)
    # Rotate only when the cross term is significant relative to the
    # column norms (standard one-sided Jacobi criterion).
    do_rot = gamma * gamma > (eps_rel * eps_rel) * alpha * beta
    safe_gamma = jnp.where(do_rot, gamma, 1.0)
    zeta = (beta - alpha) / (2.0 * safe_gamma)
    # sign(0) would be 0 and skip the required 45-degree rotation when the
    # two columns have exactly equal norms (constant matrices, duplicated
    # columns) — use a zero-safe sign.
    sgn = jnp.where(zeta >= 0, 1.0, -1.0)
    t = sgn / (jnp.abs(zeta) + jnp.sqrt(1.0 + zeta * zeta))
    t = jnp.where(do_rot, t, 0.0)
    c = 1.0 / jnp.sqrt(1.0 + t * t)
    s = c * t
    return c, s


def _apply_round_scatter(w, v, p_idx, q_idx, c, s):
    wp = w[:, p_idx]
    wq = w[:, q_idx]
    w = w.at[:, p_idx].set(c * wp - s * wq)
    w = w.at[:, q_idx].set(s * wp + c * wq)
    vp = v[:, p_idx]
    vq = v[:, q_idx]
    v = v.at[:, p_idx].set(c * vp - s * vq)
    v = v.at[:, q_idx].set(s * vp + c * vq)
    return w, v


def _apply_round_gemm(w, v, p_idx, q_idx, c, s):
    """Assemble the n/2 disjoint rotations into one orthogonal J and apply
    with two GEMMs — turns the whole round into MXU work."""
    n = w.shape[1]
    j = jnp.zeros((n, n), dtype=w.dtype)
    # Start from identity; disjointness of pairs makes the scatters exact.
    j = j.at[jnp.arange(n), jnp.arange(n)].set(1.0)
    j = j.at[p_idx, p_idx].set(c)
    j = j.at[q_idx, q_idx].set(c)
    j = j.at[p_idx, q_idx].set(s)
    j = j.at[q_idx, p_idx].set(-s)
    w = jnp.matmul(w, j, precision=DOT_PRECISION)
    v = jnp.matmul(v, j, precision=DOT_PRECISION)
    return w, v


def _offdiag_mass_ratio(w):
    """sqrt(off-diagonal mass / diagonal mass) of W^T W — the monotone
    convergence measure for the block path (see _block_jacobi_core)."""
    g = jnp.matmul(w.T, w, precision=DOT_PRECISION)
    d = jnp.diagonal(g)
    diag_mass = jnp.sum(d * d)
    off_mass = jnp.maximum(jnp.sum(g * g) - diag_mass, 0.0)
    return jnp.sqrt(off_mass / jnp.maximum(diag_mass, jnp.finfo(w.dtype).tiny))


def _max_normalized_offdiag(w):
    """max_{i!=j} |w_i . w_j| / (||w_i|| ||w_j||) — the per-pair convergence
    measure.  (A global off-diagonal-mass test would mask non-orthogonality
    between columns with small norms, i.e. small singular values.)"""
    g = jnp.matmul(w.T, w, precision=DOT_PRECISION)
    d = jnp.diagonal(g)
    tiny = jnp.finfo(w.dtype).tiny
    dn = jnp.where(d > tiny, jax.lax.rsqrt(jnp.maximum(d, tiny)), 0.0)
    gn = g * dn[:, None] * dn[None, :]
    gn = gn - jnp.diag(jnp.diagonal(gn))
    return jnp.max(jnp.abs(gn))


def _jacobi_core(a, tol, max_sweeps: int, apply: str):
    m, n_orig = a.shape
    dtype = a.dtype
    # Odd column counts get one zero pad column so every tournament round
    # has n/2 genuine disjoint pairs; a zero column yields gamma = 0, hence
    # identity rotations, and is sliced off before the final sort.
    if n_orig % 2:
        a = jnp.concatenate([a, jnp.zeros((m, 1), dtype)], axis=1)
    n = a.shape[1]
    eps = jnp.finfo(dtype).eps
    eps_rel = jnp.asarray(eps, dtype)
    sched = jnp.asarray(round_robin_schedule(n))  # (R, P, 2), n even
    n_rounds = sched.shape[0]

    apply_fn = _apply_round_gemm if apply == "gemm" else _apply_round_scatter

    def one_round(r, carry):
        w, v = carry
        pairs = jax.lax.dynamic_index_in_dim(sched, r, keepdims=False)
        p_idx = pairs[:, 0]
        q_idx = pairs[:, 1]
        wp = w[:, p_idx]
        wq = w[:, q_idx]
        c, s = _pair_rotations(wp, wq, eps_rel)
        c = c.astype(dtype)
        s = s.astype(dtype)
        return apply_fn(w, v, p_idx, q_idx, c, s)

    def sweep_cond(state):
        w, v, sweep, off = state
        return jnp.logical_and(sweep < max_sweeps, off > tol)

    def sweep_body(state):
        w, v, sweep, _ = state
        w, v = jax.lax.fori_loop(0, n_rounds, one_round, (w, v))
        return (w, v, sweep + 1, _max_normalized_offdiag(w))

    v0 = jnp.eye(n, dtype=dtype)
    w, v, sweeps, _ = jax.lax.while_loop(
        sweep_cond, sweep_body,
        (a, v0, jnp.int32(0), _max_normalized_offdiag(a)),
    )
    if n != n_orig:  # drop the zero pad (its slot never rotates)
        w = w[:, :n_orig]
        v = v[:n_orig, :n_orig]

    # Singular values = column norms; sort descending with U,V permuted in
    # lockstep (reference selection-sort, SVD_class.hpp:158-178).
    s = jnp.sqrt(jnp.sum(w * w, axis=0))
    order = jnp.argsort(-s)
    s = s[order]
    w = w[:, order]
    v = v[:, order]
    safe = jnp.maximum(s, jnp.finfo(dtype).tiny)
    u = w / safe[None, :]
    # Zero out U columns for (numerically) zero singular values instead of
    # the reference's conservativeResize truncation — shapes stay static.
    u = jnp.where(s[None, :] > 0, u, 0.0)
    return u, s, v, sweeps


def _block_round(w, v, pairs, b: int):
    """One tournament round of block rotations: solve all disjoint
    block-pair 2b x 2b subproblems at once (vmapped eigh of the pair
    Grams, identity-aligned) and apply the orthogonal factors as batched
    GEMMs.  Shared by the single-dispatch core and the chunked driver."""
    m, n = w.shape
    nb = n // b
    dtype = w.dtype
    p_idx = pairs[:, 0]
    q_idx = pairs[:, 1]
    wb = w.reshape(m, nb, b)
    vb = v.reshape(n, nb, b)
    # (npairs, m, 2b) pair panels
    wp = jnp.concatenate([wb[:, p_idx], wb[:, q_idx]], axis=2)
    wp = jnp.moveaxis(wp, 1, 0)
    vp = jnp.concatenate([vb[:, p_idx], vb[:, q_idx]], axis=2)
    vp = jnp.moveaxis(vp, 1, 0)
    g = jnp.einsum("pmi,pmj->pij", wp, wp,
                   precision=DOT_PRECISION)
    lam, qrot = jnp.linalg.eigh(g)          # ascending eigenvalues
    # Identity-alignment: raw eigh output orders columns by eigenvalue,
    # which permutes columns across blocks every visit and makes the
    # cyclic iteration LIMIT-CYCLE instead of converge (mass endlessly
    # exchanged between pairings).  Primary alignment: send each
    # eigenvector to the position of its dominant component
    # (argmax |Q|), which directly maximizes diagonal dominance and is
    # robust to clustered eigenvalues (where eigenvalue-order matching
    # still cycles in f32).  When the argmax assignment collides
    # (far from convergence), fall back to matching sorted eigenvalues
    # to the sorted Gram diagonal.
    two_b = qrot.shape[-1]
    cand = jnp.argmax(jnp.abs(qrot), axis=1)            # (p, 2b)
    counts = jax.vmap(
        lambda c: jnp.zeros(two_b, jnp.int32).at[c].add(1)
    )(cand)
    is_perm = jnp.all(counts == 1, axis=1)              # (p,)
    inv_cand = jnp.argsort(cand, axis=1)
    d = jnp.diagonal(g, axis1=1, axis2=2)
    pos_order = jnp.argsort(d, axis=1)                  # ascending, like lam
    inv_diag = jnp.argsort(pos_order, axis=1)
    inv = jnp.where(is_perm[:, None], inv_cand, inv_diag)
    qrot = jnp.take_along_axis(qrot, inv[:, None, :], axis=2)
    qdiag = jnp.diagonal(qrot, axis1=1, axis2=2)
    signs = jnp.where(qdiag < 0, -1.0, 1.0).astype(dtype)
    qrot = qrot * signs[:, None, :]
    w_new = jnp.einsum("pmi,pij->pmj", wp, qrot,
                       precision=DOT_PRECISION)
    v_new = jnp.einsum("pmi,pij->pmj", vp, qrot,
                       precision=DOT_PRECISION)
    w_new = jnp.moveaxis(w_new, 0, 1)       # (m, npairs, 2b)
    v_new = jnp.moveaxis(v_new, 0, 1)
    wb = wb.at[:, p_idx].set(w_new[:, :, :b])
    wb = wb.at[:, q_idx].set(w_new[:, :, b:])
    vb = vb.at[:, p_idx].set(v_new[:, :, :b])
    vb = vb.at[:, q_idx].set(v_new[:, :, b:])
    return wb.reshape(m, n), vb.reshape(n, n)


def _block_jacobi_core(a, tol, max_sweeps: int, block_size: int):
    """One-sided **block** Jacobi: tournament over column blocks; each
    round solves all disjoint block-pair subproblems at once (vmapped
    2b x 2b eigh of the pair Gram) and applies the resulting orthogonal
    factors as batched GEMMs.  Rounds per sweep: nb-1 instead of n-1 —
    the large-n engine (MXU-dense, tiny sequential depth).

    Scale-robust pre-phase: columns are sorted by norm (descending — de
    Rijk's pivot ordering) before blocking, so each block holds columns of
    similar scale.  The pair-Gram eigh loses structure below
    eps * (s_max_in_pair / s_i)^2; scale-graded blocks keep that ratio
    small *within* the pairs that carry genuine off-diagonal mass, which
    is what lets wide-dynamic-range spectra converge in the block phase
    instead of falling through to the scalar polish."""
    m, n_orig = a.shape
    dtype = a.dtype
    # norm-presort (see docstring); V rows are un-permuted at exit
    norms0 = jnp.sum(a * a, axis=0)
    order0 = jnp.argsort(-norms0)
    inv_order0 = jnp.argsort(order0)
    a = a[:, order0]
    b = block_size
    nb = -(-n_orig // b)
    nb += nb % 2  # even block count for the tournament
    n = nb * b
    if n != n_orig:
        a = jnp.concatenate([a, jnp.zeros((m, n - n_orig), dtype)], axis=1)
    sched = jnp.asarray(round_robin_schedule(nb))  # (R, P, 2)
    n_rounds = sched.shape[0]

    def one_round(r, carry):
        w, v = carry
        pairs = jax.lax.dynamic_index_in_dim(sched, r, keepdims=False)
        return _block_round(w, v, pairs, b)

    def sweep_cond(state):
        w, v, sweep, off, prev_off = state
        # Stop at tolerance OR when a sweep no longer shrinks the
        # off-diagonal MASS by >=1%.  The mass (Frobenius) measure
        # decreases monotonically for block rotations (each pair rotation
        # removes its within-pair mass and preserves cross mass), so the
        # improvement test is meaningful; the achievable floor is set by
        # the dtype's eigh accuracy, so a pure tolerance test would always
        # burn max_sweeps.
        improving = off < prev_off * 0.99
        return jnp.logical_and(sweep < max_sweeps,
                               jnp.logical_and(off > tol, improving))

    def sweep_body(state):
        w, v, sweep, off, _ = state
        w, v = jax.lax.fori_loop(0, n_rounds, one_round, (w, v))
        return (w, v, sweep + 1, _offdiag_mass_ratio(w), off)

    v0 = jnp.eye(n, dtype=dtype)
    off0 = _offdiag_mass_ratio(a)
    w, v, sweeps, _, _ = jax.lax.while_loop(
        sweep_cond, sweep_body,
        (a, v0, jnp.int32(0), off0, jnp.full_like(off0, jnp.inf)),
    )

    # Polish: the pair-Gram eigh mixes columns of wildly different scales
    # in one factorization, so its accuracy floor is eps * (sigma_max /
    # sigma_i)^2 — small-singular-value subspaces cannot be orthogonalized
    # by block rotations at all.  Scalar 2x2 rotations are per-pair
    # scale-INVARIANT (they depend only on gamma / sqrt(alpha beta)), so a
    # gated while_loop of scalar tournament sweeps finishes the job: zero
    # sweeps when the block phase already hit tol (no cost when converged),
    # up to 8 sweeps for wide-dynamic-range spectra — matching the scalar
    # engine's quality from the block phase's accelerated start.
    eps_rel = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    sched_s = jnp.asarray(round_robin_schedule(n))
    n_rounds_s = sched_s.shape[0]

    def polish_round(r, carry):
        w_c, v_c = carry
        pairs = jax.lax.dynamic_index_in_dim(sched_s, r, keepdims=False)
        p_idx = pairs[:, 0]
        q_idx = pairs[:, 1]
        c, s_ = _pair_rotations(w_c[:, p_idx], w_c[:, q_idx], eps_rel)
        return _apply_round_scatter(w_c, v_c, p_idx, q_idx,
                                    c.astype(dtype), s_.astype(dtype))

    def pol_cond(state):
        w_c, v_c, i, off = state
        # Pure tolerance + budget, like the scalar engine: the max metric
        # is non-monotone mid-convergence, so a progress guard would abort
        # prematurely; converged inputs skip the loop entirely, and scalar
        # rotations do reach tol in every dtype (they are per-pair
        # scale-invariant, unlike the block phase's pair eigh).
        return jnp.logical_and(i < max_sweeps, off > tol)

    def pol_body(state):
        w_c, v_c, i, off = state
        w_c, v_c = jax.lax.fori_loop(0, n_rounds_s, polish_round, (w_c, v_c))
        return (w_c, v_c, i + 1, _max_normalized_offdiag(w_c))

    w, v, _, _ = jax.lax.while_loop(
        pol_cond, pol_body,
        (w, v, jnp.int32(0), _max_normalized_offdiag(w)),
    )

    # Block rotations can move the zero pad columns anywhere inside their
    # block pair, so sort first and keep the n_orig largest.
    s = jnp.sqrt(jnp.sum(w * w, axis=0))
    order = jnp.argsort(-s)[:n_orig]
    s = s[order]
    w = w[:, order]
    # V's rows refer to the norm-presorted columns of A: un-permute
    # (A P = U S V_p^T  =>  A = U S (P V_p)^T, P the presort permutation).
    v = v[:n_orig, order][inv_order0]
    safe = jnp.maximum(s, jnp.finfo(dtype).tiny)
    u = jnp.where(s[None, :] > 0, w / safe[None, :], 0.0)
    return u, s, v, sweeps


def _auto_apply(n: int) -> str:
    """Measured engine crossover (bench_results/svd_engines.csv, TPU
    v5-lite, spectra with cond 1..1e6): GEMM rotation rounds win only
    while the n x n rotation-assembly GEMMs stay tiny; the norm-presorted
    block tournament overtakes the scatter engine from n ~ 512
    (512: 176 vs 192 ms; 1024: 1049 vs 1079; 2048: 5413 vs 8006 ms) at
    the same accuracy order."""
    if n <= 256:
        return "gemm"
    if n <= 512:
        return "scatter"
    return "block"


def jacobi_svd(
    a,
    tol: Optional[float] = None,
    max_sweeps: int = 60,
    apply: str = "auto",
    precondition: bool = True,
    block_size: int = 64,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Full SVD A = U diag(s) V^T by one-sided tournament Jacobi.

    Matches the reference SVD<Jacobi>/SVD<ParallelJacobi> contract
    (include/SVD_class.hpp:35-71): U m x k, s descending, V n x k with
    k = min(m, n).  ``apply='gemm'`` is the ParallelJacobi-style blocked
    path (rotation rounds as MXU GEMMs); ``'scatter'`` the VPU path;
    ``'auto'`` picks by measured crossover (thresholds set from
    bench_results/svd_engines.csv — see the dispatch below).

    Tall/wide inputs are preconditioned with a thin QR so sweeps run on the
    square min-dim factor, like the reference's HouseholderQR precondition
    (SVD_class.hpp:110-123).  ``apply='block'`` uses the block tournament
    (`_block_jacobi_core`) — nb-1 rounds of vmapped 2b x 2b eigh + batched
    GEMMs followed by a gated scalar polish.  Its QR precondition + de
    Rijk norm presorting make it accurate across wide-dynamic-range
    spectra (cond 1e6 measured at the same error order as scatter), so
    'auto' picks it for large n where its rounds-as-GEMMs structure wins.
    """
    a = jnp.asarray(a)
    m, n = a.shape
    if m < n:
        u, s, v = jacobi_svd(a.T, tol, max_sweeps, apply, precondition,
                             block_size)
        return v, s, u

    dtype = a.dtype
    if tol is None:
        tol = 30.0 * float(jnp.finfo(dtype).eps)
    if apply == "auto":
        apply = _auto_apply(n)

    def core(x):
        if apply == "block":
            return _block_jacobi_core(x, tol, max_sweeps,
                                      min(block_size, x.shape[1]))
        return _jacobi_core(x, tol, max_sweeps, apply)

    if precondition and m > n:
        # Thin QR first: sweeps then run on the n x n R factor.  Robust
        # CholeskyQR2 (Householder fallback on degradation) instead of
        # plain Householder: two MXU GEMMs in the common case.
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced

        q0, r0 = qr_reduced(a, "robust")
        ur, s, v, _ = core(r0)
        u = jnp.matmul(q0, ur, precision=DOT_PRECISION)
        return u, s, v

    u, s, v, _ = core(a)
    return u, s, v


# ---------------------------------------------------------------------------
# Chunked-dispatch block Jacobi: one device dispatch PER SWEEP with a
# host-side convergence check between sweeps.  Numerically identical to
# `jacobi_svd(apply='block')` (same rounds, same stopping logic), but no
# single dispatch runs longer than one sweep — required on transports
# with an execution watchdog (this environment's relay kills dispatches
# beyond ~ minutes; a whole-convergence 4096^2 block-Jacobi program
# reproducibly faulted the session, bench_results/svd_engines.csv note).
# The per-sweep host round trip (~30 ms here) is noise against multi-
# second sweeps at the sizes where this engine is used.

from functools import partial as _partial


@_partial(jax.jit, static_argnames=("n_pad",))
def _block_prep_jit(a, n_pad: int):
    """Norm-presort (de Rijk pivot ordering), zero-pad to n_pad columns,
    and return the initial off-diagonal mass ratio + identity V."""
    m, n_orig = a.shape
    norms0 = jnp.sum(a * a, axis=0)
    order0 = jnp.argsort(-norms0)
    inv_order0 = jnp.argsort(order0)
    a = a[:, order0]
    if n_pad != n_orig:
        a = jnp.concatenate(
            [a, jnp.zeros((m, n_pad - n_orig), a.dtype)], axis=1)
    return a, jnp.eye(n_pad, dtype=a.dtype), inv_order0, \
        _offdiag_mass_ratio(a)


@_partial(jax.jit, static_argnames=("b",))
def _block_sweep_jit(w, v, b: int):
    """One full block-tournament sweep; returns the updated factors and
    the post-sweep off-diagonal mass ratio (the block-phase measure)."""
    sched = jnp.asarray(round_robin_schedule(w.shape[1] // b))

    def one_round(r, carry):
        w_c, v_c = carry
        pairs = jax.lax.dynamic_index_in_dim(sched, r, keepdims=False)
        return _block_round(w_c, v_c, pairs, b)

    w, v = jax.lax.fori_loop(0, sched.shape[0], one_round, (w, v))
    return w, v, _offdiag_mass_ratio(w)


@jax.jit
def _polish_sweep_jit(w, v):
    """One full scalar-tournament polish sweep; returns the post-sweep
    max normalized off-diagonal (the polish-phase measure)."""
    n = w.shape[1]
    dtype = w.dtype
    eps_rel = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    sched = jnp.asarray(round_robin_schedule(n))

    def polish_round(r, carry):
        w_c, v_c = carry
        pairs = jax.lax.dynamic_index_in_dim(sched, r, keepdims=False)
        p_idx = pairs[:, 0]
        q_idx = pairs[:, 1]
        c, s_ = _pair_rotations(w_c[:, p_idx], w_c[:, q_idx], eps_rel)
        return _apply_round_scatter(w_c, v_c, p_idx, q_idx,
                                    c.astype(dtype), s_.astype(dtype))

    w, v = jax.lax.fori_loop(0, sched.shape[0], polish_round, (w, v))
    return w, v, _max_normalized_offdiag(w)


_offmax_jit = jax.jit(_max_normalized_offdiag)


def _jit_qr_robust(a):
    """Module-level jitted robust QR for the chunked driver (a fresh
    jax.jit wrapper per call would retrace every invocation)."""
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced

    global _JIT_QR
    if _JIT_QR is None:
        _JIT_QR = jax.jit(qr_reduced, static_argnums=(1,))
    return _JIT_QR(a, "robust")


_JIT_QR = None


@_partial(jax.jit, static_argnames=("n_orig",))
def _block_finish_jit(w, v, inv_order, n_orig: int):
    """Sort/truncate/normalize — the exit transform of the block core."""
    s = jnp.sqrt(jnp.sum(w * w, axis=0))
    order = jnp.argsort(-s)[:n_orig]
    s = s[order]
    w = w[:, order]
    v = v[:n_orig, order][inv_order]
    safe = jnp.maximum(s, jnp.finfo(w.dtype).tiny)
    u = jnp.where(s[None, :] > 0, w / safe[None, :], 0.0)
    return u, s, v


def jacobi_svd_chunked(
    a,
    tol: Optional[float] = None,
    max_sweeps: int = 60,
    block_size: int = 64,
    precondition: bool = True,
    progress=None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """`jacobi_svd(apply='block')` with host-orchestrated sweeps.

    Same math, same stopping rules (block phase: tol OR <1% mass
    improvement; polish phase: tol within the sweep budget), but each
    sweep is its own compiled dispatch with a 1-element convergence fetch
    between sweeps, so no program exceeds a transport watchdog.
    ``progress``: optional callable(phase, sweep, measure) invoked after
    every sweep (e.g. for logging from benchmarks).
    """
    a = jnp.asarray(a)
    m, n = a.shape
    if m < n:
        u, s, v = jacobi_svd_chunked(a.T, tol, max_sweeps, block_size,
                                     precondition, progress)
        return v, s, u
    dtype = a.dtype
    if tol is None:
        tol = 30.0 * float(jnp.finfo(dtype).eps)

    if precondition and m > n:
        q0, r0 = _jit_qr_robust(a)
        ur, s, v = jacobi_svd_chunked(r0, tol, max_sweeps, block_size,
                                      precondition=False, progress=progress)
        u = jnp.matmul(q0, ur, precision=DOT_PRECISION)
        return u, s, v

    b = min(block_size, n)
    nb = -(-n // b)
    nb += nb % 2
    n_pad = nb * b

    w, v, inv_order0, off0 = _block_prep_jit(a, n_pad)
    off = float(off0)
    prev = float("inf")
    sweeps = 0
    while sweeps < max_sweeps and off > tol and off < prev * 0.99:
        w, v, off_new = _block_sweep_jit(w, v, b)
        prev, off = off, float(off_new)   # forces the sweep to completion
        sweeps += 1
        if progress is not None:
            progress("block", sweeps, off)

    off_max = float(_offmax_jit(w))
    i = 0
    while i < max_sweeps and off_max > tol:
        w, v, off_new = _polish_sweep_jit(w, v)
        off_max = float(off_new)
        i += 1
        if progress is not None:
            progress("polish", i, off_max)

    return _block_finish_jit(w, v, inv_order0, n)
