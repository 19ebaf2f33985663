"""Stochastic Lanczos quadrature: tr(f(A)) for symmetric A without f(A).

Completes the implicit-matrix estimator set (rsvd/trace.py handles
f(x) = x): log-determinants, spectral entropy, trace of the resolvent —
any tr(f(A)) — via Golub-Welsch Gauss quadrature on Lanczos tridiagonal
matrices (Ubaru, Chen & Saad 2017, "Fast estimation of tr(f(A)) via
stochastic Lanczos quadrature"):

    tr(f(A)) ~ (1/m) sum_i  ||v_i||^2  sum_j (e_1^T u_j^{(i)})^2 f(theta_j^{(i)})

with (theta, u) the eigenpairs of the `steps x steps` tridiagonal T_i
produced by Lanczos from probe v_i.  Relative error decays like
exp(-4 * steps / sqrt(cond)) per probe — a few dozen steps suffice for
well-conditioned A — while the probe average sweeps out the Hutchinson
Monte-Carlo error.

TPU shape: probes are vmapped, so each Lanczos step's m matvecs batch
into ONE n x n x m GEMM on the MXU; the per-step full reorthogonalization
is a (steps x m) panel GEMM.  Everything runs inside one jitted
lax.scan — one dispatch per estimate, seeds traced.
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed, rademacher

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION as _HI  # noqa: E402


def _mv(a, v):
    return jnp.matmul(a, v, precision=_HI, preferred_element_type=a.dtype)


def _lanczos_body(apply_a, v0, steps: int):
    """`steps` Lanczos iterations from (unnormalized) v0 with FULL
    reorthogonalization (steps is small; stability beats the extra panel
    GEMM).  Returns (alpha: steps, beta: steps-1) of the tridiagonal T.

    Early (invariant-subspace) breakdown is handled smoothly: a zero
    residual yields beta ~ 0 and subsequent quadrature weights vanish."""
    n = v0.shape[0]
    dtype = v0.dtype
    eps = jnp.asarray(1e-30, dtype)
    v = v0 / jnp.maximum(jnp.linalg.norm(v0), eps)
    basis0 = jnp.zeros((steps, n), dtype).at[0].set(v)

    def step(carry, i):
        basis, v = carry
        w = apply_a(v)
        alpha = jnp.vdot(v, w)
        w = w - alpha * v
        # full reorthogonalization against every stored vector, twice
        # ("twice is enough"): rows past i are zero, so the panel GEMM
        # over the static (steps, n) basis is exact and shape-stable
        w = w - _mv(basis.T, _mv(basis, w))
        w = w - _mv(basis.T, _mv(basis, w))
        beta = jnp.linalg.norm(w)
        v_next = w / jnp.maximum(beta, eps)
        row = jnp.minimum(i + 1, steps - 1)
        keep = (i + 1 < steps).astype(dtype)
        new_row = keep * v_next + (1.0 - keep) * basis[row]
        basis = jax.lax.dynamic_update_index_in_dim(basis, new_row, row, 0)
        return (basis, v_next), (alpha, beta)

    (_, _), (alphas, betas) = jax.lax.scan(
        step, (basis0, v), jnp.arange(steps))
    return alphas, betas[:-1]


@partial(jax.jit, static_argnames=("steps",))
def lanczos_tridiag(a, v0, steps: int) -> Tuple[jax.Array, jax.Array]:
    """Dense-matrix front end of `_lanczos_body` (see its docstring)."""
    return _lanczos_body(lambda x: _mv(a, x), v0, steps)


def _quadrature(alphas, betas, fn):
    """Gauss quadrature from one tridiagonal: sum_j w_j^2 f(theta_j)."""
    t = (jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1))
    theta, u = jnp.linalg.eigh(t)
    w2 = u[0, :] ** 2
    return jnp.sum(w2 * fn(theta))


def _slq_body(apply_a, fn, seed, n, num_probes, steps, dtype):
    probes = rademacher(key_from_seed(seed), (num_probes, n), dtype)

    def one(v):
        al, be = _lanczos_body(apply_a, v, steps)
        return _quadrature(al, be, fn)

    quads = jax.vmap(one)(probes)
    return jnp.asarray(float(n), dtype) * jnp.mean(quads)


@partial(jax.jit, static_argnames=("fn", "num_probes", "steps"))
def _slq_dense(a, fn: Callable, seed, num_probes: int, steps: int):
    return _slq_body(lambda x: _mv(a, x), fn, seed, a.shape[0],
                     num_probes, steps, a.dtype)


@partial(jax.jit, static_argnames=("apply_a", "fn", "n", "num_probes",
                                   "steps", "dtype"))
def _slq_op(seed, *operands, apply_a, fn: Callable, n: int,
            num_probes: int, steps: int, dtype):
    return _slq_body(lambda x: apply_a(x, *operands), fn, seed, n,
                     num_probes, steps, dtype)


def slq_trace(a, fn: Callable, seed=0, num_probes: int = 16,
              steps: int = 30, n: int = None,
              dtype=jnp.float32, operands=()) -> jax.Array:
    """tr(f(A)) for symmetric A — f applied to Ritz values only.

    ``a``: square matrix or a matrix-free operator
    ``apply_a(v, *operands) -> A v`` on single vectors (pass ``n``;
    under vmap each Lanczos step's probe matvecs batch into one GEMM).
    The operator's device-array data goes in ``operands`` (traced), NOT
    the closure — closure constants serialize into the program shipped
    to the remote compiler (rsvd/trace.py matrix-free convention).
    ``fn`` must be a traceable elementwise function (e.g. ``jnp.log``,
    ``lambda x: 1/(x + mu)``).  Both ``fn`` and a callable ``a`` are
    STATIC jit arguments keyed by object identity: pass stable callables
    (module-level functions, ``jnp.log``, or a cached closure like
    ``logdet_psd``'s) when calling repeatedly — a fresh inline lambda
    per call retraces and compiles every time.
    """
    if callable(a):
        if n is None:
            raise ValueError("matrix-free slq_trace needs n")
        return _slq_op(seed, *operands, apply_a=a, fn=fn, n=int(n),
                       num_probes=num_probes, steps=steps,
                       dtype=jnp.dtype(dtype))
    return _slq_dense(jnp.asarray(a), fn, seed, num_probes, steps)


@lru_cache(maxsize=64)
def _logdet_fn(shift: float) -> Callable:
    """One stable callable per shift so repeated logdet_psd calls hit the
    same slq_trace jit-cache entry instead of retracing (fn is a static
    argument keyed by identity)."""

    def fn(x):
        # dtype-aware floor: a literal like 1e-300 underflows to 0.0 in
        # f32, which would let log(0) = -inf poison the estimate for
        # numerically singular A
        return jnp.log(jnp.maximum(x + shift, jnp.finfo(x.dtype).tiny))

    return fn


def logdet_psd(a, seed=0, num_probes: int = 16, steps: int = 30,
               shift: float = 0.0, n: int = None,
               dtype=jnp.float32, operands=()) -> jax.Array:
    """log det(A + shift I) for symmetric positive-definite A via SLQ —
    no Cholesky of A, only `steps` matvecs per probe.  ``a`` may be a
    matrix-free operator (pass ``n``/``operands``, see
    :func:`slq_trace`)."""
    return slq_trace(a, _logdet_fn(float(shift)),
                     seed=seed, num_probes=num_probes, steps=steps,
                     n=n, dtype=dtype, operands=operands)
