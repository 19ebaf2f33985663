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


@partial(jax.jit, static_argnames=("steps",))
def lanczos_tridiag(a, v0, steps: int) -> Tuple[jax.Array, jax.Array]:
    """`steps` Lanczos iterations from (unnormalized) v0 with FULL
    reorthogonalization (steps is small; stability beats the extra panel
    GEMM).  Returns (alpha: steps, beta: steps-1) of the tridiagonal T.

    Early (invariant-subspace) breakdown is handled smoothly: a zero
    residual yields beta ~ 0 and subsequent quadrature weights vanish."""
    n = a.shape[0]
    dtype = a.dtype
    eps = jnp.asarray(1e-30, dtype)
    v = v0 / jnp.maximum(jnp.linalg.norm(v0), eps)
    basis0 = jnp.zeros((steps, n), dtype).at[0].set(v)

    def step(carry, i):
        basis, v = carry
        w = _mv(a, v)
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


def _quadrature(alphas, betas, fn):
    """Gauss quadrature from one tridiagonal: sum_j w_j^2 f(theta_j)."""
    t = (jnp.diag(alphas) + jnp.diag(betas, 1) + jnp.diag(betas, -1))
    theta, u = jnp.linalg.eigh(t)
    w2 = u[0, :] ** 2
    return jnp.sum(w2 * fn(theta))


@partial(jax.jit, static_argnames=("fn", "num_probes", "steps"))
def slq_trace(a, fn: Callable, seed=0, num_probes: int = 16,
              steps: int = 30) -> jax.Array:
    """tr(f(A)) for symmetric A — f applied to Ritz values only.

    ``fn`` must be a traceable elementwise function (e.g. ``jnp.log``,
    ``lambda x: 1/(x + mu)``).  ``fn`` is a STATIC jit argument keyed by
    object identity: pass a stable callable (module-level function,
    ``jnp.log``, or a cached closure like ``logdet_psd``'s) when calling
    repeatedly — a fresh inline lambda per call retraces and compiles
    every time.  Rademacher probes (||v||^2 = n exactly) are vmapped:
    each Lanczos step is one batched GEMM.
    """
    n = a.shape[0]
    key = key_from_seed(seed)
    probes = rademacher(key, (num_probes, n), a.dtype)

    def one(v):
        al, be = lanczos_tridiag(a, v, steps)
        return _quadrature(al, be, fn)

    quads = jax.vmap(one)(probes)
    return jnp.asarray(float(n), a.dtype) * jnp.mean(quads)


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
               shift: float = 0.0) -> jax.Array:
    """log det(A + shift I) for symmetric positive-definite A via SLQ —
    no Cholesky of A, only `steps` matvecs per probe."""
    return slq_trace(a, _logdet_fn(float(shift)),
                     seed=seed, num_probes=num_probes, steps=steps)
