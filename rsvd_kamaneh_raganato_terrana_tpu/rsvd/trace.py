"""Randomized trace and diagonal estimation (Hutchinson, Hutch++).

Beyond-parity extension.  The reference framework stops at factorization;
the same sketch-and-project machinery also answers the implicit-matrix
questions that show up around it — tr(A) for log-det/Frobenius budgets,
diag(A) for leverage/variance readouts — without ever forming A's entries:

  hutchinson   tr(A) ~ (1/m) sum_j g_j^T A g_j           Var ~ ||A||_F^2/m
  hutchpp      split the budget: capture the dominant range with a rSVD
               stage-A sketch (exact trace there), Hutchinson only on the
               deflated residual            (Meyer-Musco-Musco-Woodruff '21)
  diag_estimate  diag(A) ~ E[g * (A g)] with Rademacher g (Bekas et al. '07)

TPU shape: every estimator is a single jitted program of 1-3 GEMMs with a
column-wise contraction — MXU work, one dispatch, seeds traced (re-running
with a new seed does not recompile).  All quadratic forms are accumulated
at HIGHEST precision: trace estimates are sums of n-term dot products, so
bf16 accumulation error would swamp the Monte-Carlo error being measured.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed, sketch_matrix
from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import orthonormal_basis
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION as _HI  # noqa: E402


def _quad_forms(apply_a, g):
    """g_j^T (A g_j) for every column j — one GEMM + a contraction."""
    return jnp.einsum("ij,ij->j", g, apply_a(g), precision=_HI)


def _dense_apply(a):
    return lambda x: _mm(a, x, _HI)


def _hutchinson_body(apply_a, seed, n, num_samples, kind, dtype):
    g = sketch_matrix(key_from_seed(seed), n, num_samples, dtype, kind)
    quad = _quad_forms(apply_a, g)
    est = jnp.mean(quad)
    se = jnp.std(quad, ddof=1) / jnp.sqrt(jnp.asarray(float(num_samples),
                                                      quad.dtype))
    return est, se


@partial(jax.jit, static_argnames=("num_samples", "kind"))
def _hutchinson_dense(a, seed, num_samples: int, kind: str):
    return _hutchinson_body(_dense_apply(a), seed, a.shape[0],
                            num_samples, kind, a.dtype)


@partial(jax.jit, static_argnames=("apply_a", "n", "num_samples", "kind",
                                   "dtype"))
def _hutchinson_op(seed, *operands, apply_a, n: int, num_samples: int,
                   kind: str, dtype):
    return _hutchinson_body(lambda x: apply_a(x, *operands), seed, n,
                            num_samples, kind, dtype)


# Matrix-free calling convention, shared by hutchinson/hutchpp/
# diag_estimate (and slq_trace/logdet_psd in rsvd/slq.py):
#   estimator(apply_a, n=..., operands=(op1, op2, ...))
# where apply_a(X, *operands) -> A X is a traceable callable.  The
# callable is a STATIC jit key (pass a stable function, not a fresh
# lambda per call) and MUST NOT close over device arrays — closure
# constants serialize into the program shipped to the (possibly remote)
# compiler (CLAUDE.md jit-closure rule).  Put the operator's data in
# ``operands``; they are traced arguments.
_MATRIX_FREE_DOC = """
    ``a`` is a square matrix OR a matrix-free operator
    ``apply_a(X, *operands) -> A X`` (e.g. a Hessian-vector product), in
    which case ``n`` (and optionally ``dtype``) must be given and the
    operator's device-array data passed via ``operands`` — NOT captured
    in the closure (see the module's matrix-free convention note).
"""


def hutchinson(a, seed=0, num_samples: int = 64,
               kind: str = "rademacher", n: int = None,
               dtype=jnp.float32,
               operands=()) -> Tuple[jax.Array, jax.Array]:
    """Girard-Hutchinson trace estimator.

    Returns ``(estimate, stderr)`` where stderr is the sample standard
    error of the ``num_samples`` independent quadratic forms — an honest,
    data-driven confidence readout (the theory bound ~||A||_F/sqrt(m) is
    not computable without A's entries).

    Rademacher probes (default) have strictly smaller variance than
    Gaussian for the same m: Var = 2(||A_sym||_F^2 - sum a_ii^2)/m.
    """
    if callable(a):
        if n is None:
            raise ValueError("matrix-free hutchinson needs n")
        return _hutchinson_op(seed, *operands, apply_a=a, n=int(n),
                              num_samples=num_samples, kind=kind,
                              dtype=jnp.dtype(dtype))
    return _hutchinson_dense(jnp.asarray(a), seed, num_samples, kind)


hutchinson.__doc__ += _MATRIX_FREE_DOC


def _hutchpp_body(apply_a, seed, n, budget, kind, dtype):
    m = max(budget // 3, 1)
    key = key_from_seed(seed)
    ks, kg = jax.random.split(key)
    s = sketch_matrix(ks, n, m, dtype, kind)
    g = sketch_matrix(kg, n, m, dtype, kind)
    q = orthonormal_basis(apply_a(s), "robust")
    t_range = jnp.trace(_mm(q.T, apply_a(q), _HI))
    # (I - QQ^T) g deflates BOTH sides of each residual quadratic form
    # (the projector is symmetric): g'^T A g' = g^T (I-P) A (I-P) g.
    gp = g - _mm(q, _mm(q.T, g, _HI), _HI)
    return t_range + jnp.mean(_quad_forms(apply_a, gp))


@partial(jax.jit, static_argnames=("budget", "kind"))
def _hutchpp_dense(a, seed, budget: int, kind: str):
    return _hutchpp_body(_dense_apply(a), seed, a.shape[0], budget, kind,
                         a.dtype)


@partial(jax.jit, static_argnames=("apply_a", "n", "budget", "kind",
                                   "dtype"))
def _hutchpp_op(seed, *operands, apply_a, n: int, budget: int, kind: str,
                dtype):
    return _hutchpp_body(lambda x: apply_a(x, *operands), seed, n, budget,
                         kind, dtype)


def hutchpp(a, seed=0, budget: int = 96, kind: str = "rademacher",
            n: int = None, dtype=jnp.float32, operands=()) -> jax.Array:
    """Hutch++: variance-reduced trace estimation in a 3-way budget split.

    ``a``: square matrix or matrix-free operator ``apply_a(X, *operands)
    -> A X`` (pass ``n``; see :func:`hutchinson` for the calling
    convention and jit-closure rules).

    With m = budget//3: sketch S (n x m) captures range(A)'s dominant
    subspace Q = orth(A S) whose trace contribution tr(Q^T A Q) is computed
    EXACTLY; plain Hutchinson runs only on the doubly-deflated residual
    (I - QQ^T) A (I - QQ^T).  Total A-multiplications: 3m = budget, same
    cost as hutchinson(num_samples=budget), but the error scales with the
    residual ||A - A_m||_F instead of ||A||_F — for PSD A this gives the
    optimal O(1/m) relative error vs Hutchinson's O(1/sqrt(m)).
    """
    if callable(a):
        if n is None:
            raise ValueError("matrix-free hutchpp needs n")
        return _hutchpp_op(seed, *operands, apply_a=a, n=int(n),
                           budget=budget, kind=kind,
                           dtype=jnp.dtype(dtype))
    return _hutchpp_dense(jnp.asarray(a), seed, budget, kind)


def _diag_body(apply_a, seed, n, num_samples, dtype):
    g = sketch_matrix(key_from_seed(seed), n, num_samples, dtype,
                      "rademacher")
    prod = g * apply_a(g)                          # n x m, row i -> a_ii
    est = jnp.mean(prod, axis=1)
    se = jnp.std(prod, axis=1, ddof=1) / jnp.sqrt(
        jnp.asarray(float(num_samples), prod.dtype))
    return est, se


@partial(jax.jit, static_argnames=("num_samples",))
def _diag_dense(a, seed, num_samples: int):
    return _diag_body(_dense_apply(a), seed, a.shape[0], num_samples,
                      a.dtype)


@partial(jax.jit, static_argnames=("apply_a", "n", "num_samples", "dtype"))
def _diag_op(seed, *operands, apply_a, n: int, num_samples: int, dtype):
    return _diag_body(lambda x: apply_a(x, *operands), seed, n,
                      num_samples, dtype)


def diag_estimate(a, seed=0, num_samples: int = 128, n: int = None,
                  dtype=jnp.float32,
                  operands=()) -> Tuple[jax.Array, jax.Array]:
    """Stochastic diagonal estimation (Bekas-Kokiopoulou-Saad 2007):
    diag(A) = E[g * (A g)] for Rademacher g (elementwise product).

    ``a``: square matrix or matrix-free operator ``apply_a(X, *operands)
    -> A X`` (pass ``n``; see :func:`hutchinson` for the calling
    convention and jit-closure rules).

    Returns ``(diag_est, stderr)`` with per-entry sample standard errors.
    One GEMM of shape (n x n)(n x m) regardless of m — batching the probes
    is free on the MXU relative to m separate matvecs.
    """
    if callable(a):
        if n is None:
            raise ValueError("matrix-free diag_estimate needs n")
        return _diag_op(seed, *operands, apply_a=a, n=int(n),
                        num_samples=num_samples, dtype=jnp.dtype(dtype))
    return _diag_dense(jnp.asarray(a), seed, num_samples)
