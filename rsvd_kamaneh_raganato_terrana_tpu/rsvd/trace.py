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


def _quad_forms(a, g):
    """g_j^T (A g_j) for every column j — one GEMM + a contraction."""
    return jnp.einsum("ij,ij->j", g, _mm(a, g, _HI),
                      precision=_HI)


@partial(jax.jit, static_argnames=("num_samples", "kind"))
def hutchinson(a, seed=0, num_samples: int = 64,
               kind: str = "rademacher") -> Tuple[jax.Array, jax.Array]:
    """Girard-Hutchinson trace estimator.

    Returns ``(estimate, stderr)`` where stderr is the sample standard
    error of the ``num_samples`` independent quadratic forms — an honest,
    data-driven confidence readout (the theory bound ~||A||_F/sqrt(m) is
    not computable without A's entries).

    Rademacher probes (default) have strictly smaller variance than
    Gaussian for the same m: Var = 2(||A_sym||_F^2 - sum a_ii^2)/m.
    """
    n = a.shape[0]
    g = sketch_matrix(key_from_seed(seed), n, num_samples, a.dtype, kind)
    quad = _quad_forms(a, g)
    est = jnp.mean(quad)
    se = jnp.std(quad, ddof=1) / jnp.sqrt(jnp.asarray(float(num_samples),
                                                      quad.dtype))
    return est, se


@partial(jax.jit, static_argnames=("budget", "kind"))
def hutchpp(a, seed=0, budget: int = 96,
            kind: str = "rademacher") -> jax.Array:
    """Hutch++: variance-reduced trace estimation in a 3-way budget split.

    With m = budget//3: sketch S (n x m) captures range(A)'s dominant
    subspace Q = orth(A S) whose trace contribution tr(Q^T A Q) is computed
    EXACTLY; plain Hutchinson runs only on the doubly-deflated residual
    (I - QQ^T) A (I - QQ^T).  Total A-multiplications: 3m = budget, same
    cost as hutchinson(num_samples=budget), but the error scales with the
    residual ||A - A_m||_F instead of ||A||_F — for PSD A this gives the
    optimal O(1/m) relative error vs Hutchinson's O(1/sqrt(m)).
    """
    n = a.shape[0]
    m = max(budget // 3, 1)
    key = key_from_seed(seed)
    ks, kg = jax.random.split(key)
    s = sketch_matrix(ks, n, m, a.dtype, kind)
    g = sketch_matrix(kg, n, m, a.dtype, kind)
    q = orthonormal_basis(_mm(a, s, _HI), "robust")
    t_range = jnp.trace(_mm(q.T, _mm(a, q, _HI), _HI))
    # (I - QQ^T) g deflates BOTH sides of each residual quadratic form
    # (the projector is symmetric): g'^T A g' = g^T (I-P) A (I-P) g.
    gp = g - _mm(q, _mm(q.T, g, _HI), _HI)
    return t_range + jnp.mean(_quad_forms(a, gp))


@partial(jax.jit, static_argnames=("num_samples",))
def diag_estimate(a, seed=0, num_samples: int = 128
                  ) -> Tuple[jax.Array, jax.Array]:
    """Stochastic diagonal estimation (Bekas-Kokiopoulou-Saad 2007):
    diag(A) = E[g * (A g)] for Rademacher g (elementwise product).

    Returns ``(diag_est, stderr)`` with per-entry sample standard errors.
    One GEMM of shape (n x n)(n x m) regardless of m — batching the probes
    is free on the MXU relative to m separate matvecs.
    """
    n = a.shape[0]
    g = sketch_matrix(key_from_seed(seed), n, num_samples, a.dtype,
                      "rademacher")
    prod = g * _mm(a, g, _HI)                      # n x m, row i -> a_ii
    est = jnp.mean(prod, axis=1)
    se = jnp.std(prod, axis=1, ddof=1) / jnp.sqrt(
        jnp.asarray(float(num_samples), prod.dtype))
    return est, se
