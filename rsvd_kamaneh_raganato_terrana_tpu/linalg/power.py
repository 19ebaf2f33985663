"""Power-method SVD with deflation.

TPU-native re-design of the reference's PM + powerMethodSVD pair
(src/PM.cpp:4-81, include/SVD_class.hpp:184-219; also
image_compression/src/{PowerMethod,SVD}.cpp).

Differences from the reference, by design:

- The reference forms B = A^T A up front and iterates x <- B x with a
  hand-rolled row-partitioned mat-vec + Gatherv + root-normalize + Bcast per
  iteration.  Here the iteration is x <- normalize(A^T (A x)) — two sharded
  mat-vecs whose reductions XLA lowers to psum over ICI — so B (n x n) is
  never materialized and the method scales to n where B would not fit.
- Deflation A <- A - sigma u v^T is threaded functionally through a
  `lax.scan` carry instead of mutating A in place; the B-recompute variant
  (image_compression/src/SVD.cpp:46-52) is unnecessary because there is no B.
- The reference early-exits and conservativeResize's when sigma < 1e-12
  (SVD_class.hpp:198-209).  Under jit shapes are static, so we compute all k
  triplets and zero out those with negligible sigma; `effective_rank` in the
  result carries the reference's truncation information.

The iteration count uses the same theoretical bound as the reference
(src/PM.cpp:25-28): s = ceil(log(4 log(2n/delta)/(eps delta)) / (2 lambda))
with eps=1e-10 (accuracy), delta=0.05 (failure prob), lambda=0.1 (gap).
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION

DEFLATION_CUTOFF = 1e-12  # reference SVD_class.hpp:198


def theoretical_iterations(n: int, eps: float = 1e-10, delta: float = 0.05,
                           lam: float = 0.1) -> int:
    """Reference iteration bound (src/PM.cpp:25-28): ~148 for n=100."""
    return int(math.ceil(
        math.log(4.0 * math.log(2.0 * n / delta) / (eps * delta)) / (2.0 * lam)
    ))


def _matvec(a, x):
    return jnp.matmul(a, x, precision=DOT_PRECISION,
                      preferred_element_type=a.dtype)


def power_triplet(a, x0, num_iters: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dominant singular triplet (sigma, u, v) of ``a`` by power iteration
    on the Gram operator, B-free (reference PM, src/PM.cpp:4-81)."""

    def body(_, x):
        y = _matvec(a, x)           # m
        z = _matvec(a.T, y)         # n  — together: B x without forming B
        return z / jnp.linalg.norm(z)

    x = x0 / jnp.linalg.norm(x0)
    v = jax.lax.fori_loop(0, num_iters, body, x)
    av = _matvec(a, v)
    sigma = jnp.linalg.norm(av)
    u = av / jnp.maximum(sigma, jnp.finfo(a.dtype).tiny)
    return sigma, u, v


class PowerSVDResult(NamedTuple):
    u: jax.Array
    s: jax.Array
    v: jax.Array
    effective_rank: jax.Array  # number of sigma_i above the deflation cutoff


def power_svd(
    a,
    k: Optional[int] = None,
    num_iters: Optional[int] = None,
    seed: int = 0,
    deflation_cutoff: float = DEFLATION_CUTOFF,
) -> PowerSVDResult:
    """Truncated SVD by repeated power iteration + deflation
    (reference powerMethodSVD, SVD_class.hpp:184-219).

    Note the reference stores V transposed on this path (``V_.row(i) = v``,
    SVD_class.hpp:214) and makes callers compensate; we return V in the
    standard n x k orientation on every method.
    """
    a = jnp.asarray(a)
    m, n = a.shape
    if k is None:
        k = min(m, n)
    if num_iters is None:
        num_iters = theoretical_iterations(n)

    key = jax.random.PRNGKey(seed)
    x0s = jax.random.normal(key, (k, n), a.dtype)
    cutoff = jnp.asarray(deflation_cutoff, a.dtype)

    def step(a_res, x0):
        sigma, u, v = power_triplet(a_res, x0, num_iters)
        keep = sigma > cutoff
        sigma = jnp.where(keep, sigma, 0.0)
        u = jnp.where(keep, u, 0.0)
        v = jnp.where(keep, v, 0.0)
        a_next = a_res - sigma * jnp.outer(u, v)
        return a_next, (sigma, u, v)

    _, (s, us, vs) = jax.lax.scan(step, a, x0s)
    eff = jnp.sum(s > 0).astype(jnp.int32)
    return PowerSVDResult(us.T, s, vs.T, eff)
