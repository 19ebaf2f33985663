"""Posterior error certificates and subspace diagnostics.

The rSVD's a-priori error bounds need spectrum knowledge a user doesn't
have; these utilities give cheap A-POSTERIORI answers instead:

- ``range_error_estimate``: a high-probability upper bound on
  ||(I - QQ^T) A||_2 from r Gaussian probes (Halko-Martinsson-Tropp 2011,
  Alg. 4.3 / eq. 4.3): with probability >= 1 - 10^{-r},
  ||E||_2 <= 10 sqrt(2/pi) max_i ||E g_i||_2.  Two GEMMs; certifies a
  computed factorization without ever forming the residual.
- ``factorization_error_estimate``: same certificate for a full
  (U, s, V) triple (||A - U diag(s) V^T||_2).
- ``principal_angles``: angles between two subspaces (the standard
  cos-SVD formulation) — the right metric for "did the sketch capture
  the same subspace" questions that raw factor comparison (sign/rotation
  ambiguous) gets wrong.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed
from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import DOT_PRECISION as _HI
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm


# The certificate requires probes INDEPENDENT of the factorization being
# certified.  generate_omega(seed, ...) and these estimators both accept
# "seed=0" defaults, so without a salt the probes would be bit-identical
# to the rSVD sketch Omega drawn from the same seed — and (I - QQ^T) A g
# would be ~0 by construction, silently certifying garbage.  fold_in with
# a fixed tag puts the probes on a disjoint stream for every seed.
_PROBE_TAG = 0x9E3779B9  # golden-ratio constant, arbitrary fixed tag


def _probe_key(seed):
    return jax.random.fold_in(key_from_seed(seed), _PROBE_TAG)


@partial(jax.jit, static_argnames=("num_probes",))
def range_error_estimate(a, q_mat, seed=0, num_probes: int = 10
                         ) -> jax.Array:
    """Certified upper bound on ||(I - QQ^T) A||_2, holding with
    probability >= 1 - 10^{-num_probes} over the probes (drawn from a
    stream disjoint from `generate_omega`'s for the same seed)."""
    n = a.shape[1]
    g = jax.random.normal(_probe_key(seed), (n, num_probes), a.dtype)
    ag = _mm(a, g, _HI)                            # m x r
    resid = ag - _mm(q_mat, _mm(q_mat.T, ag, _HI), _HI)
    norms = jnp.sqrt(jnp.sum(resid * resid, axis=0))
    return 10.0 * jnp.sqrt(2.0 / jnp.pi) * jnp.max(norms)


@partial(jax.jit, static_argnames=("num_probes",))
def factorization_error_estimate(a, u, s, v, seed=0, num_probes: int = 10
                                 ) -> jax.Array:
    """Certified upper bound on ||A - U diag(s) V^T||_2 (same probe
    argument applied to the factorization residual operator; probes come
    from the salted stream — see `_probe_key`)."""
    n = a.shape[1]
    g = jax.random.normal(_probe_key(seed), (n, num_probes), a.dtype)
    eg = _mm(a, g, _HI) - _mm(u * s[None, :], _mm(v.T, g, _HI), _HI)
    norms = jnp.sqrt(jnp.sum(eg * eg, axis=0))
    return 10.0 * jnp.sqrt(2.0 / jnp.pi) * jnp.max(norms)


@jax.jit
def principal_angles(u, v) -> Tuple[jax.Array, jax.Array]:
    """Principal angles between span(u) and span(v) (columns need not be
    orthonormal — both are orthonormalized first).  Returns
    ``(angles_radians, cosines)``, angles ascending in [0, pi/2]."""
    qu, _ = jnp.linalg.qr(u)
    qv, _ = jnp.linalg.qr(v)
    sv = jnp.linalg.svd(_mm(qu.T, qv, _HI), compute_uv=False)
    cos = jnp.clip(sv, 0.0, 1.0)   # descending, so arccos is ascending
    return jnp.arccos(cos), cos


def subspace_distance(u, v) -> jax.Array:
    """sin of the largest principal angle — the standard subspace metric
    (0 = identical spans, 1 = some direction fully missed)."""
    _, cos = principal_angles(u, v)
    return jnp.sqrt(jnp.maximum(1.0 - jnp.min(cos) ** 2, 0.0))


@jax.jit
def _factor_health_device(u, s, v):
    """Five scalars, one fused program: [finite, max |col-norm(U) - 1|,
    max |V^T V - I|, worst ascending violation of s, min s]."""
    finite = (jnp.all(jnp.isfinite(u)) & jnp.all(jnp.isfinite(s))
              & jnp.all(jnp.isfinite(v)))
    ucol = jnp.max(jnp.abs(jnp.sqrt(jnp.sum(u * u, axis=0)) - 1.0))
    vtv = _mm(v.T, v, _HI)
    vort = jnp.max(jnp.abs(vtv - jnp.eye(vtv.shape[0], dtype=vtv.dtype)))
    asc = jnp.max(jnp.concatenate(
        [jnp.diff(s), jnp.zeros((1,), s.dtype)]))
    stats = jnp.stack([finite.astype(s.dtype), ucol, vort, asc,
                       jnp.min(s)])
    # NaN factors must make every stat read as unhealthy, not propagate
    # into a NaN that compares False against thresholds by accident
    return jnp.where(finite, stats,
                     jnp.stack([jnp.zeros((), s.dtype)] + [jnp.full(
                         (), jnp.inf, s.dtype)] * 4))


def factor_health(u, s, v, tol: float = 1e-2) -> dict:
    """Cheap POST-HOC health check of a factorization triple — the
    library-level signal `cholqr1`'s serving contract lacks (VERDICT r4
    item 5: the fastest serving config returns NaNs on rank-deficient
    input with no flag outside the CLI).

    One fused device program + ONE 5-element fetch, off the serving
    path.  Checks the contracts every finish shares: all entries finite,
    U unit-column (orthonormal U also passes — unit columns are the
    weaker UTV-finish guarantee), V orthonormal, s descending.  Returns
    ``{"ok": bool, "finite": bool, "u_col_err": float, "v_orth_err":
    float, "s_ascending_violation": float, "s_min": float}``; ``ok`` is
    the conjunction at ``tol`` (default 1e-2 — loose enough for the
    cholqr1/polar O(eps cond^2) serving orthogonality, tight enough that
    NaNs, zeroed columns, or a polar rank-deficiency collapse all
    trip it).
    """
    import numpy as np

    stats = np.asarray(jax.device_get(_factor_health_device(u, s, v)))
    finite = bool(stats[0] > 0.5)
    out = {
        "finite": finite,
        "u_col_err": float(stats[1]),
        "v_orth_err": float(stats[2]),
        "s_ascending_violation": float(stats[3]),
        "s_min": float(stats[4]),
    }
    out["ok"] = (finite and out["u_col_err"] < tol
                 and out["v_orth_err"] < tol
                 and out["s_ascending_violation"] <= 0.0)
    return out


@partial(jax.jit, static_argnames=("num_iters",))
def spectral_norm_estimate(a, seed=0, num_iters: int = 30) -> jax.Array:
    """||A||_2 estimate by power iteration on the Gram operator (B-free
    x <- A^T (A x) chain).  A lower bound that converges geometrically in
    (sigma_2/sigma_1)^2 — `num_iters=30` gives several digits unless the
    top of the spectrum is nearly flat."""
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.power import power_triplet

    x0 = jax.random.normal(_probe_key(seed), (a.shape[1],), a.dtype)
    sigma, _, _ = power_triplet(a, x0, num_iters)
    return sigma


@partial(jax.jit, static_argnames=("num_iters",))
def stable_rank_estimate(a, seed=0, num_iters: int = 30) -> jax.Array:
    """Stable (numerical) rank  srank(A) = ||A||_F^2 / ||A||_2^2  — the
    rank-like quantity that drives sketch-size requirements and is robust
    to noise floors (unlike exact rank).  ||A||_F is exact (one pass);
    ||A||_2 from :func:`spectral_norm_estimate`, so the result is a
    slight OVER-estimate when the power iteration hasn't converged."""
    a = jnp.asarray(a)
    fro_sq = jnp.sum(jnp.square(a))
    sig = spectral_norm_estimate(a, seed=seed, num_iters=num_iters)
    return fro_sq / jnp.maximum(sig * sig, jnp.finfo(a.dtype).tiny)
