"""Power-method SVD tests (reference: PM.cpp + powerMethodSVD; the
iteration count uses the same theoretical bound, ~148 for n=100)."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.linalg.power import (
    power_svd,
    power_triplet,
    theoretical_iterations,
)


def test_theoretical_iterations_matches_reference():
    assert theoretical_iterations(100) == 148  # src/PM.cpp:25-28 for n=100


def test_dominant_triplet(rng):
    a = rng.standard_normal((80, 50))
    x0 = jnp.asarray(rng.standard_normal(50))
    sigma, u, v = power_triplet(jnp.asarray(a), x0, 200)
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(float(sigma), s_np[0], rtol=1e-8)
    # u, v are unit singular vectors: A v = sigma u
    np.testing.assert_allclose(np.asarray(a @ np.asarray(v)),
                               float(sigma) * np.asarray(u), atol=1e-6)


def test_truncated_svd(rng):
    a = rng.standard_normal((60, 40))
    res = power_svd(jnp.asarray(a), k=5)
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(res.s), s_np[:5], rtol=1e-5)
    # V standard orientation (n x k), unlike the reference's transposed quirk
    assert res.v.shape == (40, 5)
    recon = np.asarray((res.u * res.s[None, :]) @ res.v.T)
    best = (np.linalg.svd(a, compute_uv=False)[5:] ** 2).sum() ** 0.5
    assert np.linalg.norm(a - recon) < best * 1.01


def test_deflation_cutoff(rng):
    """Rank-3 matrix: sigma_4.. below cutoff must come back as exact zeros
    with effective_rank == 3 (reference early-exit, SVD_class.hpp:198-209)."""
    b = rng.standard_normal((30, 3))
    a = b @ rng.standard_normal((3, 20))
    res = power_svd(jnp.asarray(a), k=6)
    assert int(res.effective_rank) == 3
    assert np.all(np.asarray(res.s)[3:] == 0.0)
