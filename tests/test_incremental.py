"""Incremental SVD tests (the reference's intended-but-dead feature,
POD.cpp:464-799, implemented as Brand's column-append update)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.linalg.incremental import (
    IncrementalSVD,
    svd_append_columns,
)
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import svd


@pytest.mark.slow
def test_exact_append_matches_batch(rng):
    a = rng.standard_normal((40, 25))
    c = rng.standard_normal((40, 10))
    u, s, v = svd(jnp.asarray(a), "eigh")
    u2, s2, v2 = svd_append_columns(u, s, v, jnp.asarray(c))
    full = np.concatenate([a, c], axis=1)
    s_np = np.linalg.svd(full, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s2), s_np, rtol=1e-7, atol=1e-9)
    rec = np.asarray((u2 * s2[None, :]) @ v2.T)
    np.testing.assert_allclose(rec, full, atol=1e-8)


@pytest.mark.slow
def test_truncated_append_near_optimal(rng):
    base = rng.standard_normal((60, 8)) @ rng.standard_normal((8, 30))
    more = rng.standard_normal((60, 8)) @ rng.standard_normal((8, 12))
    u, s, v = svd(jnp.asarray(base), "eigh", r=12)
    u2, s2, v2 = svd_append_columns(u, s, v, jnp.asarray(more), rank=12)
    full = np.concatenate([base, more], axis=1)
    s_np = np.linalg.svd(full, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s2)[:8], s_np[:8], rtol=1e-6)


@pytest.mark.slow
def test_streaming_class_tracks_snapshots(rng):
    """Stream snapshot batches like an online POD; rank-capped factors
    must track the dominant subspace."""
    modes = np.linalg.qr(rng.standard_normal((50, 4)))[0]
    inc = IncrementalSVD(rank=8)
    cols = []
    for t in range(6):
        batch = modes @ (np.diag([10, 5, 2, 1]) @ rng.standard_normal((4, 5)))
        cols.append(batch)
        inc.update(jnp.asarray(batch))
    assert inc.n_seen == 30
    full = np.concatenate(cols, axis=1)
    s_np = np.linalg.svd(full, compute_uv=False)
    u, s, v = inc.factors()
    np.testing.assert_allclose(np.asarray(s)[:4], s_np[:4], rtol=1e-6)
    # U spans the true mode subspace
    proj = modes.T @ np.asarray(u)[:, :4]
    np.testing.assert_allclose(np.abs(np.linalg.svd(proj, compute_uv=False)),
                               np.ones(4), atol=1e-6)
