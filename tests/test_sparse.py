"""Sparse (BCOO) input support: the recsys_embed role factors sparse
interaction matrices without densifying them (BASELINE.json north star)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import sparse

from rsvd_kamaneh_raganato_terrana_tpu.apps import retrieval
from rsvd_kamaneh_raganato_terrana_tpu.rsvd import reconstruction_error, rsvd


def _sparse_lowrank(rng, m, n, r, density=0.08):
    """Low-rank interaction pattern with sparse observation mask."""
    full = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    mask = rng.random((m, n)) < density
    return np.where(mask, full, 0.0)


@pytest.mark.slow
def test_rsvd_accepts_bcoo(rng):
    d = _sparse_lowrank(rng, 120, 90, 5)
    a_sp = sparse.BCOO.fromdense(jnp.asarray(d))
    u, s, v = rsvd(a_sp, k=10, p=6, q=2)
    assert u.shape == (120, 10) and v.shape == (90, 10)
    # must match the dense factorization exactly (same sketch stream)
    u_d, s_d, v_d = rsvd(jnp.asarray(d), k=10, p=6, q=2)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_d), rtol=1e-8)


@pytest.mark.slow
def test_sparse_diagonal_exact(input_matrices):
    """The reference's diagonal .mtx inputs, fed as actual sparse."""
    d = input_matrices["sparse_matrix100.mtx"]
    a_sp = sparse.BCOO.fromdense(jnp.asarray(d))
    u, s, v = rsvd(a_sp, k=0, p=16, q=2)
    err = float(reconstruction_error(jnp.asarray(d), u, s, v))
    opt = np.sqrt(max(0.0, 100 - 16))  # identity: sigma all 1
    assert err <= opt * 1.001 + 1e-9


@pytest.mark.slow
def test_sparse_embeddings_end_to_end(rng):
    d = _sparse_lowrank(rng, 96, 64, 4, density=0.15)
    a_sp = sparse.BCOO.fromdense(jnp.asarray(d))
    tables = retrieval.factorize_interactions(a_sp, k=8)
    scores = np.asarray(tables.users) @ np.asarray(tables.items).T
    # near-optimal rank-8 approximation of the (full-rank) masked matrix
    s_np = np.linalg.svd(d, compute_uv=False)
    opt = float(np.sqrt((s_np[8:] ** 2).sum()))
    assert np.linalg.norm(scores - d) <= opt * 1.1
    vals, ids = retrieval.top_k_items(tables, jnp.asarray([0, 3]), k=5)
    assert ids.shape == (2, 5)
