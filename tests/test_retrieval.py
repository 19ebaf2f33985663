"""Embedding factorization + sharded top-k retrieval tests (the
BASELINE.json recsys_embed role)."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.apps import retrieval
from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import shard_rows


def _interactions(rng, n_users=128, n_items=96, rank=6):
    return (rng.standard_normal((n_users, rank)) @
            rng.standard_normal((rank, n_items)))


def test_factorization_approximates_interactions(rng):
    a = _interactions(rng)
    tables = retrieval.factorize_interactions(jnp.asarray(a), k=8)
    approx = np.asarray(tables.users) @ np.asarray(tables.items).T
    rel = np.linalg.norm(approx - a) / np.linalg.norm(a)
    assert rel < 1e-8


def test_top_k_matches_dense_argmax(rng):
    a = _interactions(rng)
    tables = retrieval.factorize_interactions(jnp.asarray(a), k=8)
    ids = jnp.asarray([0, 5, 17])
    vals, items = retrieval.top_k_items(tables, ids, k=5)
    scores = np.asarray(retrieval.score(tables, ids))
    expect = np.argsort(-scores, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(items), expect)


def test_quantized_retrieval(rng):
    """int8 tables: scores within quantization error; top-k mostly agrees
    with the f32 ranking."""
    a = _interactions(rng, n_users=96, n_items=120, rank=8)
    tables = retrieval.factorize_interactions(jnp.asarray(a), k=8)
    qt = retrieval.quantize_tables(tables)
    assert qt.users_q.dtype.name == "int8" and qt.items_q.dtype.name == "int8"
    ids = jnp.asarray([0, 7, 33])
    full = np.asarray(retrieval.score(tables, ids))
    quant = np.asarray(retrieval.score_quantized(qt, ids))
    scale = np.abs(full).max()
    assert np.abs(full - quant).max() < 0.03 * scale
    vals_q, items_q = retrieval.top_k_items_quantized(qt, ids, k=10)
    vals_f, items_f = retrieval.top_k_items(tables, ids, k=10)
    # top-10 overlap >= 8/10 per user under 1% quantization noise
    for r in range(3):
        overlap = len(set(np.asarray(items_q)[r]) & set(np.asarray(items_f)[r]))
        assert overlap >= 8, overlap


def test_sharded_top_k_matches_single_device(mesh8, rng):
    a = _interactions(rng, n_users=64, n_items=128)
    a_sh = shard_rows(jnp.asarray(a), mesh8)
    tables = retrieval.factorize_interactions(a_sh, k=8)
    user_batch = tables.users[:4]
    vals_s, ids_s = retrieval.top_k_items_sharded(mesh8, tables, user_batch, k=7)
    vals_d, ids_d = jnp.asarray(user_batch) @ tables.items.T, None
    scores = np.asarray(jnp.matmul(user_batch, tables.items.T))
    expect_ids = np.argsort(-scores, axis=1)[:, :7]
    np.testing.assert_array_equal(np.asarray(ids_s), expect_ids)
    np.testing.assert_allclose(
        np.asarray(vals_s),
        np.take_along_axis(scores, expect_ids, axis=1),
        rtol=1e-10,
    )
