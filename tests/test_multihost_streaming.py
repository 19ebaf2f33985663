"""Multi-host streaming rSVD (rsvd/multihost.py).

Single-process coverage here (the degenerate path plus numerical parity
with the in-core/streaming drivers); the genuine 2-process DCN exercise
lives in tests/_multihost_worker.py, launched by test_multihost.py.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.multihost import (
    rsvd_streaming_multihost,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import rsvd_streaming


@pytest.fixture
def lowrank(rng):
    m, n, r = 300, 220, 24
    a = (rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
         + 1e-3 * rng.standard_normal((m, n)))
    return a.astype(np.float64)


def test_single_process_matches_streaming(lowrank):
    k = 24
    u_m, s_m, v_m = rsvd_streaming_multihost(lowrank, k=k, p=8, q=2,
                                             panel_rows=64,
                                             dtype=jnp.float64)
    u_s, s_s, v_s = rsvd_streaming(lowrank, k=k, p=8, q=2, panel_rows=64,
                                   method="eigh", dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(s_m), np.asarray(s_s),
                               rtol=1e-8, atol=1e-10)
    rec_m = np.asarray(u_m) @ np.diag(np.asarray(s_m)) @ np.asarray(v_m).T
    rec_s = np.asarray(u_s) @ np.diag(np.asarray(s_s)) @ np.asarray(v_s).T
    np.testing.assert_allclose(
        np.linalg.norm(lowrank - rec_m), np.linalg.norm(lowrank - rec_s),
        rtol=1e-6, atol=1e-8)


def test_factor_contract(lowrank):
    """Shapes, orthogonality, descending spectrum, local-rows semantics."""
    k = 16
    u, s, v = rsvd_streaming_multihost(lowrank, k=k, p=8, q=1,
                                       panel_rows=100, dtype=jnp.float64)
    assert u.shape == (lowrank.shape[0], k)
    assert s.shape == (k,)
    assert v.shape == (lowrank.shape[1], k)
    s_np = np.asarray(s)
    assert np.all(np.diff(s_np) <= 1e-12)
    eye = np.eye(k)
    assert np.linalg.norm(np.asarray(u).T @ np.asarray(u) - eye) < 1e-8
    assert np.linalg.norm(np.asarray(v).T @ np.asarray(v) - eye) < 1e-8


def test_memmap_shard_source(tmp_path, rng):
    """The per-host shard may be an np.memmap (the design target)."""
    m, n, k = 256, 180, 12
    a = (rng.standard_normal((m, 12)) @ rng.standard_normal((12, n))
         ).astype(np.float32)
    path = tmp_path / "shard.bin"
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(m, n))
    mm[:] = a
    mm.flush()
    ro = np.memmap(path, dtype=np.float32, mode="r", shape=(m, n))
    u, s, v = rsvd_streaming_multihost(ro, k=k, p=8, q=1, panel_rows=90)
    rec = np.asarray(u) @ np.diag(np.asarray(s)) @ np.asarray(v).T
    assert np.linalg.norm(a - rec) / np.linalg.norm(a) < 1e-4
