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


def test_single_process_rowspace_matches_project(rng):
    """finish='rowspace' on the multihost driver (single-process
    degenerate path): same recovery on a decaying spectrum, one fewer
    pass + one fewer co-range all-reduce."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.multihost import (
        rsvd_streaming_multihost,
    )

    a = (rng.standard_normal((220, 6)) @ rng.standard_normal((6, 140))
         + 1e-7 * rng.standard_normal((220, 140))).astype(np.float32)
    u, s, v = rsvd_streaming_multihost(a, k=8, p=6, q=2, panel_rows=64,
                                       finish="rowspace")
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    assert np.linalg.norm(rec - a) < 1e-4 * np.linalg.norm(a)
    # orthonormal within the numerical rank (k=8 > rank 6: trailing U
    # columns are zeroed by the tiny-sigma guard, not normalized noise)
    un = np.asarray(u)[:, :6]
    assert np.abs(un.T @ un - np.eye(6)).max() < 1e-4
    assert np.linalg.norm(np.asarray(u)[:, 6:]) < 1e-6
    u2, s2, v2 = rsvd_streaming_multihost(a, k=8, p=6, q=2, panel_rows=64)
    np.testing.assert_allclose(np.asarray(s)[:6], np.asarray(s2)[:6],
                               rtol=1e-3)
    import pytest

    with pytest.raises(ValueError):
        rsvd_streaming_multihost(a, k=8, q=0, finish="rowspace")


def test_rowspace_small_norm_keeps_directions(rng):
    """The rowspace tail's rank cutoff must be scale-FREE: on data with
    ||A|| << 1 (normalized inputs) an absolute eps floor would zero
    genuine small singular directions (advisor finding, round 3).  Every
    true direction here sits well above eps*lam_max but far below an
    absolute f32-eps floor."""
    svals = np.array([1e-2, 5e-3, 1e-3, 1e-4], np.float32)
    qm, _ = np.linalg.qr(rng.standard_normal((180, 4)))
    qn, _ = np.linalg.qr(rng.standard_normal((120, 4)))
    a = (qm * svals[None, :]) @ qn.T
    a = a.astype(np.float32)
    u, s, v = rsvd_streaming_multihost(a, k=4, p=4, q=2, panel_rows=64,
                                       finish="rowspace")
    u_np, s_np = np.asarray(u), np.asarray(s)
    np.testing.assert_allclose(s_np, svals, rtol=5e-2)
    # all four directions kept and orthonormal — none zeroed by an
    # absolute floor (s=1e-4 < sqrt(eps_f32) would have been dropped)
    assert np.abs(u_np.T @ u_np - np.eye(4)).max() < 1e-3
    assert np.linalg.norm(u_np, axis=0).min() > 0.99


def test_multihost_checkpoint_resume(tmp_path, rng, monkeypatch):
    """Single-process exercise of the multihost checkpoint protocol:
    full resume recomputes nothing; deleting a later stage resumes from
    the global minimum completed stage."""
    import os

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import multihost as mh
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import streaming as sm
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.multihost import (
        rsvd_streaming_multihost,
    )

    calls = {"passes": 0}
    orig_r = sm._stream_right_multiply
    orig_l = sm._stream_left_t_multiply

    def right(*a, **kw):
        calls["passes"] += 1
        return orig_r(*a, **kw)

    def left(*a, **kw):
        calls["passes"] += 1
        return orig_l(*a, **kw)

    monkeypatch.setattr(mh, "_stream_right_multiply", right)
    monkeypatch.setattr(mh, "_stream_left_t_multiply", left)

    a = (rng.standard_normal((200, 5)) @ rng.standard_normal((5, 130))
         ).astype(np.float32)
    ck = str(tmp_path / "mh")
    u1, s1, v1 = rsvd_streaming_multihost(a, k=5, p=5, q=2, panel_rows=64,
                                          checkpoint_dir=ck)
    assert calls["passes"] == 6
    calls["passes"] = 0
    u2, s2, v2 = rsvd_streaming_multihost(a, k=5, p=5, q=2, panel_rows=64,
                                          checkpoint_dir=ck)
    assert calls["passes"] == 0
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    # crash between round1 and the projection: resume replays only those
    os.remove(os.path.join(ck, "host0", "round1.npy"))
    os.remove(os.path.join(ck, "host0", "b_final.npy"))
    calls["passes"] = 0
    u3, s3, v3 = rsvd_streaming_multihost(a, k=5, p=5, q=2, panel_rows=64,
                                          checkpoint_dir=ck)
    assert calls["passes"] == 3
    np.testing.assert_allclose(np.asarray(s3), np.asarray(s1), rtol=1e-6)


def test_unwritable_checkpoint_dir_degrades(rng):
    """An unwritable checkpoint path must not abort (or, multi-process,
    desynchronize) the run: the driver degrades to no-checkpoint and
    factors normally (advisor finding r3: differing code paths before
    the stage all-reduce could deadlock a fleet)."""
    a = (rng.standard_normal((120, 5)) @ rng.standard_normal((5, 80))
         ).astype(np.float32)
    u, s, v = rsvd_streaming_multihost(
        a, k=5, p=5, q=1, panel_rows=64,
        checkpoint_dir="/proc/definitely-not-writable")
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    assert np.linalg.norm(rec - a) < 1e-3 * np.linalg.norm(a)


def _gapped64(rng, m, n, lo=1e-4):
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    s = np.geomspace(1.0, lo, min(m, n))
    return ((u * s) @ v.T).astype(np.float64)


class TestMultihostUtvFinishes:
    """Serving tails on the multihost driver (VERDICT r4 item 3):
    single-process degenerate coverage; the 2-process collective-order
    exercise lives in tests/_multihost_worker.py."""

    def test_utv_full_rank_matches_project(self, rng):
        a = _gapped64(rng, 200, 120, 1e-3)
        k = 16
        u1, s1, v1 = rsvd_streaming_multihost(
            a, k=k, p=0, q=2, panel_rows=64, dtype=jnp.float64,
            finish="utv")
        u2, s2, v2 = rsvd_streaming_multihost(
            a, k=k, p=0, q=2, panel_rows=64, dtype=jnp.float64,
            finish="project")
        rec1 = np.asarray(u1) * np.asarray(s1)[None, :] @ np.asarray(v1).T
        rec2 = np.asarray(u2) * np.asarray(s2)[None, :] @ np.asarray(v2).T
        np.testing.assert_allclose(rec1, rec2, atol=1e-10)
        # contract: V orthonormal, U unit-column, s descending weights
        v_np, u_np = np.asarray(v1), np.asarray(u1)
        np.testing.assert_allclose(v_np.T @ v_np, np.eye(k), atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(u_np, axis=0),
                                   np.ones(k), atol=1e-9)
        assert np.all(np.diff(np.asarray(s1)) <= 1e-12)

    def test_rowspace_utv_serving_config(self, rng):
        """The full serving stack out of core: 2q+1 passes, single-pass
        distributed QRs (qr_method='cholqr1' => ONE Gram all-reduce per
        basis QR), thin-QR tail — truncation near optimal."""
        a = _gapped64(rng, 220, 140, 1e-4).astype(np.float32)
        k = 12
        u, s, v = rsvd_streaming_multihost(
            a, k=k, p=10, q=2, panel_rows=80, finish="rowspace_utv",
            qr_method="cholqr1")
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        s_true = np.linalg.svd(a.astype(np.float64), compute_uv=False)
        opt = np.sqrt((s_true[k:] ** 2).sum())
        assert np.linalg.norm(rec - a) < 1.35 * opt
        v_np = np.asarray(v)
        assert np.abs(v_np.T @ v_np - np.eye(k)).max() < 1e-3

    def test_utv_checkpoint_resume(self, tmp_path, rng, monkeypatch):
        import os

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import multihost as mh
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import streaming as sm

        calls = {"passes": 0}
        orig_r = sm._stream_right_multiply
        orig_l = sm._stream_left_t_multiply
        monkeypatch.setattr(mh, "_stream_right_multiply",
                            lambda *a, **kw: (calls.__setitem__(
                                "passes", calls["passes"] + 1),
                                orig_r(*a, **kw))[1])
        monkeypatch.setattr(mh, "_stream_left_t_multiply",
                            lambda *a, **kw: (calls.__setitem__(
                                "passes", calls["passes"] + 1),
                                orig_l(*a, **kw))[1])
        a = (rng.standard_normal((200, 5)) @ rng.standard_normal((5, 130))
             ).astype(np.float32)
        ck = str(tmp_path / "mh_utv")
        u1, s1, v1 = rsvd_streaming_multihost(
            a, k=5, p=5, q=2, panel_rows=64, finish="utv",
            checkpoint_dir=ck)
        assert calls["passes"] == 6          # same passes as project
        calls["passes"] = 0
        u2, s2, v2 = rsvd_streaming_multihost(
            a, k=5, p=5, q=2, panel_rows=64, finish="utv",
            checkpoint_dir=ck)
        assert calls["passes"] == 0
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
        # crash before the projection stage: only that pass replays
        os.remove(os.path.join(ck, "host0", "b_final.npy"))
        calls["passes"] = 0
        u3, s3, v3 = rsvd_streaming_multihost(
            a, k=5, p=5, q=2, panel_rows=64, finish="utv",
            checkpoint_dir=ck)
        assert calls["passes"] == 1
        np.testing.assert_allclose(np.asarray(s3), np.asarray(s1),
                                   rtol=1e-6)
