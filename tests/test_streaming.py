"""Out-of-core streaming rSVD: panel-streamed result must match the
in-core pipeline and handle memmap inputs + non-dividing panel sizes."""

import numpy as np
import pytest

import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import rsvd_streaming


def _lowrank(rng, m, n, r):
    return (rng.standard_normal((m, r)) @ rng.standard_normal((r, n)))


def test_streaming_matches_optimal(rng):
    a = _lowrank(rng, 300, 200, 7)
    u, s, v = rsvd_streaming(a, k=10, p=6, q=2, panel_rows=64,
                             dtype=jnp.float64)
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    assert np.linalg.norm(rec - a) < 1e-8 * np.linalg.norm(a)
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s)[:7], s_np[:7], rtol=1e-8)


def test_streaming_panel_invariance(rng):
    a = rng.standard_normal((257, 96))  # panels don't divide m
    outs = []
    for panel in (64, 97, 257):
        u, s, v = rsvd_streaming(a, k=8, p=8, q=1, panel_rows=panel,
                                 dtype=jnp.float64)
        outs.append(np.asarray(s))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-10)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-10)


def test_streaming_memmap(tmp_path, rng):
    a = _lowrank(rng, 200, 120, 5).astype(np.float32)
    path = str(tmp_path / "a.dat")
    mm = np.memmap(path, dtype=np.float32, mode="w+", shape=a.shape)
    mm[:] = a
    mm.flush()
    ro = np.memmap(path, dtype=np.float32, mode="r", shape=a.shape)
    u, s, v = rsvd_streaming(ro, k=6, p=6, q=1, panel_rows=50)
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    assert np.linalg.norm(rec - a) < 1e-3 * np.linalg.norm(a)


def test_streaming_shapes(rng):
    a = rng.standard_normal((100, 60))
    u, s, v = rsvd_streaming(a, k=9, p=4, q=0, panel_rows=32,
                             dtype=jnp.float64)
    assert u.shape == (100, 9) and s.shape == (9,) and v.shape == (60, 9)


def test_onepass_low_rank_recovery(rng):
    """One-pass two-sided sketch recovers a low-rank matrix near-exactly."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming_onepass,
    )

    a = (rng.standard_normal((200, 150)) @
         rng.standard_normal((12, 150)).T @
         rng.standard_normal((12, 150))).astype(np.float64)
    a = a / np.linalg.norm(a)
    u, s, v = rsvd_streaming_onepass(a, k=12, p=8, panel_rows=64,
                                     dtype=jnp.float64)
    rec = np.asarray((u * s[None, :]) @ v.T)
    assert np.linalg.norm(a - rec) / np.linalg.norm(a) < 1e-8
    # factors orthonormal
    assert np.abs(np.asarray(u.T @ u) - np.eye(12)).max() < 1e-8


def test_onepass_matches_full_svd_on_decaying_spectrum(rng):
    """On a fast-decaying spectrum the one-pass error is within a modest
    factor of the optimal rank-k error (Tropp et al. guarantee)."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming_onepass,
    )

    m = n = 120
    u0, _ = np.linalg.qr(rng.standard_normal((m, m)))
    v0, _ = np.linalg.qr(rng.standard_normal((n, n)))
    sig = 2.0 ** -np.arange(min(m, n), dtype=np.float64)
    a = (u0 * sig[None, :]) @ v0.T
    k = 10
    u, s, v = rsvd_streaming_onepass(a, k=k, p=10, panel_rows=50,
                                     dtype=jnp.float64)
    rec = np.asarray((u * s[None, :]) @ v.T)
    err = np.linalg.norm(a - rec)
    opt = np.linalg.norm(sig[k:])
    assert err < 10 * opt


def test_onepass_panel_invariance(rng):
    """One-pass results must not depend on the panel decomposition."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming_onepass,
    )

    a = (rng.standard_normal((120, 90)) @
         rng.standard_normal((90, 90))).astype(np.float64)
    outs = []
    for pr in (30, 50, 120):
        u, s, v = rsvd_streaming_onepass(a, k=8, p=6, panel_rows=pr,
                                         dtype=jnp.float64)
        outs.append((np.asarray(u), np.asarray(s), np.asarray(v)))
    for u, s, v in outs[1:]:
        np.testing.assert_allclose(s, outs[0][1], rtol=1e-9)
        np.testing.assert_allclose(np.abs(u), np.abs(outs[0][0]), atol=1e-8)


@pytest.mark.parametrize("panel_dtype", ["bfloat16", "int8"])
def test_streaming_compressed_panels(rng, panel_dtype):
    """Wire-compressed panels (bf16 halves, int8+row-scale quarters the
    H2D bytes) recover a truncation-dominated spectrum to within the
    compression's elementwise noise floor — the measured justification
    for panel_dtype on real out-of-core runs (VERDICT r2 item 2)."""
    m, n, r = 300, 200, 8
    a = (10.0 * rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
         + 1e-3 * rng.standard_normal((m, n)))
    u, s, v = rsvd_streaming(a, k=r, p=8, q=2, panel_rows=64,
                             dtype=jnp.float32, panel_dtype=panel_dtype)
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    u0, s0, v0 = rsvd_streaming(a, k=r, p=8, q=2, panel_rows=64,
                                dtype=jnp.float32)
    rec0 = np.asarray(u0) * np.asarray(s0)[None, :] @ np.asarray(v0).T
    # absolute recovery of the dominant subspace
    tol = 2e-3 if panel_dtype == "bfloat16" else 6e-3
    assert (np.linalg.norm(rec - a) / np.linalg.norm(a)
            < tol + np.linalg.norm(rec0 - a) / np.linalg.norm(a))
    # singular values match the uncompressed run to compression noise
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=2e-2)


@pytest.mark.parametrize("panel_dtype", ["bfloat16", "int8"])
def test_onepass_compressed_panels(rng, panel_dtype):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming_onepass,
    )

    m, n, r = 200, 150, 8
    a = (5.0 * rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
         + 1e-3 * rng.standard_normal((m, n)))
    u, s, v = rsvd_streaming_onepass(a, k=r, p=8, panel_rows=64,
                                     dtype=jnp.float32,
                                     panel_dtype=panel_dtype)
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    assert np.linalg.norm(rec - a) < 2e-2 * np.linalg.norm(a)


def test_int8_panel_row_scale_invariance(rng):
    """Per-ROW absmax scaling makes int8 panels scale-free per row: a
    matrix with wildly different row magnitudes quantizes each row at
    its own dynamic range (a single per-panel scale would zero out the
    small rows entirely)."""
    m, n, r = 128, 96, 4
    base = rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
    rowscale = 10.0 ** rng.uniform(-4, 4, size=(m, 1))
    a = base * rowscale
    u, s, v = rsvd_streaming(a, k=r, p=8, q=2, panel_rows=48,
                             dtype=jnp.float32, panel_dtype="int8")
    rec = (np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T)
    # per-row relative error stays at int8 quantization level even for
    # the tiny rows
    row_err = (np.linalg.norm(rec - a, axis=1)
               / np.maximum(np.linalg.norm(a, axis=1), 1e-30))
    assert np.percentile(row_err, 95) < 5e-2


def test_streaming_rowspace_finish(rng):
    """finish='rowspace': 2q+1 streamed passes (one fewer full read of A
    over the host link) with the same recovery contract on decaying
    spectra, and panel-decomposition invariance."""
    a = _lowrank(rng, 280, 180, 6) + 1e-7 * rng.standard_normal((280, 180))
    u, s, v = rsvd_streaming(a, k=8, p=6, q=2, panel_rows=64,
                             dtype=jnp.float64, finish="rowspace")
    assert u.shape == (280, 8) and v.shape == (180, 8)
    rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
    assert np.linalg.norm(rec - a) < 1e-5 * np.linalg.norm(a)
    assert np.abs(np.asarray(u.T @ u) - np.eye(8)).max() < 1e-10
    assert np.abs(np.asarray(v.T @ v) - np.eye(8)).max() < 1e-10
    u2, s2, v2 = rsvd_streaming(a, k=8, p=6, q=2, panel_rows=280,
                                dtype=jnp.float64, finish="rowspace")
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-9)
    with pytest.raises(ValueError):
        rsvd_streaming(a, k=8, q=0, finish="rowspace")


class TestStreamCheckpoint:
    """Pass-level checkpoint/resume for the streamed driver: a killed
    multi-hour out-of-core run must restart from the last finished pass,
    never silently reuse stale state from different parameters."""

    def _counting(self, monkeypatch):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import streaming as sm

        calls = {"passes": 0}
        orig_r, orig_l = sm._stream_right_multiply, sm._stream_left_t_multiply

        def right(*a, **kw):
            calls["passes"] += 1
            return orig_r(*a, **kw)

        def left(*a, **kw):
            calls["passes"] += 1
            return orig_l(*a, **kw)

        monkeypatch.setattr(sm, "_stream_right_multiply", right)
        monkeypatch.setattr(sm, "_stream_left_t_multiply", left)
        return calls

    def test_resume_skips_completed_passes(self, tmp_path, rng,
                                           monkeypatch):
        calls = self._counting(monkeypatch)
        a = _lowrank(rng, 200, 150, 6).astype(np.float32)
        ck = str(tmp_path / "ck")
        u1, s1, v1 = rsvd_streaming(a, k=6, p=6, q=2, panel_rows=64,
                                    checkpoint_dir=ck)
        assert calls["passes"] == 6  # 2q+2
        calls["passes"] = 0
        u2, s2, v2 = rsvd_streaming(a, k=6, p=6, q=2, panel_rows=64,
                                    checkpoint_dir=ck)
        assert calls["passes"] == 0  # everything resumed
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))

    def test_partial_state_resumes_midway(self, tmp_path, rng,
                                          monkeypatch):
        import os

        calls = self._counting(monkeypatch)
        a = _lowrank(rng, 180, 120, 5).astype(np.float32)
        ck = str(tmp_path / "ck")
        u1, s1, v1 = rsvd_streaming(a, k=5, p=5, q=2, panel_rows=50,
                                    checkpoint_dir=ck)
        # simulate a crash after round 0: drop everything later
        for st in ("round1", "zb_final"):
            os.remove(os.path.join(ck, f"{st}.npy"))
        calls["passes"] = 0
        u2, s2, v2 = rsvd_streaming(a, k=5, p=5, q=2, panel_rows=50,
                                    checkpoint_dir=ck)
        assert calls["passes"] == 3  # round1 (2 passes) + projection
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-6)

    def test_param_mismatch_invalidates(self, tmp_path, rng, monkeypatch):
        calls = self._counting(monkeypatch)
        a = _lowrank(rng, 150, 100, 4).astype(np.float32)
        ck = str(tmp_path / "ck")
        rsvd_streaming(a, k=4, p=4, q=1, panel_rows=50, checkpoint_dir=ck)
        calls["passes"] = 0
        # different seed: stale checkpoints must be wiped, not reused
        u, s, v = rsvd_streaming(a, k=4, p=4, q=1, panel_rows=50, seed=9,
                                 checkpoint_dir=ck)
        assert calls["passes"] == 4  # full 2q+2 recompute
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        assert np.linalg.norm(rec - a) < 1e-3 * np.linalg.norm(a)

    def test_data_mismatch_invalidates(self, tmp_path, rng, monkeypatch):
        """Identical hyperparameters on DIFFERENT data must not resume
        stale factors: the checkpoint meta fingerprints the input
        (streaming._data_fingerprint)."""
        calls = self._counting(monkeypatch)
        a = _lowrank(rng, 150, 100, 4).astype(np.float32)
        b = _lowrank(rng, 150, 100, 4).astype(np.float32)
        ck = str(tmp_path / "ck")
        rsvd_streaming(a, k=4, p=4, q=1, panel_rows=50, checkpoint_dir=ck)
        calls["passes"] = 0
        u, s, v = rsvd_streaming(b, k=4, p=4, q=1, panel_rows=50,
                                 checkpoint_dir=ck)
        assert calls["passes"] == 4  # stale factors of a wiped
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        assert np.linalg.norm(rec - b) < 1e-3 * np.linalg.norm(b)

    def test_memmap_rewrite_invalidates(self, tmp_path, rng, monkeypatch):
        """memmap inputs are fingerprinted by (path, size, mtime): an
        in-place rewrite of the backing file invalidates checkpoints."""
        import os
        import time

        calls = self._counting(monkeypatch)
        path = tmp_path / "a.bin"
        m, n = 150, 100
        mm = np.memmap(path, dtype=np.float32, mode="w+", shape=(m, n))
        mm[:] = _lowrank(rng, m, n, 4).astype(np.float32)
        mm.flush()
        ck = str(tmp_path / "ck")
        ro = np.memmap(path, dtype=np.float32, mode="r", shape=(m, n))
        rsvd_streaming(ro, k=4, p=4, q=1, panel_rows=50,
                       checkpoint_dir=ck)
        b = _lowrank(rng, m, n, 4).astype(np.float32)
        mm[:] = b
        mm.flush()
        # coarse-mtime filesystems could alias a sub-tick rewrite
        os.utime(path, ns=(time.time_ns(), time.time_ns() + 1))
        calls["passes"] = 0
        ro2 = np.memmap(path, dtype=np.float32, mode="r", shape=(m, n))
        u, s, v = rsvd_streaming(ro2, k=4, p=4, q=1, panel_rows=50,
                                 checkpoint_dir=ck)
        assert calls["passes"] == 4
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        assert np.linalg.norm(rec - b) < 1e-3 * np.linalg.norm(b)

    def test_rowspace_checkpoint(self, tmp_path, rng, monkeypatch):
        calls = self._counting(monkeypatch)
        a = _lowrank(rng, 160, 110, 4).astype(np.float32)
        ck = str(tmp_path / "ck")
        u1, s1, v1 = rsvd_streaming(a, k=4, p=4, q=2, panel_rows=40,
                                    finish="rowspace", checkpoint_dir=ck)
        assert calls["passes"] == 5  # 2q+1
        calls["passes"] = 0
        u2, s2, v2 = rsvd_streaming(a, k=4, p=4, q=2, panel_rows=40,
                                    finish="rowspace", checkpoint_dir=ck)
        assert calls["passes"] == 0
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def _gapped(rng, m, n, s_lo=1e-4):
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    s = np.geomspace(1.0, s_lo, min(m, n))
    return (u * s) @ v.T


class TestStreamingUtvFinishes:
    """Streamed serving tails (VERDICT r4 item 3): the same contract
    table as tests/test_utv.py::TestUtvFinish, carried out of core —
    same streamed pass counts as project/rowspace, thin-QR tails, s are
    decomposition weights, U unit-column, V orthonormal."""

    def test_utv_full_rank_matches_streamed_project(self, rng):
        a = _gapped(rng, 150, 90, 1e-3)
        u1, s1, v1 = rsvd_streaming(a, k=16, p=0, q=2, panel_rows=50,
                                    dtype=jnp.float64, finish="utv")
        u2, s2, v2 = rsvd_streaming(a, k=16, p=0, q=2, panel_rows=50,
                                    dtype=jnp.float64, method="eigh",
                                    finish="project")
        rec1 = np.asarray(u1) * np.asarray(s1)[None, :] @ np.asarray(v1).T
        rec2 = np.asarray(u2) * np.asarray(s2)[None, :] @ np.asarray(v2).T
        np.testing.assert_allclose(rec1, rec2, atol=1e-10)

    def test_utv_contract_and_energy_identity(self, rng):
        a = _gapped(rng, 140, 80, 1e-5)
        l = 20
        u, s, v = rsvd_streaming(a, k=l, p=0, q=2, panel_rows=64,
                                 dtype=jnp.float64, finish="utv")
        u_np, s_np, v_np = map(np.asarray, (u, s, v))
        np.testing.assert_allclose(v_np.T @ v_np, np.eye(l), atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(u_np, axis=0),
                                   np.ones(l), atol=1e-9)
        assert np.all(np.diff(s_np) <= 1e-12)
        # exact energy identity vs the PROJECT tail of the same streamed
        # stage A (identical seed => identical Q => identical B): the
        # fold's sum s^2 equals sum sigma(B)^2 at arithmetic resolution
        _, s_proj, _ = rsvd_streaming(a, k=l, p=0, q=2, panel_rows=64,
                                      dtype=jnp.float64, method="eigh",
                                      finish="project")
        np.testing.assert_allclose(float((s_np ** 2).sum()),
                                   float((np.asarray(s_proj) ** 2).sum()),
                                   rtol=1e-11)

    def test_rowspace_utv_truncation_near_optimal(self, rng):
        a = _gapped(rng, 160, 100, 1e-4)
        k = 10
        u, s, v = rsvd_streaming(a, k=k, p=8, q=2, panel_rows=48,
                                 dtype=jnp.float64, finish="rowspace_utv")
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        err = np.linalg.norm(a - rec)
        s_true = np.linalg.svd(a, compute_uv=False)
        opt = np.sqrt((s_true[k:] ** 2).sum())
        assert err < 1.3 * opt

    def test_rowspace_utv_pass_count_and_serving_qr(self, rng,
                                                    monkeypatch):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import streaming as sm

        calls = {"passes": 0}
        orig_r = sm._stream_right_multiply
        orig_l = sm._stream_left_t_multiply
        monkeypatch.setattr(sm, "_stream_right_multiply",
                            lambda *a, **kw: (calls.__setitem__(
                                "passes", calls["passes"] + 1),
                                orig_r(*a, **kw))[1])
        monkeypatch.setattr(sm, "_stream_left_t_multiply",
                            lambda *a, **kw: (calls.__setitem__(
                                "passes", calls["passes"] + 1),
                                orig_l(*a, **kw))[1])
        a = _gapped(np.random.default_rng(3), 150, 90, 1e-3
                    ).astype(np.float32)
        u, s, v = rsvd_streaming(a, k=8, p=8, q=2, panel_rows=50,
                                 finish="rowspace_utv",
                                 qr_method="cholqr1")
        assert calls["passes"] == 5  # 2q+1: the serving pass count
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        # slow-decay spectrum: compare against the OPTIMAL rank-k error
        s_true = np.linalg.svd(a.astype(np.float64), compute_uv=False)
        opt = np.sqrt((s_true[8:] ** 2).sum())
        assert np.linalg.norm(rec - a) < 1.35 * opt

    def test_utv_checkpoint_resume_bitwise(self, tmp_path, rng,
                                           monkeypatch):
        """Pass-level resume parity for the serving finishes: a second
        run from checkpoints must reproduce the factors BITWISE (the
        northstar_resume contract, now including the UTV tail)."""
        import os

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import streaming as sm

        calls = {"passes": 0}
        orig_r = sm._stream_right_multiply
        orig_l = sm._stream_left_t_multiply
        monkeypatch.setattr(sm, "_stream_right_multiply",
                            lambda *a, **kw: (calls.__setitem__(
                                "passes", calls["passes"] + 1),
                                orig_r(*a, **kw))[1])
        monkeypatch.setattr(sm, "_stream_left_t_multiply",
                            lambda *a, **kw: (calls.__setitem__(
                                "passes", calls["passes"] + 1),
                                orig_l(*a, **kw))[1])
        a = _lowrank(rng, 160, 110, 5).astype(np.float32)
        for finish, stages in (("utv", ("round1", "b?")),
                               ("rowspace_utv", ("zq_final", "c_final"))):
            ck = str(tmp_path / f"ck_{finish}")
            u1, s1, v1 = rsvd_streaming(a, k=5, p=5, q=2, panel_rows=40,
                                        finish=finish, checkpoint_dir=ck)
            calls["passes"] = 0
            u2, s2, v2 = rsvd_streaming(a, k=5, p=5, q=2, panel_rows=40,
                                        finish=finish, checkpoint_dir=ck)
            assert calls["passes"] == 0, finish
            np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
            np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
            np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
            # partial crash: drop the final stage, resume must only
            # replay the missing passes
            final = "c_final" if finish == "rowspace_utv" else "zb_final"
            os.remove(os.path.join(ck, f"{final}.npy"))
            calls["passes"] = 0
            u3, s3, v3 = rsvd_streaming(a, k=5, p=5, q=2, panel_rows=40,
                                        finish=finish, checkpoint_dir=ck)
            assert calls["passes"] == 1, finish
            np.testing.assert_allclose(np.asarray(s3), np.asarray(s1),
                                       rtol=1e-6)
