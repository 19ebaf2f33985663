"""End-to-end rSVD tests — the reference's core integration test
(tests/rSVD_test.cpp: every input .mtx, k=0/p=16 => l=16, Jacobi tail,
pass = ||A - U S V^T||_F) plus the NumPy/sklearn oracle comparison
(python/test_run_rSVD.py, compare_rSVD.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import shard_rows
from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import SVD, SVDMethod, svd
from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
    generate_omega,
    reconstruction_error,
    rsvd,
    rsvd_image_preset,
)


def _optimal_error(a, l):
    s = np.linalg.svd(np.asarray(a), compute_uv=False)
    return float(np.sqrt((s[l:] ** 2).sum()))


@pytest.mark.parametrize("method", ["jacobi", "parallel_jacobi", "power"])
def test_rsvd_low_rank_exact(method, rng):
    """Rank-8 matrix, l=16 sketch: reconstruction must be ~exact (the
    reference's family B/C behavior, report p.13-14)."""
    a = rng.standard_normal((120, 80)) @ np.diag([1e2] * 8 + [0] * 72) @ \
        rng.standard_normal((80, 80))
    a = jnp.asarray(a)
    u, s, v = rsvd(a, k=0, p=16, q=2, method=method)
    err = float(reconstruction_error(a, u, s, v))
    assert err < 1e-6 * float(jnp.linalg.norm(a))


def test_rsvd_reference_inputs(input_matrices):
    """The rSVD_test.cpp protocol: l=16 Jacobi rSVD over every reference
    input; error must be near the optimal rank-16 truncation."""
    for name, a in input_matrices.items():
        u, s, v = rsvd(jnp.asarray(a), k=0, p=16, q=2, method="jacobi")
        err = float(reconstruction_error(a, u, s, v))
        opt = _optimal_error(a, 16)
        # Power iterations (q=2) put us within a few percent of optimal.
        assert err <= opt * 1.05 + 1e-9, (name, err, opt)


def test_rsvd_oracle_spectrum(rng):
    """Singular values of the sketch-projected problem vs np.linalg.svd.
    A flat Gaussian spectrum is the hardest case for randomized methods
    (the reference's family A, report p.13), so the tolerance is a few
    percent; with spectral decay (next assert) accuracy is much tighter."""
    a = rng.standard_normal((100, 100))
    u, s, v = rsvd(jnp.asarray(a), k=10, p=10, q=3)
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np[:10], rtol=5e-2)
    assert float(s[0]) <= s_np[0] * (1 + 1e-9)  # Rayleigh bound

    # decaying spectrum: tight agreement
    d = rng.standard_normal((100, 100)) * np.logspace(0, -6, 100)[None, :]
    u2, s2, v2 = rsvd(jnp.asarray(d), k=10, p=10, q=3)
    d_np = np.linalg.svd(d, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s2), d_np[:10], rtol=1e-6)


def test_rsvd_truncation_and_shapes(rng):
    a = jnp.asarray(rng.standard_normal((50, 30)))
    u, s, v = rsvd(a, k=7, p=5, q=1)
    assert u.shape == (50, 7) and s.shape == (7,) and v.shape == (30, 7)


def test_rsvd_deterministic(rng):
    a = jnp.asarray(rng.standard_normal((40, 40)))
    u1, s1, v1 = rsvd(a, k=5, seed=3)
    u2, s2, v2 = rsvd(a, k=5, seed=3)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    u3, s3, v3 = rsvd(a, k=5, seed=4)
    assert not np.array_equal(np.asarray(u1), np.asarray(u3))


def test_rsvd_sharded_matches_single(mesh8, rng):
    """1-device vs 8-device parity: identical factors because the sketch is
    shard-count-invariant (unlike the reference's rank-seeded RNG)."""
    a = rng.standard_normal((256, 64))
    u1, s1, v1 = rsvd(jnp.asarray(a), k=8, p=8, q=2)
    a_sh = shard_rows(jnp.asarray(a), mesh8)
    u2, s2, v2 = rsvd(a_sh, k=8, p=8, q=2)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-9)


def test_image_preset_default_rank(rng):
    a = jnp.asarray(rng.standard_normal((64, 48)))
    u, s, v = rsvd_image_preset(a)  # k = min/4 = 12 (image_com.cpp:294-298)
    assert u.shape[1] == 12


def test_svd_engine_class(rng):
    """Reference SVD_class API: ctor(data, r) + compute + getU/getS/getV."""
    a = rng.standard_normal((30, 30))
    for method in SVDMethod:
        eng = SVD(a, r=5, method=method).compute()
        assert eng.getU().shape == (30, 5)
        assert eng.getS().shape == (5,)
        assert eng.getV().shape == (30, 5)
        s_np = np.linalg.svd(a, compute_uv=False)
        np.testing.assert_allclose(np.asarray(eng.getS()), s_np[:5],
                                   rtol=1e-5)


@pytest.mark.slow
def test_svd_xla_and_auto_methods(rng):
    """The production engines added from the svd_engines.csv study:
    'xla' (QDWH SVD) and the size-dispatched 'auto' must satisfy the
    standard (U, s, V) contract in standard V orientation."""
    for shape in ((40, 25), (25, 40), (300, 280)):
        a = rng.standard_normal(shape)
        s_np = np.linalg.svd(a, compute_uv=False)
        for method in ("xla", "auto"):
            u, s, v = svd(jnp.asarray(a), method)
            np.testing.assert_allclose(np.asarray(s), s_np,
                                       atol=1e-9 * s_np[0])
            rec = np.asarray((u * s[None, :]) @ v.T)
            assert np.linalg.norm(rec - a) < 1e-9 * s_np[0] * max(shape)


def test_generate_omega_shape_and_determinism():
    o1 = generate_omega(0, 50, 16, jnp.float64)
    o2 = generate_omega(0, 50, 16, jnp.float64)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    assert o1.shape == (50, 16)
    # standard normal-ish
    assert abs(float(o1.mean())) < 0.1
    assert 0.8 < float(o1.std()) < 1.2


def test_rsvd_eigh_pallas_tail_matches_eigh(rng):
    """The single-kernel Pallas eigh tail (method='eigh_pallas') must give
    the same factorization as the XLA-eigh Gram tail (interpret mode off
    TPU)."""
    a = rng.standard_normal((96, 64)) * np.logspace(0, -4, 64)[None, :]
    a = jnp.asarray(a)
    u_r, s_r, v_r = rsvd(a, k=16, p=8, q=2, method="eigh", seed=3)
    u_p, s_p, v_p = rsvd(a, k=16, p=8, q=2, method="eigh_pallas", seed=3)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r),
                               rtol=1e-4, atol=1e-6)
    rec_r = (np.asarray(u_r) * np.asarray(s_r)) @ np.asarray(v_r).T
    rec_p = (np.asarray(u_p) * np.asarray(s_p)) @ np.asarray(v_p).T
    np.testing.assert_allclose(rec_p, rec_r, rtol=0, atol=1e-4)


def test_rsvd_bfloat16_end_to_end(rng):
    """bf16 inputs run the whole pipeline in bf16 (dtype-agnostic library)
    with commensurate accuracy — the serving-throughput mode."""
    a64 = rng.standard_normal((128, 16)) @ rng.standard_normal((16, 96))
    a = jnp.asarray(a64, jnp.bfloat16)
    u, s, v = rsvd(a, k=16, p=8, q=2, method="eigh")
    assert u.dtype == jnp.bfloat16 and v.dtype == jnp.bfloat16
    rec = (np.asarray(u, np.float64) * np.asarray(s, np.float64)[None, :]) \
        @ np.asarray(v, np.float64).T
    rel = np.linalg.norm(rec - a64) / np.linalg.norm(a64)
    assert rel < 0.05  # bf16 has ~3 significant digits


class TestWarmStart:
    def test_warm_q1_matches_cold_q2_on_perturbed_input(self):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            reconstruction_error,
            rsvd,
        )
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_warm

        rng = np.random.default_rng(0)
        u0, _ = np.linalg.qr(rng.standard_normal((300, 300)))
        v0, _ = np.linalg.qr(rng.standard_normal((200, 200)))
        s = np.geomspace(1, 1e-4, 200)
        a = jnp.asarray(u0[:, :200] @ np.diag(s) @ v0.T)
        u, s1, v = rsvd(a, k=16, p=8, q=2, method="eigh")
        # the matrix drifts slightly (new parameter step)
        a2 = a + 1e-3 * jnp.asarray(rng.standard_normal(a.shape))
        warm = rsvd_warm(a2, u, k=16, q=1)
        cold = rsvd(a2, k=16, p=8, q=2, method="eigh")
        e_warm = float(reconstruction_error(a2, *warm))
        e_cold = float(reconstruction_error(a2, *cold))
        # one warm pass reaches (or beats) the fresh two-pass run
        assert e_warm <= 1.02 * e_cold

    def test_warm_exact_when_unchanged(self):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_warm

        rng = np.random.default_rng(1)
        a = jnp.asarray(rng.standard_normal((80, 10))
                        @ rng.standard_normal((10, 60)))
        u, s, v = rsvd(a, k=10, p=6, q=2, method="eigh")
        u2, s2, v2 = rsvd_warm(a, u, k=10, q=0)
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s), rtol=1e-8)


class TestBf16StorageMode:
    """precision='bf16': A cast once to bf16 storage, f32 accumulation —
    'default' MXU numerics at half the stage-A HBM bytes."""

    def test_truncation_dominated_parity(self):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            reconstruction_error,
        )

        rng = np.random.default_rng(0)
        # truncation floor (3e-2 noise) well ABOVE the bf16 rounding
        # floor (~0.4% of ||A||): the regime the mode is for.  (On TPU
        # 'default' already rounds every GEMM operand to bf16, so 'bf16'
        # matches it bit-for-bit there; on CPU 'default' is exact f32,
        # so this test sees the full storage-rounding penalty and checks
        # it stays below the truncation error.)
        a = jnp.asarray(
            (rng.standard_normal((300, 32)) @ rng.standard_normal((32, 200))
             + 3e-2 * rng.standard_normal((300, 200))), jnp.float32)
        hi = rsvd(a, k=32, p=8, q=2, method="eigh", precision="highest")
        lo = rsvd(a, k=32, p=8, q=2, method="eigh", precision="bf16")
        e_hi = float(reconstruction_error(a, *hi))
        e_lo = float(reconstruction_error(a, *lo))
        assert e_lo < 1.05 * e_hi
        np.testing.assert_allclose(np.asarray(lo[1]), np.asarray(hi[1]),
                                   rtol=2e-2)
        # outputs stay in the input dtype (the cast is internal)
        assert lo[0].dtype == a.dtype and lo[1].dtype == a.dtype

    def test_sparse_input_unaffected(self):
        import jax.numpy as jnp
        import numpy as np
        from jax.experimental import sparse as jsparse

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        rng = np.random.default_rng(1)
        dense = np.zeros((120, 90), np.float32)
        dense[rng.integers(0, 120, 400), rng.integers(0, 90, 400)] = \
            rng.standard_normal(400).astype(np.float32)
        a_sp = jsparse.BCOO.fromdense(jnp.asarray(dense))
        u, s, v = rsvd(a_sp, k=8, p=16, q=2, method="eigh",
                       precision="bf16")
        s_np = np.linalg.svd(dense, compute_uv=False)
        np.testing.assert_allclose(np.asarray(s)[:4], s_np[:4], rtol=5e-2)


def test_bf16_storage_sharded_matches_single(mesh8, rng):
    """precision='bf16' on a row-sharded A: the internal cast must
    preserve the sharding (no implicit gather) and match the
    single-device result up to partial-sum reduction order (the sharded
    Grams psum per-shard partials — with bf16 operands the ordering
    difference shows at ~1e-6 relative, vs 1e-10 for the f32 path)."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

    a = rng.standard_normal((256, 64)).astype(np.float32)
    u1, s1, v1 = rsvd(jnp.asarray(a), k=8, p=8, q=2, precision="bf16")
    a_sh = shard_rows(jnp.asarray(a), mesh8)
    u2, s2, v2 = rsvd(a_sh, k=8, p=8, q=2, precision="bf16")
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-3)


class TestRowspaceFinish:
    """finish='rowspace': the 2q+1-pass end-game (factor C = A Z_q
    directly instead of projecting B = Q^T A) — one full read of A
    fewer, a half power iteration weaker in subspace quality."""

    def test_decaying_spectrum_parity(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            reconstruction_error,
        )

        u0, _ = np.linalg.qr(rng.standard_normal((200, 200)))
        v0, _ = np.linalg.qr(rng.standard_normal((150, 150)))
        sig = np.geomspace(1, 1e-5, 150)
        a = jnp.asarray(u0[:, :150] @ np.diag(sig) @ v0.T)
        proj = rsvd(a, k=16, p=8, q=2, method="eigh")
        rows = rsvd(a, k=16, p=8, q=2, method="eigh", finish="rowspace")
        e_p = float(reconstruction_error(a, *proj))
        e_r = float(reconstruction_error(a, *rows))
        s_np = np.linalg.svd(np.asarray(a), compute_uv=False)
        opt = float(np.sqrt((s_np[16:] ** 2).sum()))
        assert e_r <= 1.02 * opt  # near-optimal despite one fewer pass
        assert e_r <= 1.02 * e_p + 1e-12
        # contract: orthonormal factors, descending s
        u, s, v = rows
        assert np.abs(np.asarray(u.T @ u) - np.eye(16)).max() < 1e-5
        assert np.abs(np.asarray(v.T @ v) - np.eye(16)).max() < 1e-5
        assert np.all(np.diff(np.asarray(s)) <= 1e-12)

    def test_exact_low_rank_and_all_methods(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            reconstruction_error,
        )

        a = jnp.asarray(rng.standard_normal((90, 8))
                        @ rng.standard_normal((8, 70)))
        for method in ("eigh", "jacobi", "power"):
            u, s, v = rsvd(a, k=8, p=8, q=1, method=method,
                           finish="rowspace")
            err = float(reconstruction_error(a, u, s, v))
            assert err < 1e-6 * float(jnp.linalg.norm(a)), method
            assert u.shape == (90, 8) and v.shape == (70, 8)

    def test_q0_rejected(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        a = jnp.asarray(rng.standard_normal((40, 30)))
        with pytest.raises(ValueError):
            rsvd(a, k=4, p=4, q=0, finish="rowspace")

    def test_sharded_matches_single(self, mesh8, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        a = rng.standard_normal((256, 64)).astype(np.float32)
        u1, s1, v1 = rsvd(jnp.asarray(a), k=8, p=8, q=2, finish="rowspace")
        a_sh = shard_rows(jnp.asarray(a), mesh8)
        u2, s2, v2 = rsvd(a_sh, k=8, p=8, q=2, finish="rowspace")
        # f32 partial-sum ordering of the sharded Grams: ~1e-6 relative
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5)


class TestBatched:
    """rsvd_batched: one compiled program, vmapped pipeline, independent
    per-element sketches — the serving shape that amortizes the
    latency-bound small-op tail across a batch."""

    def test_matches_per_matrix_runs(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            generate_omega,
            rsvd_batched,
            rsvd_with_omega,
        )

        b, m, n, k = 3, 60, 40, 6
        a = jnp.asarray(rng.standard_normal((b, m, n)), jnp.float32)
        # scan mode (default): identical per-matrix math incl. robust QR
        u, s, v = rsvd_batched(a, k=k, p=6, q=2, seed=11)
        assert u.shape == (b, m, k) and s.shape == (b, k)
        assert v.shape == (b, n, k)
        for i in range(b):
            om = generate_omega(11 + i, n, k + 6, a.dtype)
            ui, si, vi = rsvd_with_omega(a[i], om, q=2, k=k, method="eigh")
            np.testing.assert_allclose(np.asarray(s[i]), np.asarray(si),
                                       rtol=1e-5)
        # vmap mode: same spectra (cholqr2 in place of robust QR)
        u2, s2, v2 = rsvd_batched(a, k=k, p=6, q=2, seed=11, mode="vmap")
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s),
                                   rtol=1e-4)

    def test_independent_sketches_and_recovery(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd_batched

        b, m, n, r = 4, 80, 50, 5
        a_np = np.stack([
            rng.standard_normal((m, r)) @ rng.standard_normal((r, n))
            for _ in range(b)])
        u, s, v = rsvd_batched(jnp.asarray(a_np, jnp.float32), k=r, p=8,
                               q=2)
        rec = np.einsum("bmk,bk,bnk->bmn", np.asarray(u), np.asarray(s),
                        np.asarray(v))
        for i in range(b):
            rel = (np.linalg.norm(rec[i] - a_np[i])
                   / np.linalg.norm(a_np[i]))
            assert rel < 1e-4, (i, rel)

    def test_batch_axis_shardable(self, mesh8, rng):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd_batched

        b, m, n, k = 8, 48, 32, 4
        a = jnp.asarray(rng.standard_normal((b, m, n)), jnp.float32)
        a_sh = jax.device_put(a, NamedSharding(mesh8, P("rows", None, None)))
        # vmap mode is the mesh-sharded path (scan cannot parallelize a
        # sharded batch axis)
        u1, s1, v1 = rsvd_batched(a, k=k, p=4, q=1, mode="vmap")
        u2, s2, v2 = rsvd_batched(a_sh, k=k, p=4, q=1, mode="vmap")
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5)


def test_mm_mixed_dtype_promotes_unless_bf16(rng):
    """_mm's mixed-storage downcast is gated on the narrow operand being
    bfloat16 (the only mix the bf16 storage mode creates).  Any other
    mismatch — e.g. an accidental f64 x f32 from an x64 science CLI —
    must keep numpy promotion semantics, not silently narrow the wide
    operand (advisor finding, round 3)."""
    import jax

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _mm

    a64 = jnp.asarray(rng.standard_normal((16, 8)), jnp.float64)
    b32 = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    out = _mm(a64, b32)
    assert out.dtype == jnp.float64
    ref = np.asarray(a64, np.float64) @ np.asarray(b32, np.float64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12)
    # the bf16 storage mix still narrows the SMALL operand, wide accum
    abf = a64.astype(jnp.bfloat16)
    out_bf = _mm(abf, b32)
    assert out_bf.dtype == jnp.float32
    ref_bf = (np.asarray(abf, np.float32)
              @ np.asarray(b32.astype(jnp.bfloat16), np.float32))
    np.testing.assert_allclose(np.asarray(out_bf), ref_bf, rtol=1e-5)


def test_serving_finishes_sharded_match_single(mesh8, rng):
    """finish='utv' / 'rowspace_utv' on a row-sharded A: identical
    weights/factors vs one device (the serving modes must be as
    sharding-oblivious as the eigh tails — their tail QRs are the same
    CholeskyQR collectives)."""
    from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import shard_rows

    a = rng.standard_normal((256, 96))
    for fin in ("utv", "rowspace_utv"):
        u1, s1, v1 = rsvd(jnp.asarray(a), k=8, p=8, q=2, finish=fin)
        u2, s2, v2 = rsvd(shard_rows(jnp.asarray(a), mesh8), k=8, p=8,
                          q=2, finish=fin)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-9, err_msg=fin)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   atol=1e-8, err_msg=fin)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-8, err_msg=fin)
