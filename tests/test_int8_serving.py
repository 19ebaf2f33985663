"""int8 stage-A storage mode (round 5): A quantized ONCE to row-scaled
int8, every stage-A pass on the native int8 MXU contraction path with
scales folded into the small operands (rsvd.driver.Int8Stored).  One
byte/element/pass — half of bf16 storage — for truncation-dominated
serving spectra."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    Int8Stored,
    _mm,
    generate_omega,
    quantize_int8_rows,
    reconstruction_error,
    rsvd,
    rsvd_with_omega,
)


def _decaying(m, n, lo=1e-3, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    s = np.geomspace(1.0, lo, min(m, n))
    return ((u * s) @ v.T).astype(np.float32)


class TestInt8Stored:
    def test_quantization_error_bound(self):
        a = jnp.asarray(np.random.default_rng(0).standard_normal(
            (50, 200)).astype(np.float32))
        st = quantize_int8_rows(a)
        rec = (st.q8.astype(jnp.float32)
               * st.row_scale[:, None])
        # per-entry error <= half a quantization step of that row
        err = np.abs(np.asarray(rec) - np.asarray(a))
        bound = 0.5 * np.asarray(st.row_scale)[:, None] + 1e-8
        assert (err <= bound).all()

    def test_mm_forward_and_transposed(self):
        rng = np.random.default_rng(1)
        a_np = rng.standard_normal((120, 80)).astype(np.float32)
        b_np = rng.standard_normal((80, 12)).astype(np.float32)
        c_np = rng.standard_normal((120, 12)).astype(np.float32)
        st = quantize_int8_rows(jnp.asarray(a_np))
        y = np.asarray(_mm(st, jnp.asarray(b_np)))
        z = np.asarray(_mm(st.T, jnp.asarray(c_np)))
        # two int8 operands -> ~1% relative error on the products
        assert np.linalg.norm(y - a_np @ b_np) < \
            0.03 * np.linalg.norm(a_np @ b_np)
        assert np.linalg.norm(z - a_np.T @ c_np) < \
            0.03 * np.linalg.norm(a_np.T @ c_np)

    def test_mm_right_operand(self):
        """X @ A (the project finish's B = Q^T A shape) routes through
        the transposed int8 product."""
        rng = np.random.default_rng(2)
        a_np = rng.standard_normal((100, 60)).astype(np.float32)
        x_np = rng.standard_normal((8, 100)).astype(np.float32)
        st = quantize_int8_rows(jnp.asarray(a_np))
        out = np.asarray(_mm(jnp.asarray(x_np), st))
        assert out.shape == (8, 60)
        ref = x_np @ a_np
        assert np.linalg.norm(out - ref) < 0.03 * np.linalg.norm(ref)

    def test_pytree_jits_and_shapes(self):
        a = jnp.asarray(np.random.default_rng(3).standard_normal(
            (40, 30)).astype(np.float32))
        st = quantize_int8_rows(a)
        assert st.shape == (40, 30) and st.T.shape == (30, 40)

        @jax.jit
        def f(s, b):
            return _mm(s, b)

        out = f(st, jnp.ones((30, 4), jnp.float32))
        assert out.shape == (40, 4)
        assert bool(jnp.all(jnp.isfinite(out)))


class TestInt8ServingPipeline:
    @pytest.mark.parametrize("finish", ["project", "rowspace_utv"])
    def test_parity_on_truncation_dominated_spectrum(self, finish):
        """err(int8 storage) within a few percent of the default path
        when truncation error dominates the ~0.5% quantization noise."""
        a = jnp.asarray(_decaying(200, 150, lo=1e-2))
        k = 12
        omega = generate_omega(0, 150, k + 8, jnp.float32)
        kw = dict(q=2, k=k, method="eigh", reorth="half", finish=finish)
        if finish == "rowspace_utv":
            kw.update(qr_method="cholqr1", interior_qr="cholqr1")
        u8, s8, v8 = rsvd_with_omega(a, omega, precision="int8", **kw)
        uf, sf, vf = rsvd_with_omega(a, omega, precision="default", **kw)
        e8 = float(reconstruction_error(a, u8, s8, v8))
        ef = float(reconstruction_error(a, uf, sf, vf))
        assert e8 < 1.1 * ef + 1e-6, (finish, e8, ef)

    def test_near_rank_k_shows_the_quant_floor(self):
        """On a near-exactly-rank-k operand the int8 floor IS visible —
        the documented reason this is a serving mode, not a default."""
        rng = np.random.default_rng(5)
        a_np = (rng.standard_normal((150, 15)).astype(np.float32)
                @ rng.standard_normal((15, 100)).astype(np.float32))
        a = jnp.asarray(a_np)
        u8, s8, v8 = rsvd(a, k=15, p=8, q=2, method="eigh",
                          precision="int8")
        e8 = float(reconstruction_error(a, u8, s8, v8))
        # not exact (quant floor) but still a faithful factorization
        assert 1e-6 * np.linalg.norm(a_np) < e8 < \
            0.05 * np.linalg.norm(a_np)

    def test_rsvd_entry_point_accepts_int8(self):
        a = jnp.asarray(_decaying(120, 90))
        u, s, v = rsvd(a, k=8, p=8, q=1, method="eigh", precision="int8")
        assert u.shape == (120, 8) and s.shape == (8,)
        assert bool(jnp.all(jnp.isfinite(u)))
        assert np.all(np.diff(np.asarray(s)) <= 1e-6)

    def test_f64_input_keeps_f64_products(self):
        a64 = jnp.asarray(_decaying(80, 60).astype(np.float64))
        st = quantize_int8_rows(a64)
        assert st.dtype == jnp.float64
        out = _mm(st, jnp.ones((60, 3), jnp.float64))
        assert out.dtype == jnp.float64


class TestInt8Sharded:
    def test_sharded_int8_matches_replicated(self):
        """A row-sharded Int8Stored operand (q8 + row_scale sharded over
        the mesh) must produce the same factorization as the replicated
        run — the multi-chip serving layout."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh

        n_dev = len(jax.devices())
        if n_dev < 2:
            pytest.skip("needs a multi-device mesh")
        a = jnp.asarray(_decaying(64 * n_dev, 96))
        st = quantize_int8_rows(a)
        mesh = make_mesh((n_dev,), ("rows",))
        st_sh = Int8Stored(
            jax.device_put(st.q8, NamedSharding(mesh, P("rows", None))),
            jax.device_put(st.row_scale, NamedSharding(mesh, P("rows"))),
        )
        kw = dict(k=8, p=8, q=2, method="eigh", precision="int8")
        u1, s1, v1 = rsvd(st_sh, **kw)
        u2, s2, v2 = rsvd(st, **kw)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(u1), np.asarray(u2),
                                   atol=1e-5)


class TestOnepassInCore:
    """rsvd_onepass — the single-pass in-core serving mode (Tropp
    two-sided sketch on a device-resident operand; composes with int8
    storage)."""

    def test_exact_on_low_rank(self):
        rng = np.random.default_rng(7)
        a_np = (rng.standard_normal((300, 12)).astype(np.float32)
                @ rng.standard_normal((12, 200)).astype(np.float32))
        a = jnp.asarray(a_np / np.linalg.norm(a_np))
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd_onepass

        u, s, v = rsvd_onepass(a, k=12, p=8)
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        assert np.linalg.norm(rec - np.asarray(a)) < 1e-5
        eye = np.eye(12)
        assert np.abs(np.asarray(u.T @ u) - eye).max() < 1e-5

    def test_decaying_spectrum_within_onepass_factor(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd_onepass

        a = jnp.asarray(_decaying(256, 200, lo=1e-4, seed=8))
        k = 10
        u, s, v = rsvd_onepass(a, k=k, p=10)
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        s_true = np.linalg.svd(np.asarray(a, np.float64),
                               compute_uv=False)
        opt = np.sqrt((s_true[k:] ** 2).sum())
        # the published one-pass guarantee is a constant factor behind
        # a power-iterated run; 3x covers the measured regime here
        assert np.linalg.norm(rec - np.asarray(a)) < 3.0 * opt

    def test_composes_with_int8_storage(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd_onepass

        a = jnp.asarray(_decaying(256, 200, lo=1e-2, seed=9))
        st = quantize_int8_rows(a)
        u8, s8, v8 = rsvd_onepass(st, k=10, p=10, precision="int8")
        uf, sf, vf = rsvd_onepass(a, k=10, p=10)
        e8 = float(reconstruction_error(a, u8, s8, v8))
        ef = float(reconstruction_error(a, uf, sf, vf))
        assert e8 < 1.1 * ef + 1e-6


class TestNoInteriorQR:
    """interior_qr='none': diagonal column normalization replaces the
    interior orthonormalizations (span-preserving; power_refine
    docstring).  Safe for cond^(2q) within f32 — ~cond <= 50 at q=2 —
    and honestly degraded beyond it."""

    def test_parity_in_the_safe_domain(self):
        a = jnp.asarray(_decaying(256, 180, lo=1.0 / 30.0, seed=11))
        k = 12
        omega = generate_omega(0, 180, k + 8, jnp.float32)
        kw = dict(q=2, k=k, reorth="half", qr_method="cholqr1",
                  finish="rowspace_utv")
        u0, s0, v0 = rsvd_with_omega(a, omega, interior_qr="cholqr1",
                                     **kw)
        un, sn, vn = rsvd_with_omega(a, omega, interior_qr="none", **kw)
        e0 = float(reconstruction_error(a, u0, s0, v0))
        en = float(reconstruction_error(a, un, sn, vn))
        assert en < 1.05 * e0 + 1e-6, (en, e0)

    def test_degrades_beyond_the_domain(self):
        """The safe-domain bound is about the KEPT directions: when
        sigma_k/sigma_1 ~ 1e-3, (sigma_k/sigma_1)^(2q) = 1e-12 is far
        below f32 resolution, so the un-orthogonalized rounds cannot
        hold direction k against the dominant ones — pin that the
        degradation is real (the reason this knob is serving-only).
        (A first attempt with a uniformly decaying spectrum showed NO
        degradation: truncation at small k only needs the top-k
        subspace, whose internal cond was benign — the bound is on
        sigma_k/sigma_1, not cond(A).)"""
        rng = np.random.default_rng(12)
        m, n, k = 256, 180, 30
        u, _ = np.linalg.qr(rng.standard_normal((m, n)))
        v, _ = np.linalg.qr(rng.standard_normal((n, n)))
        s = np.concatenate([np.geomspace(1.0, 1e-3, k),
                            np.full(n - k, 1e-6)])
        a = jnp.asarray(((u * s) @ v.T).astype(np.float32))
        omega = generate_omega(1, n, k + 8, jnp.float32)
        # robust finals: the cliff spectrum is outside cholqr1's own
        # domain (it NaNs), and this test must vary ONLY the interiors
        kw = dict(q=2, k=k, reorth="half", qr_method="robust",
                  finish="rowspace_utv")
        u0, s0, v0 = rsvd_with_omega(a, omega, interior_qr="robust1",
                                     **kw)
        un, sn, vn = rsvd_with_omega(a, omega, interior_qr="none", **kw)
        e0 = float(reconstruction_error(a, u0, s0, v0))
        en = float(reconstruction_error(a, un, sn, vn))
        assert en > 10.0 * e0, (en, e0)   # measured ~1400x

    def test_composes_with_int8(self):
        a = jnp.asarray(_decaying(256, 180, lo=0.1, seed=13))
        st = quantize_int8_rows(a)
        u, s, v = rsvd_with_omega(
            st, generate_omega(2, 180, 20, jnp.float32), q=2, k=12,
            precision="int8", reorth="half", qr_method="cholqr1",
            interior_qr="none", finish="rowspace_utv")
        e = float(reconstruction_error(a, u, s, v))
        s_true = np.linalg.svd(np.asarray(a, np.float64),
                               compute_uv=False)
        opt = float(np.sqrt((s_true[12:] ** 2).sum()))
        assert e < 1.2 * opt


def test_rsvd_sharded_accepts_prequantized_operand():
    """rsvd_sharded on an Int8Stored with RAGGED rows: the int8 values
    pad with zero rows, the scales with ones — factors match the
    replicated pre-quantized run."""
    from jax.sharding import NamedSharding  # noqa: F401

    from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd_sharded

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    m = 64 * n_dev + 3                    # ragged
    a = jnp.asarray(_decaying(m, 96, seed=21))
    st = quantize_int8_rows(a)
    mesh = make_mesh((n_dev,), ("rows",))
    u1, s1, v1 = rsvd_sharded(st, mesh, k=8, p=8, q=2, method="eigh")
    u2, s2, v2 = rsvd(st, k=8, p=8, q=2, method="eigh",
                      precision="int8")
    assert u1.shape == (m, 8)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), atol=1e-5)
