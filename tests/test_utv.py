"""Randomized UTV / powerURV (rsvd/utv.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.utv import rutv, rutv_reconstruct


def _spectrum_matrix(m, n, s, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    return u @ np.diag(s) @ v.T


class TestRutv:
    def test_factors_structure(self):
        a = jnp.asarray(np.random.default_rng(0).standard_normal((80, 60)))
        u, t, v = rutv(a, k=12, p=8)
        l = 20
        assert u.shape == (80, l) and t.shape == (l, l) and v.shape == (60, l)
        np.testing.assert_allclose(np.asarray(u.T @ u), np.eye(l), atol=1e-9)
        np.testing.assert_allclose(np.asarray(v.T @ v), np.eye(l), atol=1e-9)
        # upper triangular with positive diagonal
        np.testing.assert_allclose(np.asarray(jnp.tril(t, -1)), 0.0,
                                   atol=1e-9)
        assert np.all(np.asarray(jnp.diag(t)) > 0)

    def test_exact_on_low_rank(self):
        s = np.concatenate([np.geomspace(1, 0.1, 8), np.zeros(42)])
        a = jnp.asarray(_spectrum_matrix(100, 50, s, seed=1))
        u, t, v = rutv(a, k=8, p=8)
        err = np.linalg.norm(np.asarray(a - rutv_reconstruct(u, t, v)))
        assert err < 1e-8

    def test_diag_tracks_singular_values(self):
        """|T_ii| approximates sigma_i after power iteration (powerURV's
        rank-revealing property).  The per-entry contamination scales as
        (sigma_{i+1}/sigma_i)^(2q+1), so tight tracking needs decaying
        gaps: ratio ~0.29 here -> ~0.2% at q=2."""
        s = np.concatenate([np.geomspace(1, 1e-6, 12), np.full(28, 1e-7)])
        a = jnp.asarray(_spectrum_matrix(120, 40, s, seed=2))
        u, t, v = rutv(a, k=0, p=16, q=2)
        d = np.asarray(jnp.diag(t))[:6]
        np.testing.assert_allclose(d, s[:6], rtol=0.05)
        # and on slow decay it still reveals the rank ORDER of magnitude
        s2 = np.geomspace(1, 1e-4, 40)
        a2 = jnp.asarray(_spectrum_matrix(120, 40, s2, seed=3))
        _, t2, _ = rutv(a2, k=0, p=12, q=2)
        d2 = np.asarray(jnp.diag(t2))[:8]
        assert np.all(d2 < 2.0 * s2[:8]) and np.all(d2 > 0.3 * s2[:8])

    def test_truncation_near_optimal(self):
        s = np.geomspace(1, 1e-3, 60)
        a_np = _spectrum_matrix(90, 60, s, seed=3)
        a = jnp.asarray(a_np)
        k = 10
        u, t, v = rutv(a, k=k, p=10, q=2)
        err = np.linalg.norm(a_np - np.asarray(rutv_reconstruct(u, t, v, k)))
        opt = np.sqrt(np.sum(s[k:] ** 2))
        assert err < 1.5 * opt

    def test_matches_rsvd_error(self):
        """Same range-finder power: UTV truncation error comparable to the
        rSVD driver's at equal (k, p, q)."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            reconstruction_error,
            rsvd,
        )

        rng = np.random.default_rng(4)
        a_np = (rng.standard_normal((100, 70, 12)) @
                rng.standard_normal((12,)))  # rank-12 + none
        a_np = a_np + 1e-3 * rng.standard_normal((100, 70))
        a = jnp.asarray(a_np)
        k = 12
        u, t, v = rutv(a, k=k, p=10, q=2)
        e_utv = np.linalg.norm(
            a_np - np.asarray(rutv_reconstruct(u, t, v, k)))
        uu, ss, vv = rsvd(a, k=k, p=10, q=2, method="eigh")
        e_rsvd = float(reconstruction_error(a, uu, ss, vv))
        assert e_utv < 1.2 * e_rsvd + 1e-12

    def test_differentiable(self):
        a = jnp.asarray(_spectrum_matrix(
            40, 30, np.geomspace(1, 1e-2, 30), seed=5))

        def loss(a):
            u, t, v = rutv(a, k=5, p=5, q=1)
            return jnp.sum(jnp.diag(t)[:5])

        g = jax.grad(loss)(a)
        assert bool(jnp.all(jnp.isfinite(g)))


class TestUtvFinish:
    """rsvd(finish='utv'): the powerURV serving tail inside the driver
    (docs/ARCHITECTURE.md small-op latency decomposition — it exists to
    dodge the depth-bound l x l eigh at latency-critical small sizes)."""

    def test_full_rank_reconstruction_matches_project(self):
        """At full rank l the UTV tail reconstructs EXACTLY Q B — the
        same projector approximation finish='project' factors."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

        a = jnp.asarray(_spectrum_matrix(
            120, 90, np.geomspace(1, 1e-3, 90), seed=7))
        u1, s1, v1 = rsvd(a, k=0, p=16, q=2, finish="utv")
        u2, s2, v2 = rsvd(a, k=0, p=16, q=2, method="eigh",
                          finish="project")
        rec1 = np.asarray(u1) * np.asarray(s1)[None, :] @ np.asarray(v1).T
        rec2 = np.asarray(u2) * np.asarray(s2)[None, :] @ np.asarray(v2).T
        np.testing.assert_allclose(rec1, rec2, atol=1e-10)

    def test_contract(self):
        """V orthonormal; U unit-norm columns; s descending; the exact
        energy identity sum s^2 = sum sigma(B)^2; and per-entry sigma
        tracking on a strongly GAPPED spectrum (the documented regime:
        measured max rel 0.27% at ratio 0.3, 26% at 0.5 — the weights
        are decomposition weights, not singular values)."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

        n = 30
        a = jnp.asarray(_spectrum_matrix(100, n, 0.3 ** np.arange(n),
                                         seed=8))
        k, p = 8, 6
        u, s, v = rsvd(a, k=0, p=p + k, q=2, finish="utv")
        u_np, s_np, v_np = map(np.asarray, (u, s, v))
        l = k + p
        assert u_np.shape == (100, l) and v_np.shape == (n, l)
        np.testing.assert_allclose(v_np.T @ v_np, np.eye(l), atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(u_np, axis=0),
                                   np.ones(l), atol=1e-9)
        assert np.all(np.diff(s_np) <= 1e-12)
        s_true = np.linalg.svd(np.asarray(a), compute_uv=False)
        # exact energy identity (range-finder floor at this gap is ~1e-9)
        np.testing.assert_allclose(float((s_np ** 2).sum()),
                                   float((s_true[:l] ** 2).sum()),
                                   rtol=1e-8)
        np.testing.assert_allclose(s_np[:k], s_true[:k], rtol=1e-2)

    def test_truncation_near_optimal(self):
        """Rank-k truncation error within a small factor of the eigh
        tail's (the documented serving trade)."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            reconstruction_error,
            rsvd,
        )

        a = jnp.asarray(_spectrum_matrix(
            150, 100, np.geomspace(1, 1e-4, 100), seed=9))
        k = 12
        u, s, v = rsvd(a, k=k, p=10, q=2, finish="utv")
        e_utv = float(reconstruction_error(a, u, s, v))
        uu, ss, vv = rsvd(a, k=k, p=10, q=2, method="eigh")
        e_svd = float(reconstruction_error(a, uu, ss, vv))
        assert e_utv < 1.2 * e_svd + 1e-12

    def test_batched_and_vmappable(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd_batched

        rng = np.random.default_rng(10)
        a = jnp.asarray(rng.standard_normal((3, 60, 40)), jnp.float32)
        u, s, v = rsvd_batched(a, k=5, p=5, q=1, finish="utv")
        assert u.shape == (3, 60, 5) and s.shape == (3, 5)
        rec = np.einsum("bmk,bk,bnk->bmn", np.asarray(u), np.asarray(s),
                        np.asarray(v))
        # near-flat gaussian spectrum: just check finite + sane energy
        assert np.isfinite(rec).all()

    def test_unknown_finish_raises(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

        a = jnp.asarray(np.random.default_rng(11).standard_normal((20, 15)))
        import pytest

        with pytest.raises(ValueError):
            rsvd(a, k=4, finish="nope")


class TestRowspaceUtvFinish:
    """finish='rowspace_utv': both serving levers composed (2q+1 passes
    + QR tail).  Same weight/unit-column contract as 'utv'."""

    def test_reconstruction_and_contract(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            reconstruction_error,
            rsvd,
        )

        a = jnp.asarray(_spectrum_matrix(
            150, 100, np.geomspace(1, 1e-4, 100), seed=12))
        k = 12
        u, s, v = rsvd(a, k=k, p=10, q=2, finish="rowspace_utv")
        u_np, s_np, v_np = map(np.asarray, (u, s, v))
        np.testing.assert_allclose(v_np.T @ v_np, np.eye(k), atol=1e-9)
        np.testing.assert_allclose(np.linalg.norm(u_np, axis=0),
                                   np.ones(k), atol=1e-9)
        assert np.all(np.diff(s_np) <= 1e-12)
        e = float(reconstruction_error(a, u, s, v))
        uu, ss, vv = rsvd(a, k=k, p=10, q=2, method="eigh")
        e_svd = float(reconstruction_error(a, uu, ss, vv))
        assert e < 1.2 * e_svd + 1e-12

    def test_full_rank_matches_rowspace(self):
        """At full rank l both rowspace tails reconstruct the SAME
        projector approximation (A Z_q) Z_q^T."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

        a = jnp.asarray(_spectrum_matrix(
            90, 70, np.geomspace(1, 1e-3, 70), seed=13))
        u1, s1, v1 = rsvd(a, k=0, p=12, q=2, finish="rowspace_utv")
        u2, s2, v2 = rsvd(a, k=0, p=12, q=2, method="eigh",
                          finish="rowspace")
        rec1 = np.asarray(u1) * np.asarray(s1)[None, :] @ np.asarray(v1).T
        rec2 = np.asarray(u2) * np.asarray(s2)[None, :] @ np.asarray(v2).T
        np.testing.assert_allclose(rec1, rec2, atol=1e-10)

    def test_q0_raises(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd
        import pytest

        a = jnp.asarray(np.random.default_rng(14).standard_normal((20, 15)))
        with pytest.raises(ValueError):
            rsvd(a, k=4, q=0, finish="rowspace_utv")


def test_utv_weights_keep_f64_precision():
    """The fold's column norms must accumulate at the INPUT precision:
    an f32 norm of an f64 factor would cap x64 science runs at ~1e-7
    (round-4 self-review finding).  The exact energy identity
    sum s^2 = ||B||_F^2 must hold at f64 resolution."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

    n = 40
    a = jnp.asarray(_spectrum_matrix(90, n, np.geomspace(1, 1e-3, n),
                                     seed=21))
    assert a.dtype == jnp.float64
    u, s, v = rsvd(a, k=0, p=12, q=2, finish="utv")
    s_np = np.asarray(s)
    assert s_np.dtype == np.float64
    # identical stage A => identical B; sum s^2 = ||B||_F^2 = the eigh
    # tail's sum sigma(B)^2, equal at f64 ARITHMETIC resolution (the
    # top-l sum of sigma(A)^2 differs by the range-finder gap — that is
    # a different, algorithmic quantity)
    _, s_p, _ = rsvd(a, k=0, p=12, q=2, method="eigh", finish="project")
    np.testing.assert_allclose(float((s_np ** 2).sum()),
                               float((np.asarray(s_p) ** 2).sum()),
                               rtol=1e-12)


class TestUtvRescore:
    """utv_rescore: exact off-critical-path sigma for UTV serving
    monitoring (VERDICT r4 item 6).  Must match the eigh tail to
    arithmetic accuracy even where the fold weights mistrack by 26%
    (spectral-gap ratio 0.5)."""

    def test_rescore_matches_eigh_tail_on_ungapped_spectrum(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import utv_rescore
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

        n = 30
        a = jnp.asarray(_spectrum_matrix(100, n, 0.5 ** np.arange(n),
                                         seed=31))
        u, s, v = rsvd(a, k=0, p=14, q=2, finish="utv")
        _, s_eigh, _ = rsvd(a, k=0, p=14, q=2, method="eigh",
                            finish="project")
        # weights DO mistrack here (the documented 26%-at-0.5 regime) ...
        assert np.abs(np.asarray(s) / np.asarray(s_eigh) - 1.0).max() \
            > 0.02
        # ... and the rescore recovers the eigh tail's sigma exactly
        u_r, sigma, v_r = utv_rescore(u, s, v)
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(s_eigh),
                                   rtol=2e-12)

    def test_rescored_factors_are_an_exact_svd(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import utv_rescore
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd

        a = jnp.asarray(_spectrum_matrix(
            90, 60, np.geomspace(1, 1e-3, 60), seed=32))
        u, s, v = rsvd(a, k=0, p=12, q=2, finish="rowspace_utv")
        u_r, sigma, v_r = utv_rescore(u, s, v)
        l = 12
        # same approximant, now with orthonormal U and true sigma
        m1 = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        m2 = (np.asarray(u_r) * np.asarray(sigma)[None, :]
              @ np.asarray(v_r).T)
        np.testing.assert_allclose(m2, m1, atol=1e-12)
        eye = np.eye(u_r.shape[1])
        assert np.abs(np.asarray(u_r.T @ u_r) - eye).max() < 1e-10
        assert np.abs(np.asarray(v_r.T @ v_r) - eye).max() < 1e-10
        assert np.all(np.diff(np.asarray(sigma)) <= 1e-15)

    def test_rescore_zeroes_floor_directions(self):
        """Rank-deficient approximant: directions at the roundoff floor
        come back zeroed, not as normalized noise."""
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import utv_rescore

        rng = np.random.default_rng(33)
        u, _ = np.linalg.qr(rng.standard_normal((50, 6)))
        v, _ = np.linalg.qr(rng.standard_normal((40, 6)))
        s = np.array([3.0, 2.0, 1.0, 0.5, 0.0, 0.0])
        u_r, sigma, v_r = utv_rescore(jnp.asarray(u), jnp.asarray(s),
                                      jnp.asarray(v))
        assert np.linalg.norm(np.asarray(u_r)[:, 4:]) < 1e-12
        np.testing.assert_allclose(np.asarray(sigma)[:4], s[:4],
                                   rtol=1e-12)
