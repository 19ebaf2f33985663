"""Posterior error certificates and subspace diagnostics
(rsvd/diagnostics.py): the bound must HOLD (upper bound) and be TIGHT
(within its 10x-ish factor), angles must match the exact cos-SVD."""

import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.diagnostics import (
    factorization_error_estimate,
    principal_angles,
    range_error_estimate,
    subspace_distance,
)
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import rsvd


def _decaying(m, n, seed=0, decay=0.5):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = decay ** np.arange(n)
    return (u * s[None, :]) @ v.T


class TestErrorCertificates:
    def test_range_bound_holds_and_is_tight(self):
        a = _decaying(300, 80, seed=0)
        u, s, v = rsvd(a, k=10, p=6, q=1, method="eigh", seed=0)
        q_mat = np.asarray(u)  # orthonormal basis for the captured range
        true = np.linalg.norm(a - q_mat @ (q_mat.T @ a), 2)
        est = float(range_error_estimate(jnp.asarray(a),
                                         jnp.asarray(q_mat), seed=1))
        assert est >= true * (1 - 1e-9)          # it is an upper bound
        assert est <= 40.0 * true + 1e-12        # and not vacuous

    def test_factorization_bound_holds(self):
        a = _decaying(200, 60, seed=1)
        u, s, v = rsvd(a, k=8, p=8, q=2, method="eigh", seed=0)
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        true = np.linalg.norm(a - rec, 2)
        est = float(factorization_error_estimate(
            jnp.asarray(a), u, s, v, seed=2))
        assert est >= true * (1 - 1e-9)
        assert est <= 40.0 * true + 1e-12

    def test_probes_disjoint_from_sketch_stream(self):
        # regression: with probes drawn from generate_omega's stream, a
        # basis built from omega(seed=0, l=10) would satisfy
        # (I-QQ^T)A g = 0 identically and the bound would certify garbage
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import (
            orthonormal_basis,
        )
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
            generate_omega,
        )

        a = _decaying(120, 60, seed=4, decay=0.9)  # slow decay: rank-10
        omega = generate_omega(0, 60, 10, jnp.asarray(a).dtype)
        q = orthonormal_basis(jnp.asarray(a) @ omega)  # basis misses a lot
        true = np.linalg.norm(a - np.asarray(q) @ (np.asarray(q).T @ a), 2)
        est = float(range_error_estimate(jnp.asarray(a), q, seed=0,
                                         num_probes=10))
        assert est >= true * (1 - 1e-9)
        assert est > 0.1 * np.linalg.norm(a, 2)  # genuinely nonzero

    def test_exact_factorization_certifies_zero(self):
        rng = np.random.default_rng(2)
        u0, _ = np.linalg.qr(rng.standard_normal((50, 5)))
        v0, _ = np.linalg.qr(rng.standard_normal((20, 5)))
        s0 = np.array([5.0, 4.0, 3.0, 2.0, 1.0])
        a = (u0 * s0[None, :]) @ v0.T
        est = float(factorization_error_estimate(
            jnp.asarray(a), jnp.asarray(u0), jnp.asarray(s0),
            jnp.asarray(v0), seed=0))
        assert est < 1e-10


class TestNormEstimates:
    def test_spectral_norm_converges(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.diagnostics import (
            spectral_norm_estimate,
        )

        a = _decaying(150, 60, seed=7, decay=0.6)
        est = float(spectral_norm_estimate(jnp.asarray(a), num_iters=40))
        true = np.linalg.norm(a, 2)
        assert est <= true * (1 + 1e-9)          # power method lower-bounds
        assert est > 0.999 * true

    def test_stable_rank(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.diagnostics import (
            stable_rank_estimate,
        )

        # rank-r orthogonal projector-like matrix: srank == r exactly
        rng = np.random.default_rng(8)
        u = np.linalg.qr(rng.standard_normal((100, 7)))[0]
        v = np.linalg.qr(rng.standard_normal((50, 7)))[0]
        a = u @ v.T                               # all singular values 1
        est = float(stable_rank_estimate(jnp.asarray(a), num_iters=50))
        np.testing.assert_allclose(est, 7.0, rtol=1e-6)


class TestPrincipalAngles:
    def test_identical_spans_zero_angles(self):
        rng = np.random.default_rng(3)
        u = np.linalg.qr(rng.standard_normal((40, 4)))[0]
        rot = np.linalg.qr(rng.standard_normal((4, 4)))[0]
        ang, cos = principal_angles(jnp.asarray(u), jnp.asarray(u @ rot))
        np.testing.assert_allclose(np.asarray(ang), 0.0, atol=1e-7)
        assert float(subspace_distance(u, u @ rot)) < 1e-7

    def test_orthogonal_spans_right_angles(self):
        e1 = np.eye(10)[:, :3]
        e2 = np.eye(10)[:, 3:6]
        ang, _ = principal_angles(jnp.asarray(e1), jnp.asarray(e2))
        np.testing.assert_allclose(np.asarray(ang), np.pi / 2, atol=1e-7)
        assert abs(float(subspace_distance(e1, e2)) - 1.0) < 1e-7

    def test_known_single_angle(self):
        theta = 0.3
        u = np.array([[1.0], [0.0]])
        v = np.array([[np.cos(theta)], [np.sin(theta)]])
        ang, _ = principal_angles(jnp.asarray(u), jnp.asarray(v))
        np.testing.assert_allclose(float(ang[0]), theta, rtol=1e-7)


class TestFactorHealth:
    """rsvd.factor_health — the post-hoc library-level signal the
    cholqr1 serving contract lacks (round-5; VERDICT r4 item 5)."""

    def _factor(self, rank_deficient=False, seed=0):
        import numpy as np

        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        rng = np.random.default_rng(seed)
        a = rng.standard_normal((120, 80)).astype(np.float32)
        if rank_deficient:
            a[:, 40:] = a[:, :40]        # exact rank 40 < l
        return jnp.asarray(a)

    def test_healthy_factorization_passes(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            factor_health,
            rsvd,
        )

        u, s, v = rsvd(self._factor(), k=10, p=6, q=1, method="eigh")
        h = factor_health(u, s, v)
        assert h["ok"] and h["finite"]
        assert h["u_col_err"] < 1e-4 and h["v_orth_err"] < 1e-4
        assert h["s_ascending_violation"] <= 0.0

    def test_nan_factors_flagged(self):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import factor_health

        u = jnp.full((50, 8), jnp.nan)
        s = jnp.ones(8)
        v = jnp.eye(40)[:, :8]
        h = factor_health(u, s, v)
        assert not h["ok"] and not h["finite"]
        assert not np.isfinite(h["u_col_err"])

    def test_short_columns_flagged(self):
        """polar's graceful rank-deficiency mode (short-normed columns)
        must trip the unit-column check."""
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import factor_health

        rng = np.random.default_rng(1)
        u, _ = np.linalg.qr(rng.standard_normal((60, 8)))
        u[:, -1] *= 0.1                   # collapsed direction
        v, _ = np.linalg.qr(rng.standard_normal((40, 8)))
        s = np.linspace(8, 1, 8)
        h = factor_health(jnp.asarray(u), jnp.asarray(s), jnp.asarray(v))
        assert not h["ok"] and h["finite"]
        assert h["u_col_err"] > 0.5

    def test_ascending_s_flagged(self):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import factor_health

        rng = np.random.default_rng(2)
        u, _ = np.linalg.qr(rng.standard_normal((60, 6)))
        v, _ = np.linalg.qr(rng.standard_normal((30, 6)))
        s = np.array([1.0, 2.0, 0.5, 0.4, 0.3, 0.2])  # 1 < 2: violation
        h = factor_health(jnp.asarray(u), jnp.asarray(s), jnp.asarray(v))
        assert not h["ok"]
        assert h["s_ascending_violation"] > 0.9


class TestRankDeficiencyContractMatrix:
    """Every finish x qr_method on a RANK-DEFICIENT operand: pins the
    raise-vs-NaN-vs-graceful behavior per combination (the table lives
    in docs/PARITY.md "Serving-mode rank-deficiency contract").

    Expected classes:
    - 'clean':    robust fallbacks / householder — full-accuracy factors
    - 'nan':      cholqr1 (and its fused twin) — the ONLY no-retry
                  variants: NaN factors, factor_health trips
    - 'graceful': cholqr2/3 (their _chol_maybe_shifted last-resort
                  regularization keeps factors finite at degraded
                  accuracy) — finite, flagged
    - 'unsafe':   polar — roundoff decides between NaN explosion and
                  finite-but-degraded factors (linalg/polar.py contract:
                  deterministic SIGNAL via factor_health, not
                  deterministic factors)
    """

    EXPECT = {
        "robust": "clean", "robust1": "clean", "householder": "clean",
        "cholqr1": "nan", "cholqr1_fused": "nan",
        "cholqr2": "graceful", "cholqr3": "graceful",
        "polar": "unsafe",
    }

    def _operand(self):
        import numpy as np

        import jax.numpy as jnp

        rng = np.random.default_rng(3)
        a = rng.standard_normal((100, 60)).astype(np.float32)
        a[:, 30:] = a[:, :30]            # exact rank 30; l = 36 > rank
        return jnp.asarray(a)

    def _classify(self, h):
        if not h["finite"]:
            return "nan"
        if h["ok"]:
            return "clean"
        return "graceful"

    def test_matrix(self):
        import pytest

        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
            factor_health,
            rsvd,
        )

        a = self._operand()
        observed = {}
        for finish in ("project", "utv", "rowspace_utv"):
            for qr_method, expect in self.EXPECT.items():
                u, s, v = rsvd(a, k=30, p=6, q=1, method="eigh",
                               qr_method=qr_method, interior_qr=qr_method,
                               finish=finish)
                got = self._classify(factor_health(u, s, v))
                observed[(finish, qr_method)] = got
                # 'clean' may legitimately classify as graceful for UTV
                # finishes (U is only unit-column there, never
                # orthogonal; a deficient tail can leave short columns),
                # but a NaN escape from a 'clean' method — or clean
                # factors from a method documented to NaN — breaks the
                # documented contract
                if expect == "nan":
                    assert got == "nan", (finish, qr_method, got)
                elif expect == "clean":
                    assert got != "nan", (finish, qr_method, got)
                elif expect == "graceful":
                    assert got in ("graceful", "clean"), (
                        finish, qr_method, got)
                else:
                    # 'unsafe': roundoff decides the outcome class, so
                    # nothing to pin beyond factor_health having
                    # classified it (NaNs flag via 'finite'; lifted
                    # noise directions can even masquerade as clean —
                    # the documented reason polar is serving-only)
                    assert got in ("nan", "graceful", "clean")
