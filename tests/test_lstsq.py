"""Sketched-preconditioner least squares (rsvd/lstsq.py): agreement with
the normal-equation optimum, conditioning robustness, multi-RHS."""

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import (
    lstsq_residual,
    sketch_lstsq,
)


def _tall(m, n, cond=10.0, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, n)))
    v, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -np.log10(cond), n)
    return (u * s[None, :]) @ v.T


class TestSketchLstsq:
    def test_matches_numpy_lstsq(self):
        a = _tall(500, 40, cond=100.0, seed=0)
        b = np.random.default_rng(1).standard_normal(500)
        x = np.asarray(sketch_lstsq(a, b, seed=0))
        x_np = np.linalg.lstsq(a, b, rcond=None)[0]
        np.testing.assert_allclose(x, x_np, rtol=1e-8, atol=1e-10)

    def test_ill_conditioned(self):
        # cond(A) = 1e8: unpreconditioned LSQR would need ~cond iterations;
        # the sketched preconditioner makes 40 steps enough
        a = _tall(800, 30, cond=1e8, seed=2)
        x_true = np.random.default_rng(3).standard_normal(30)
        b = a @ x_true  # consistent system: exact solution recoverable
        x = np.asarray(sketch_lstsq(a, b, seed=0))
        rel = float(np.asarray(lstsq_residual(a, x, b))) / np.linalg.norm(b)
        assert rel < 1e-8

    def test_multiple_rhs(self):
        a = _tall(300, 25, seed=4)
        b = np.random.default_rng(5).standard_normal((300, 3))
        x = np.asarray(sketch_lstsq(a, b, seed=1))
        assert x.shape == (25, 3)
        x_np = np.linalg.lstsq(a, b, rcond=None)[0]
        np.testing.assert_allclose(x, x_np, rtol=1e-8, atol=1e-10)

    def test_inconsistent_residual_is_optimal(self):
        a = _tall(200, 10, seed=6)
        b = np.random.default_rng(7).standard_normal(200)
        x = np.asarray(sketch_lstsq(a, b))
        r_opt = np.linalg.norm(
            a @ np.linalg.lstsq(a, b, rcond=None)[0] - b)
        r_got = float(np.asarray(lstsq_residual(a, x, b)))
        assert r_got <= r_opt * (1 + 1e-10)

    def test_seed_invariance_of_solution(self):
        # the preconditioner depends on the sketch; the SOLUTION must not
        a = _tall(250, 15, seed=8)
        b = np.random.default_rng(9).standard_normal(250)
        x0 = np.asarray(sketch_lstsq(a, b, seed=0))
        x1 = np.asarray(sketch_lstsq(a, b, seed=12345))
        np.testing.assert_allclose(x0, x1, rtol=1e-9, atol=1e-11)

    def test_ridge_matches_normal_equations(self):
        a = _tall(400, 20, cond=1e4, seed=10)
        b = np.random.default_rng(11).standard_normal(400)
        lam = 0.1
        x = np.asarray(sketch_lstsq(a, b, damp=lam, seed=0))
        x_ne = np.linalg.solve(a.T @ a + lam * np.eye(20), a.T @ b)
        np.testing.assert_allclose(x, x_ne, rtol=1e-8, atol=1e-10)

    def test_ridge_shrinks_norm(self):
        a = _tall(200, 10, seed=12)
        b = np.random.default_rng(13).standard_normal(200)
        x0 = np.asarray(sketch_lstsq(a, b))
        x1 = np.asarray(sketch_lstsq(a, b, damp=10.0))
        assert np.linalg.norm(x1) < np.linalg.norm(x0)

    def test_negative_damp_raises(self):
        with pytest.raises(ValueError):
            sketch_lstsq(np.zeros((20, 5)), np.zeros(20), damp=-1.0)

    def test_shape_validation(self):
        with pytest.raises(ValueError):
            sketch_lstsq(np.zeros((5, 10)), np.zeros(5))
        with pytest.raises(ValueError):
            sketch_lstsq(np.zeros((100, 10)), np.zeros(100), sketch_size=5)


class TestMinNorm:
    def test_matches_pinv_solution(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import (
            sketch_minnorm,
        )

        rng = np.random.default_rng(50)
        a = rng.standard_normal((30, 200))          # wide, full row rank
        b = rng.standard_normal(30)
        x = np.asarray(sketch_minnorm(a, b, seed=0))
        x_pinv = np.linalg.pinv(a) @ b
        np.testing.assert_allclose(x, x_pinv, rtol=1e-8, atol=1e-10)
        # consistency and minimum-norm property
        np.testing.assert_allclose(a @ x, b, rtol=1e-8, atol=1e-10)

    def test_ill_conditioned_rows(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import (
            sketch_minnorm,
        )

        rng = np.random.default_rng(51)
        u, _ = np.linalg.qr(rng.standard_normal((25, 25)))
        v, _ = np.linalg.qr(rng.standard_normal((300, 25)))
        s = np.logspace(0, -6, 25)                  # cond 1e6
        a = (u * s[None, :]) @ v.T                  # 25 x 300
        b = a @ rng.standard_normal(300)            # consistent
        x = np.asarray(sketch_minnorm(a, b, seed=1, iters=60))
        rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
        assert rel < 1e-7, rel

    def test_multiple_rhs_and_guards(self):
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import (
            sketch_minnorm,
        )

        rng = np.random.default_rng(52)
        a = rng.standard_normal((10, 80))
        b = rng.standard_normal((10, 3))
        x = np.asarray(sketch_minnorm(a, b))
        assert x.shape == (80, 3)
        x_pinv = np.linalg.pinv(a) @ b
        np.testing.assert_allclose(x, x_pinv, rtol=1e-7, atol=1e-9)
        with pytest.raises(ValueError):
            sketch_minnorm(np.zeros((80, 10)), np.zeros(80))
