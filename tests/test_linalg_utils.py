"""Scalar rotation utilities (reference JacobiRotation::makeJacobi,
src/Jacobi_Class.cpp:39-60, and givens_rotation, src/QR.cpp:12-20)."""

import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import (
    givens_rotation,
    make_jacobi,
)


def test_make_jacobi_annihilates_offdiag(rng):
    for _ in range(20):
        x, y, z = rng.standard_normal(3)
        c, s = (float(v) for v in make_jacobi(x, y, z))
        j = np.array([[c, s], [-s, c]])
        m = np.array([[x, y], [y, z]])
        rotated = j.T @ m @ j
        assert abs(rotated[0, 1]) < 1e-12
        assert abs(c * c + s * s - 1.0) < 1e-12


def test_make_jacobi_zero_offdiag():
    c, s = (float(v) for v in make_jacobi(2.0, 0.0, 1.0))
    assert c == 1.0 and s == 0.0


def test_givens_rotation(rng):
    """Reference convention (src/QR.cpp:12-20): G = [[c, s], [-s, c]]
    applied as G @ [a, b] = [r, 0]."""
    for _ in range(20):
        a, b = rng.standard_normal(2)
        c, s, r = (float(v) for v in givens_rotation(a, b))
        g = np.array([[c, s], [-s, c]])
        out = g @ np.array([a, b])
        assert abs(out[1]) < 1e-12
        assert abs(out[0] - np.hypot(a, b)) < 1e-12


def test_givens_zero():
    c, s, r = (float(v) for v in givens_rotation(0.0, 0.0))
    assert c == 1.0 and s == 0.0 and r == 0.0


class TestPolarProcrustes:
    def test_polar_right(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import polar

        rng = np.random.default_rng(0)
        a = rng.standard_normal((40, 30))
        u_p, h = polar(jnp.asarray(a))
        u_p, h = np.asarray(u_p), np.asarray(h)
        np.testing.assert_allclose(u_p @ h, a, atol=1e-10)
        np.testing.assert_allclose(u_p.T @ u_p, np.eye(30), atol=1e-10)
        np.testing.assert_allclose(h, h.T, atol=1e-10)
        assert np.min(np.linalg.eigvalsh(h)) > -1e-10

    def test_polar_left(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import polar

        rng = np.random.default_rng(1)
        a = rng.standard_normal((30, 30))
        u_p, h = polar(jnp.asarray(a), side="left")
        np.testing.assert_allclose(np.asarray(h) @ np.asarray(u_p), a,
                                   atol=1e-10)

    def test_procrustes_recovers_rotation(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import procrustes

        rng = np.random.default_rng(2)
        a = rng.standard_normal((50, 8))
        q_true, _ = np.linalg.qr(rng.standard_normal((8, 8)))
        b = a @ q_true
        q = np.asarray(procrustes(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_allclose(q, q_true, atol=1e-10)

    def test_procrustes_aligns_rsvd_factors(self):
        import numpy as np
        import jax.numpy as jnp

        from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import procrustes
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd

        rng = np.random.default_rng(3)
        a = rng.standard_normal((80, 10)) @ rng.standard_normal((10, 60))
        u1, s1, _ = rsvd(jnp.asarray(a), k=10, seed=0, method="eigh")
        u2, _, _ = rsvd(jnp.asarray(a), k=10, seed=99, method="eigh")
        q = procrustes(u2, u1)
        err = np.linalg.norm(np.asarray(u2 @ q) - np.asarray(u1))
        assert err < 1e-6
