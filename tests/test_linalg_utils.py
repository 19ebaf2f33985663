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
