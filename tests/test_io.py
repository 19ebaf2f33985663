"""MatrixMarket I/O + native library parity (reference: Eigen load/saveMarket
round-trips and the Python comparator harness)."""

import os

import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.core.io import (
    _read_python,
    load_whitespace_dataset,
    read_matrix_market,
    write_matrix_market,
)
from rsvd_kamaneh_raganato_terrana_tpu.native import get_native_lib

from conftest import DATA_DIR


def test_read_reference_inputs(input_matrices):
    a = input_matrices["sparse_matrix.mtx"]
    assert a.shape == (100, 100)
    # dense 100x100 with entries 1..10000 (python/matrix_maker.py:15-25)
    assert a[0, 0] == 1.0 and a[0, 1] == 2.0
    assert a[99, 99] == 10000.0
    diag = input_matrices["sparse_matrix100.mtx"]
    assert np.allclose(diag, np.eye(100))


def test_roundtrip(tmp_path, rng):
    a = rng.standard_normal((17, 9))
    a[3, :] = 0.0
    path = str(tmp_path / "rt.mtx")
    write_matrix_market(path, a)
    b = read_matrix_market(path)
    np.testing.assert_allclose(a, b, atol=1e-15)


def test_native_matches_python(tmp_path, rng):
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    a = rng.standard_normal((31, 8))
    path = str(tmp_path / "n.mtx")
    write_matrix_market(path, a)
    np.testing.assert_allclose(lib.read_mtx(path), _read_python(path))
    # native writer roundtrip
    path2 = str(tmp_path / "n2.mtx")
    lib.write_mtx(path2, a)
    np.testing.assert_allclose(_read_python(path2), a, atol=1e-15)


def test_native_codec(rng):
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    x = rng.standard_normal((40, 7)) * 3.0
    q, scale, offset = lib.quantize_affine(x)
    back = lib.dequantize_affine(q, scale, offset)
    assert np.max(np.abs(back - x)) <= 0.5 * scale + 1e-12
    # truncate mode reproduces the reference byte semantics
    y = np.array([[1.9, 255.0, 256.0, -1.0]])
    qt = lib.quantize_truncate(y)
    assert list(qt.ravel()) == [1, 255, 0, 255]


def test_symmetric_matrix_market(tmp_path):
    """'coordinate real symmetric' stores one triangle; both readers must
    mirror it (regression: the mirrored half loaded as zeros)."""
    path = str(tmp_path / "sym.mtx")
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 4\n1 1 2.0\n2 1 5.0\n3 2 -1.0\n3 3 4.0\n")
    expect = np.array([[2.0, 5.0, 0.0], [5.0, 0.0, -1.0], [0.0, -1.0, 4.0]])
    np.testing.assert_allclose(_read_python(path), expect)
    lib = get_native_lib()
    if lib is not None:
        np.testing.assert_allclose(lib.read_mtx(path), expect)


def test_key_from_seed_accepts_keys():
    """generate_omega's documented key-or-seed API (regression: raw uint32
    keys crashed)."""
    import jax

    from rsvd_kamaneh_raganato_terrana_tpu.core.rng import key_from_seed

    raw = jax.random.PRNGKey(0)
    assert key_from_seed(raw) is raw
    typed = jax.random.key(0)
    assert key_from_seed(typed) is typed
    k = key_from_seed(7)  # int seed still works
    assert k is not None


def test_pca_dataset_loader():
    data, labels = load_whitespace_dataset(
        os.path.join(DATA_DIR, "pca", "tourists.txt"), skip_cols=3
    )
    assert data.shape[1] == 8  # 8 numeric hotel columns
    assert data.shape[0] > 100
    assert "PIEMONTE" in labels[0]
    ath, countries = load_whitespace_dataset(
        os.path.join(DATA_DIR, "pca", "dataset_athletic.txt"), skip_cols=1
    )
    assert ath.shape[1] == 7
    assert countries[0] == "argentin"
