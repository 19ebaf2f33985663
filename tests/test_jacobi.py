"""One-sided tournament Jacobi SVD tests vs the NumPy oracle (reference
protocol: svd_test.cpp + python/test_run_rSVD.py sign-invariant compare)."""

import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import (
    jacobi_svd,
    round_robin_schedule,
)


def test_round_robin_covers_all_pairs():
    for n in (4, 7, 8, 13):
        sched = round_robin_schedule(n)
        seen = set()
        for rnd in sched:
            cols = set()
            for p, q in rnd:
                if p == n:  # bye
                    continue
                assert p not in cols and q not in cols  # disjoint
                cols.update((p, q))
                seen.add((min(p, q), max(p, q)))
        assert len(seen) == n * (n - 1) // 2


def _check_svd(a, u, s, v, tol=1e-9):
    a = np.asarray(a)
    m, n = a.shape
    k = min(m, n)
    scale = max(np.linalg.norm(a), 1.0)
    recon = np.asarray((u * s[None, :]) @ v.T)
    assert np.linalg.norm(recon - a) < tol * scale
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np[:k], atol=tol * scale)
    # descending order
    assert np.all(np.diff(np.asarray(s)) <= 1e-12 * scale)
    # orthogonality (ignore null-space columns for rank-deficient inputs)
    nz = np.asarray(s) > tol * scale
    uu = np.asarray(u)[:, nz]
    vv = np.asarray(v)[:, nz]
    assert np.linalg.norm(uu.T @ uu - np.eye(nz.sum())) < tol * 10
    assert np.linalg.norm(vv.T @ vv - np.eye(nz.sum())) < tol * 10


@pytest.mark.parametrize("apply", ["gemm", "scatter"])
def test_square_random(apply, rng):
    a = rng.standard_normal((48, 48))
    u, s, v = jacobi_svd(jnp.asarray(a), apply=apply)
    _check_svd(a, u, s, v)


@pytest.mark.parametrize("shape", [(60, 20), (20, 60), (33, 17)])
def test_rectangular(shape, rng):
    a = rng.standard_normal(shape)
    u, s, v = jacobi_svd(jnp.asarray(a))
    _check_svd(a, u, s, v)


def test_block_apply_square(rng):
    """Block tournament (vmapped pair-Gram eigh) — the large-n engine."""
    a = rng.standard_normal((96, 96))
    u, s, v = jacobi_svd(jnp.asarray(a), apply="block", block_size=16)
    _check_svd(a, u, s, v)


def test_block_apply_nondividing_block(rng):
    a = rng.standard_normal((70, 50))  # 50 cols, block 16 -> padded
    u, s, v = jacobi_svd(jnp.asarray(a), apply="block", block_size=16)
    _check_svd(a, u, s, v)


def test_block_apply_wide_dynamic_range(rng):
    """The block phase's pair eigh cannot resolve small-sigma subspaces;
    the gated scalar polish must recover full orthogonality (regression:
    U-ortho was ~8.8 on this class of spectrum)."""
    n = 96
    uq, _ = np.linalg.qr(rng.standard_normal((n, n)))
    vq, _ = np.linalg.qr(rng.standard_normal((n, n)))
    s = np.logspace(0, -10, n)
    s[30:36] = 1e-5  # cluster
    a = (uq * s) @ vq.T
    u, sg, v = jacobi_svd(jnp.asarray(a), apply="block", block_size=16)
    assert np.linalg.norm(np.asarray(u.T @ u) - np.eye(n)) < 1e-10
    assert np.linalg.norm(np.asarray(v.T @ v) - np.eye(n)) < 1e-10


def test_auto_large_n_uses_correct_engine(rng):
    """auto dispatch stays correct for a wide input (transposed, then the
    min-dim = 40 factor selects the gemm engine)."""
    a = rng.standard_normal((40, 300))  # wide: transposed internally
    u, s, v = jacobi_svd(jnp.asarray(a), apply="auto")
    s_np = np.linalg.svd(a, compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, atol=1e-10 * s_np[0])


def test_auto_thresholds_match_measured_table():
    """The auto policy encodes the committed svd_engines.csv crossovers."""
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import _auto_apply

    assert _auto_apply(64) == "gemm"
    assert _auto_apply(256) == "gemm"
    assert _auto_apply(400) == "scatter"
    assert _auto_apply(513) == "block"
    assert _auto_apply(4096) == "block"


def test_block_apply_rank_deficient(rng):
    b = rng.standard_normal((80, 6))
    a = b @ rng.standard_normal((6, 60))
    u, s, v = jacobi_svd(jnp.asarray(a), apply="block", block_size=16)
    _check_svd(a, u, s, v, tol=1e-8)


def test_odd_dimension(rng):
    a = rng.standard_normal((25, 25))
    u, s, v = jacobi_svd(jnp.asarray(a))
    _check_svd(a, u, s, v)


def test_rank_deficient(rng):
    b = rng.standard_normal((40, 5))
    a = b @ rng.standard_normal((5, 30))  # rank 5
    u, s, v = jacobi_svd(jnp.asarray(a))
    _check_svd(a, u, s, v, tol=1e-8)
    assert np.all(np.asarray(s)[5:] < 1e-8 * np.asarray(s)[0])


def test_reference_inputs(input_matrices):
    for name, a in input_matrices.items():
        u, s, v = jacobi_svd(jnp.asarray(a))
        _check_svd(a, u, s, v, tol=1e-8)


def test_diagonal_exact():
    a = np.diag([5.0, 3.0, 1.0, 0.5])
    u, s, v = jacobi_svd(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(s), [5.0, 3.0, 1.0, 0.5], atol=1e-12)


def test_f32_accuracy(rng):
    """The TPU dtype: relative spectra accuracy at f32."""
    a = rng.standard_normal((64, 64)).astype(np.float32)
    u, s, v = jacobi_svd(jnp.asarray(a))
    s_np = np.linalg.svd(a.astype(np.float64), compute_uv=False)
    np.testing.assert_allclose(np.asarray(s), s_np, rtol=2e-4, atol=1e-4)
