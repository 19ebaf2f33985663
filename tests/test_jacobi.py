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
@pytest.mark.slow
def test_rectangular(shape, rng):
    a = rng.standard_normal(shape)
    u, s, v = jacobi_svd(jnp.asarray(a))
    _check_svd(a, u, s, v)


@pytest.mark.slow
def test_block_apply_square(rng):
    """Block tournament (vmapped pair-Gram eigh) — the large-n engine."""
    a = rng.standard_normal((96, 96))
    u, s, v = jacobi_svd(jnp.asarray(a), apply="block", block_size=16)
    _check_svd(a, u, s, v)


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


class TestChunkedDispatch:
    """jacobi_svd_chunked: one dispatch per sweep with host-side
    convergence checks — must match apply='block' exactly (same rounds,
    same stopping rules) while never compiling a whole-convergence
    program (the relay-watchdog constraint, VERDICT r2 item 6)."""

    @pytest.mark.slow
    def test_matches_block_engine(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import (
            jacobi_svd,
            jacobi_svd_chunked,
        )

        for n, cond in [(96, 1.0), (160, 1e3), (130, 1e6)]:
            u0, _ = np.linalg.qr(rng.standard_normal((n, n)))
            v0, _ = np.linalg.qr(rng.standard_normal((n, n)))
            sig = np.logspace(0, -np.log10(max(cond, 1.0 + 1e-9)), n)
            a = jnp.asarray((u0 * sig[None, :]) @ v0.T)
            u1, s1, v1 = jacobi_svd(a, apply="block")
            u2, s2, v2 = jacobi_svd_chunked(a)
            # same math and stopping rules, but independently compiled
            # programs: pin to a few ulps rather than bitwise equality
            # (XLA does not guarantee identical fusion across programs)
            np.testing.assert_allclose(np.asarray(s2), np.asarray(s1),
                                       rtol=1e-13,
                                       atol=1e-13 * float(s1[0]))
            rec = (np.asarray(u2) * np.asarray(s2)[None, :]
                   @ np.asarray(v2).T)
            assert (np.linalg.norm(rec - np.asarray(a))
                    < 1e-10 * np.linalg.norm(np.asarray(a)))

    def test_tall_precondition_and_progress(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import (
            jacobi_svd_chunked,
        )

        a = jnp.asarray(rng.standard_normal((300, 120)))
        seen = []
        u, s, v = jacobi_svd_chunked(
            a, progress=lambda ph, i, off: seen.append((ph, i, off)))
        assert u.shape == (300, 120) and v.shape == (120, 120)
        s_np = np.linalg.svd(np.asarray(a), compute_uv=False)
        np.testing.assert_allclose(np.asarray(s), s_np, rtol=1e-9)
        assert any(ph == "block" for ph, _, _ in seen)
        # measures must be monotone non-increasing within the block phase
        blocks = [off for ph, _, off in seen if ph == "block"]
        assert all(b2 <= b1 * 1.01 for b1, b2 in zip(blocks, blocks[1:]))

    def test_wide_input_transpose(self, rng):
        from rsvd_kamaneh_raganato_terrana_tpu.linalg.jacobi import (
            jacobi_svd_chunked,
        )

        a = jnp.asarray(rng.standard_normal((80, 150)))
        u, s, v = jacobi_svd_chunked(a)
        assert u.shape == (80, 80) and v.shape == (150, 80)
        rec = np.asarray(u) * np.asarray(s)[None, :] @ np.asarray(v).T
        assert np.linalg.norm(rec - np.asarray(a)) < 1e-8
