"""Distributed-execution structure tests: the sharded rSVD must compile to
a genuinely partitioned SPMD program (XLA collectives over the mesh), and
2-D sharded inputs must work — the contracts behind SURVEY.md section 2.6/2.7
(reference: MPI Gatherv/Bcast choreography)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import make_mesh, shard_rows
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    generate_omega,
    rsvd_with_omega,
)


def _compiled_text(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_sharded_rsvd_contains_collectives(mesh8, rng):
    """Row-sharded rSVD lowers to SPMD with cross-device reductions — the
    TPU equivalent of the reference's Gatherv+Bcast (src/PM.cpp:60-68)."""
    a = shard_rows(jnp.asarray(rng.standard_normal((512, 64))), mesh8)

    def run(x):
        omega = generate_omega(0, 64, 16, x.dtype)
        return rsvd_with_omega(x, omega, q=1, k=8)

    text = _compiled_text(run, a)
    assert ("all-reduce" in text or "all-gather" in text
            or "reduce-scatter" in text), "no collectives in compiled HLO"


def test_sharded_rsvd_numerically_matches(mesh8, rng):
    a_np = rng.standard_normal((512, 64))

    def run(x):
        omega = generate_omega(0, 64, 16, x.dtype)
        return rsvd_with_omega(x, omega, q=2, k=8)

    u1, s1, v1 = jax.jit(run)(jnp.asarray(a_np))
    u8, s8, v8 = jax.jit(run)(shard_rows(jnp.asarray(a_np), mesh8))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s8), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u8), atol=1e-8)


def test_2d_sharded_rsvd(rng):
    """Rows x cols mesh: both matrix dims sharded (the __graft_entry__
    dryrun contract)."""
    mesh = make_mesh((4, 2), ("rows", "cols"))
    a_np = rng.standard_normal((256, 128))
    a = jax.device_put(
        jnp.asarray(a_np), NamedSharding(mesh, P("rows", "cols"))
    )

    def run(x):
        omega = generate_omega(0, 128, 16, x.dtype)
        return rsvd_with_omega(x, omega, q=2, k=8)

    u, s, v = jax.jit(run)(a)
    u1, s1, v1 = jax.jit(run)(jnp.asarray(a_np))
    np.testing.assert_allclose(np.asarray(s), np.asarray(s1), rtol=1e-9)


def test_sharded_gram_is_partitioned(mesh8, rng):
    """The Gram matmul of CholeskyQR on row-sharded input must lower to a
    partial per-shard dot + all-reduce, not a gather-then-dot."""
    from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import gram

    a = shard_rows(jnp.asarray(rng.standard_normal((512, 32))), mesh8)
    text = _compiled_text(gram, a)
    assert "all-reduce" in text
    # the local dot operates on the 64-row shard, not the full 512
    assert "512,32" not in text.replace(" ", "") or "dynamic" in text


def test_rsvd_ring_matches_plain(mesh8, rng):
    """The ring-collective driver must match the plain (XLA-collective)
    driver's factorization: same Omega draw (counter-based threefry), so
    singular values agree to fp accumulation order."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd, rsvd_ring

    a_np = rng.standard_normal((256, 160)).astype(np.float64)
    u, s, v = rsvd_ring(mesh8, jnp.asarray(a_np), k=12, p=4, q=2,
                        method="eigh", seed=5)
    u0, s0, v0 = rsvd(jnp.asarray(a_np), k=12, p=4, q=2, method="eigh",
                      seed=5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-9)
    rec = np.asarray((u * s[None, :]) @ v.T)
    rec0 = np.asarray((u0 * s0[None, :]) @ v0.T)
    np.testing.assert_allclose(rec, rec0, atol=1e-8)


def test_rsvd_ring_collective_structure(mesh8, rng):
    """Large operands move by collective-permute only; the only all-reduce
    traffic is the l x l QR Gram (and no all-gather of A-sized blocks)."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.ring import rsvd_ring

    a = shard_rows(jnp.asarray(rng.standard_normal((256, 160))), mesh8)
    # qr_method='cholqr2': the 'robust' default compiles a Householder
    # fallback branch (gather-based geqrf) into lax.cond — present in the
    # HLO text even though it only executes on degradation
    text = _compiled_text(
        lambda x: rsvd_ring(mesh8, x, k=12, p=4, q=1, method="eigh",
                            qr_method="cholqr2"), a)
    assert "collective-permute" in text
    assert "all-gather" not in text


def test_rsvd_sharded_ragged_rows(mesh8, rng):
    """rsvd_sharded pads non-dividing row counts automatically (the
    reference's rows_per_proc/rows_remainder idiom, src/PM.cpp:31-35,
    made transparent) and crops the zero factor rows back."""
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        rsvd,
        rsvd_sharded,
    )

    a_np = rng.standard_normal((131, 96))  # 131 % 8 != 0
    u, s, v = rsvd_sharded(jnp.asarray(a_np), mesh8, k=8, p=8, q=2,
                           method="eigh", seed=3)
    assert u.shape == (131, 8) and s.shape == (8,) and v.shape == (96, 8)
    # identical to the unsharded run: generate_omega is shard-invariant
    # and the zero padding is exact
    u0, s0, v0 = rsvd(jnp.asarray(a_np), k=8, p=8, q=2, method="eigh",
                      seed=3)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s0), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u0), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v0), atol=1e-8)
    # reconstruction contract on the ragged shape
    err = np.linalg.norm(
        a_np - np.asarray(u) * np.asarray(s) @ np.asarray(v).T)
    assert np.isfinite(err)
