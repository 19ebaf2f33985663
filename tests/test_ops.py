"""Sharded primitive gallery tests — the TPU counterpart of the reference's
MPI micro-benchmark self-checks (image_compression/mpi/*.cpp, each verified
against Eigen).  Here each collective contract is verified against plain
NumPy on an 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvd_kamaneh_raganato_terrana_tpu.core import mesh as meshlib
from rsvd_kamaneh_raganato_terrana_tpu.ops import primitives as ops


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_matvec_sharded(mesh8, rng):
    a = rng.standard_normal((64, 40))
    x = rng.standard_normal(40)
    y = ops.matvec_sharded(mesh8, jnp.asarray(a), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), a @ x, rtol=1e-12, atol=1e-12)


def test_matmul_sharded(mesh8, rng):
    a = rng.standard_normal((64, 32))
    b = rng.standard_normal((32, 24))
    c = ops.matmul_sharded(mesh8, jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(c), a @ b, rtol=1e-12, atol=1e-12)


def test_norm_sharded(mesh8, rng):
    a = rng.standard_normal((64, 40))
    n = ops.norm_sharded(mesh8, jnp.asarray(a))
    np.testing.assert_allclose(float(n), np.linalg.norm(a), rtol=1e-12)


def test_normalize_sharded(mesh8, rng):
    x = rng.standard_normal(64)
    y = ops.normalize_sharded(mesh8, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), x / np.linalg.norm(x), rtol=1e-12)


def test_transpose_sharded(mesh8, rng):
    a = rng.standard_normal((64, 64))
    at = ops.transpose_sharded(mesh8, jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(at), a.T, rtol=1e-15)


def test_gram_sharded(mesh8, rng):
    a = rng.standard_normal((64, 24))
    g = ops.gram_sharded(mesh8, jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g), a.T @ a, rtol=1e-11)


def test_matmul_reduce_scatter(mesh8, rng):
    """Col-sharded A x row-sharded B with a reduce-scattered sum — the
    contraction-dimension-sharded GEMM (SURVEY section 2.7 mapping)."""
    a = rng.standard_normal((64, 32))
    b = rng.standard_normal((32, 24))
    a_cols = jax.device_put(
        jnp.asarray(a), jax.sharding.NamedSharding(
            mesh8, jax.sharding.PartitionSpec(None, "rows"))
    )
    b_rows = meshlib.shard_rows(jnp.asarray(b), mesh8)
    c = ops.matmul_reduce_scatter(mesh8, a_cols, b_rows)
    np.testing.assert_allclose(np.asarray(c), a @ b, rtol=1e-11, atol=1e-12)


def test_ring_shift_rows(mesh8, rng):
    a = rng.standard_normal((64, 8))  # 8 rows per device
    a_sh = meshlib.shard_rows(jnp.asarray(a), mesh8)
    shifted = ops.ring_shift_rows(mesh8, a_sh, shift=1)
    # shard i's rows move to device i+1: global rows rotate by one block
    expect = np.roll(a.reshape(8, 8, 8), 1, axis=0).reshape(64, 8)
    np.testing.assert_array_equal(np.asarray(shifted), expect)
    # full ring = identity
    back = a_sh
    for _ in range(8):
        back = ops.ring_shift_rows(mesh8, back, shift=1)
    np.testing.assert_array_equal(np.asarray(back), a)


def test_gaussian_sharded_matches_unsharded(mesh8):
    """Shard-count invariance: the property the reference's per-rank RNG
    (mt19937(rd()+rank), src/rSVD.cpp:28) did NOT have."""
    key = jax.random.PRNGKey(7)
    sharded = ops.generate_gaussian_sharded(mesh8, key, (64, 16), jnp.float64)
    local = jax.random.normal(key, (64, 16), jnp.float64)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(local))


def test_implicit_sharded_matmul_matches(mesh8, rng):
    """Preferred style: NamedSharding inputs + plain jnp under jit — XLA
    inserts the collectives."""
    a = rng.standard_normal((64, 48))
    b = rng.standard_normal((48, 8))
    a_sh = meshlib.shard_rows(jnp.asarray(a), mesh8)
    c = jax.jit(ops.matmul)(a_sh, jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(c), a @ b, rtol=1e-12, atol=1e-12)


def test_uneven_rows_sharding(mesh8, rng):
    """Remainder handling: 67 rows over 8 devices (the reference's
    rows_per_proc/rows_remainder idiom, PM.cpp:31-35).  JAX requires the
    sharded dim to divide the device count, so the contract here is
    explicit zero-padding — mathematically transparent for Gram/matmul
    reductions — via pad_rows_for_mesh."""
    a = rng.standard_normal((67, 16))
    a_pad, n_orig = meshlib.pad_rows_for_mesh(jnp.asarray(a), mesh8)
    assert n_orig == 67 and a_pad.shape[0] % 8 == 0
    a_sh = meshlib.shard_rows(a_pad, mesh8)
    g = jax.jit(ops.gram)(a_sh)
    np.testing.assert_allclose(np.asarray(g), a.T @ a, rtol=1e-11, atol=1e-12)
    # and a clear error for direct uneven sharding
    import pytest

    with pytest.raises(ValueError):
        meshlib.shard_rows(jnp.asarray(a), mesh8)


def test_sketch_ring_pipelined_matches_dense(mesh8, rng):
    """Ring-rotated Omega sketch == plain A @ Omega, and the compiled
    program moves Omega with collective-permute (not all-gather)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import (
        sketch_ring_pipelined,
    )

    m, n, l = 64, 80, 12
    a = rng.standard_normal((m, n))
    omega = rng.standard_normal((n, l))
    a_sh = jax.device_put(jnp.asarray(a),
                          NamedSharding(mesh8, P("rows", None)))
    om_sh = jax.device_put(jnp.asarray(omega),
                           NamedSharding(mesh8, P("rows", None)))
    y = sketch_ring_pipelined(mesh8, a_sh, om_sh)
    np.testing.assert_allclose(np.asarray(y), a @ omega, rtol=1e-10,
                               atol=1e-10)

    hlo = (
        jax.jit(lambda x, o: sketch_ring_pipelined(mesh8, x, o))
        .lower(a_sh, om_sh).compile().as_text()
    )
    assert "collective-permute" in hlo
    assert "all-gather" not in hlo


def test_power_zt_ring_matches_dense(mesh8, rng):
    """Ring reduce-scatter Z = A^T Q == plain dense product, comes back
    row-sharded, and compiles to collective-permute only (no all-reduce /
    reduce-scatter bulk collective)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rsvd_kamaneh_raganato_terrana_tpu.ops.primitives import (
        power_zt_ring,
    )

    m, n, l = 64, 80, 12
    a = rng.standard_normal((m, n))
    q = rng.standard_normal((m, l))
    a_sh = jax.device_put(jnp.asarray(a),
                          NamedSharding(mesh8, P("rows", None)))
    q_sh = jax.device_put(jnp.asarray(q),
                          NamedSharding(mesh8, P("rows", None)))
    z = power_zt_ring(mesh8, a_sh, q_sh)
    assert z.shape == (n, l)
    np.testing.assert_allclose(np.asarray(z), a.T @ q, rtol=1e-10,
                               atol=1e-10)
    # output stays row-sharded for the next ring sketch pass
    assert z.sharding.spec == P("rows", None)

    hlo = (
        jax.jit(lambda x, qq: power_zt_ring(mesh8, x, qq))
        .lower(a_sh, q_sh).compile().as_text()
    )
    assert "collective-permute" in hlo
    assert "all-reduce" not in hlo
    assert "reduce-scatter" not in hlo
    assert "all-gather" not in hlo
