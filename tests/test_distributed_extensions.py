"""Sharded-vs-replicated parity for the beyond-parity modules: the
estimators, tensor formats, and solvers are built from the driver's
GEMM/sketch primitives, so a row-sharded input must give the SAME result
as a replicated one (XLA partitions the GEMMs with collectives) — the
contract that makes them multi-chip-correct by construction."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.mesh import shard_rows


def test_hutchinson_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.trace import hutchinson

    a_np = rng.standard_normal((256, 256))
    a_np = (a_np + a_np.T) / 2
    e1, s1 = hutchinson(jnp.asarray(a_np), seed=0, num_samples=32)
    e8, s8 = hutchinson(shard_rows(jnp.asarray(a_np), mesh8), seed=0,
                        num_samples=32)
    np.testing.assert_allclose(float(e1), float(e8), rtol=1e-9)
    np.testing.assert_allclose(float(s1), float(s8), rtol=1e-9)


def test_hutchpp_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.trace import hutchpp

    b = rng.standard_normal((256, 16))
    a_np = b @ b.T
    e1 = hutchpp(jnp.asarray(a_np), seed=0, budget=48)
    e8 = hutchpp(shard_rows(jnp.asarray(a_np), mesh8), seed=0, budget=48)
    np.testing.assert_allclose(float(e1), float(e8), rtol=1e-8)


def test_slq_logdet_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.slq import logdet_psd

    q, _ = np.linalg.qr(rng.standard_normal((128, 128)))
    a_np = (q * np.linspace(1.0, 2.0, 128)[None, :]) @ q.T
    e1 = logdet_psd(jnp.asarray(a_np), seed=0, num_probes=4, steps=12)
    e8 = logdet_psd(shard_rows(jnp.asarray(a_np), mesh8), seed=0,
                    num_probes=4, steps=12)
    np.testing.assert_allclose(float(e1), float(e8), rtol=1e-7)


def test_sketch_lstsq_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.lstsq import sketch_lstsq

    a_np = rng.standard_normal((512, 24))
    b_np = rng.standard_normal(512)
    # b stays replicated (shard_rows needs rank >= 2); mixing a sharded
    # A with a replicated rhs is the realistic deployment shape anyway
    x1 = sketch_lstsq(jnp.asarray(a_np), jnp.asarray(b_np), seed=0)
    x8 = sketch_lstsq(shard_rows(jnp.asarray(a_np), mesh8),
                      jnp.asarray(b_np), seed=0)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x8), atol=1e-8)


def test_tucker_shard_invariant_first_mode(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.tucker import tucker

    t_np = rng.standard_normal((256, 16, 12))
    core1, f1 = tucker(jnp.asarray(t_np), (4, 4, 4), seed=0)
    core8, f8 = tucker(shard_rows(jnp.asarray(t_np), mesh8), (4, 4, 4),
                       seed=0)
    np.testing.assert_allclose(np.asarray(core1), np.asarray(core8),
                               atol=1e-8)
    for a, b in zip(f1, f8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-8)


def test_rutv_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.utv import rutv

    a_np = rng.standard_normal((256, 96))
    u1, t1, v1 = rutv(jnp.asarray(a_np), k=8, p=8)
    u8, t8, v8 = rutv(shard_rows(jnp.asarray(a_np), mesh8), k=8, p=8)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t8), atol=1e-8)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u8), atol=1e-8)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v8), atol=1e-8)


def test_completion_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.completion import (
        complete_lowrank,
    )

    a_np = (rng.standard_normal((128, 64))[:, :4]
            @ rng.standard_normal((4, 64)))
    mask = rng.random((128, 64)) < 0.6
    r1 = complete_lowrank(jnp.asarray(a_np), jnp.asarray(mask), k=4,
                          iters=10)
    r8 = complete_lowrank(shard_rows(jnp.asarray(a_np), mesh8),
                          shard_rows(jnp.asarray(mask), mesh8), k=4,
                          iters=10)
    np.testing.assert_allclose(np.asarray(r1.s), np.asarray(r8.s),
                               rtol=1e-8)
    np.testing.assert_allclose(np.asarray(r1.obs_rmse),
                               np.asarray(r8.obs_rmse), rtol=1e-7)


def test_rpca_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.rpca import rpca

    low = (rng.standard_normal((128, 64))[:, :3]
           @ rng.standard_normal((3, 64)))
    sp = np.where(rng.random((128, 64)) < 0.05,
                  5.0 * rng.standard_normal((128, 64)), 0.0)
    m = jnp.asarray(low + sp)
    r1 = rpca(m, k_max=6, iters=20)
    r8 = rpca(shard_rows(m, mesh8), k_max=6, iters=20)
    np.testing.assert_allclose(np.asarray(r1.low_rank),
                               np.asarray(r8.low_rank), atol=1e-6)
    np.testing.assert_allclose(np.asarray(r1.resid), np.asarray(r8.resid),
                               atol=1e-9)


def test_deim_fit_shard_invariant(mesh8, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.deim import deim_fit

    snaps = rng.standard_normal((256, 24))
    d1 = deim_fit(jnp.asarray(snaps), m=6)
    d8 = deim_fit(shard_rows(jnp.asarray(snaps), mesh8), m=6)
    np.testing.assert_array_equal(np.asarray(d1.indices),
                                  np.asarray(d8.indices))
    np.testing.assert_allclose(np.asarray(d1.proj), np.asarray(d8.proj),
                               atol=1e-8)


def test_frequent_directions_shard_invariant_columns(mesh8, rng):
    # FD streams rows; its device state is the 2l x n buffer, so the
    # natural sharding is along n (columns) — the sketch must not change
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.fd import FrequentDirections

    a_np = rng.standard_normal((100, 256))
    fd1 = FrequentDirections(256, 16)
    fd8 = FrequentDirections(256, 16)
    fd8._buf = jax.device_put(
        fd8._buf, NamedSharding(mesh8, P(None, "rows")))
    for i in range(0, 100, 25):
        fd1.update(a_np[i:i + 25])
        fd8.update(a_np[i:i + 25])
    # sketch ROWS are eigenvector directions — sign-indeterminate across
    # layouts; the covariance estimate S^T S is the invariant quantity
    s1, s8 = np.asarray(fd1.sketch()), np.asarray(fd8.sketch())
    np.testing.assert_allclose(s1.T @ s1, s8.T @ s8,
                               atol=1e-4 * np.abs(s1.T @ s1).max())
