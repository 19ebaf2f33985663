"""rsvd_serving — the packaged round-5 serving stack (rsvd/serving.py):
pre-quantized int8 reads, rowspace_utv + cholqr1, factor-health gate."""

import numpy as np
import pytest

import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
    prepare_operand,
    reconstruction_error,
    rsvd,
    rsvd_serving,
)


def _decaying(m, n, lo=1e-2, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.standard_normal((m, min(m, n))))
    v, _ = np.linalg.qr(rng.standard_normal((n, min(m, n))))
    s = np.geomspace(1.0, lo, min(m, n))
    return ((u * s) @ v.T).astype(np.float32)


def test_healthy_serving_run_matches_reference_quality():
    a = jnp.asarray(_decaying(220, 160))
    k = 12
    u, s, v, health = rsvd_serving(a, k=k)
    assert health is not None and health["ok"]
    e = float(reconstruction_error(a, u, s, v))
    uf, sf, vf = rsvd(a, k=k, p=16, q=2, method="eigh")
    ef = float(reconstruction_error(a, uf, sf, vf))
    assert e < 1.1 * ef + 1e-6


def test_prepared_operand_reused_bitwise():
    a = jnp.asarray(_decaying(180, 140, seed=1))
    st = prepare_operand(a)
    u1, s1, v1, _ = rsvd_serving(st, k=10)
    u2, s2, v2, _ = rsvd_serving(st, k=10)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))
    # and the prepared operand path equals the quantize-inside path
    u3, s3, v3, _ = rsvd_serving(a, k=10)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s3))


def test_unhealthy_raises_with_guidance():
    rng = np.random.default_rng(2)
    a_np = rng.standard_normal((120, 80)).astype(np.float32)
    a_np[:, 40:] = a_np[:, :40]          # rank 40 < k + p
    with pytest.raises(FloatingPointError, match="qr_method='robust'"):
        rsvd_serving(jnp.asarray(a_np), k=40, p=8)


def test_unhealthy_warn_and_ignore_modes():
    rng = np.random.default_rng(3)
    a_np = rng.standard_normal((120, 80)).astype(np.float32)
    a_np[:, 40:] = a_np[:, :40]
    a = jnp.asarray(a_np)
    with pytest.warns(UserWarning):
        u, s, v, health = rsvd_serving(a, k=40, p=8,
                                       on_unhealthy="warn")
    assert health is not None and not health["ok"]
    u, s, v, health = rsvd_serving(a, k=40, p=8, on_unhealthy="ignore")
    assert health is None


def test_storage_modes():
    a = jnp.asarray(_decaying(200, 150, seed=4))
    outs = {}
    for storage in ("int8", "bf16", "default"):
        u, s, v, h = rsvd_serving(a, k=10, storage=storage)
        assert h["ok"], storage
        outs[storage] = float(reconstruction_error(a, u, s, v))
    # all three land at the truncation floor of this spectrum
    base = outs["default"]
    for storage, e in outs.items():
        assert e < 1.1 * base + 1e-6, (storage, outs)
