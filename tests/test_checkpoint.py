"""Factor checkpointing + profiling utilities (reference persistence:
MatrixMarket exports, tests/rSVD_test.cpp:113-115; chrono timing prints)."""

import os

import numpy as np

from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
    export_matrix_market,
    load_factors,
    save_factors,
)
from rsvd_kamaneh_raganato_terrana_tpu.core.io import read_matrix_market
from rsvd_kamaneh_raganato_terrana_tpu.core.profiling import (
    PhaseTimer,
    matmul_gflops,
    rsvd_flops,
    timeit,
)


def test_factor_roundtrip(tmp_path, rng):
    u = rng.standard_normal((20, 5))
    s = rng.random(5)
    v = rng.standard_normal((15, 5))
    path = str(tmp_path / "ck.npz")
    save_factors(path, u, s, v, meta={"k": 5, "source": "test"})
    u2, s2, v2, meta = load_factors(path)
    np.testing.assert_array_equal(u, u2)
    np.testing.assert_array_equal(s, s2)
    np.testing.assert_array_equal(v, v2)
    assert meta == {"k": 5, "source": "test"}


def test_export_matrix_market_layout(tmp_path, rng):
    u = rng.standard_normal((10, 3))
    s = rng.random(3)
    v = rng.standard_normal((8, 3))
    export_matrix_market(str(tmp_path), "case", u, s, v)
    for suffix, ref in (("U", u), ("S", s[:, None]), ("V", v)):
        back = read_matrix_market(str(tmp_path / f"case_{suffix}.mtx"))
        np.testing.assert_allclose(back, ref, atol=1e-15)


def test_orbax_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
        load_factors_orbax,
        save_factors_orbax,
    )

    u = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))
    s = jnp.asarray(rng.random(4).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((12, 4)).astype(np.float32))
    path = str(tmp_path / "ck")
    save_factors_orbax(path, u, s, v, meta={"k": 4})
    u2, s2, v2, meta = load_factors_orbax(path)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u2))
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v2))
    assert meta == {"k": 4}


def test_phase_timer_csv(tmp_path):
    pt = PhaseTimer()
    with pt.phase("alpha"):
        pass
    with pt.phase("alpha"):
        pass
    with pt.phase("beta"):
        pass
    assert pt.total_ms("alpha") >= 0
    assert pt.avg_us("beta") >= 0
    out = tmp_path / "t.csv"
    pt.write_csv(str(out), extra_rows=[{"rank": 4, "err": 0.1}])
    text = out.read_text()
    assert "alpha" in text and "rank" in text


def test_flop_counters():
    assert matmul_gflops(100, 100, 100, 1.0) == 2e-3
    # rsvd flops scale linearly in l for fixed q
    assert rsvd_flops(1000, 1000, 64, 2) < rsvd_flops(1000, 1000, 128, 2)


def test_timeit_returns_result():
    import jax.numpy as jnp

    secs, out = timeit(lambda: jnp.ones(4).sum(), iters=2, warmup=1)
    assert secs >= 0 and float(out) == 4.0
