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


def test_tensor_factor_roundtrips(tmp_path, rng):
    from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
        load_tensor_factors,
        save_tensor_factors,
    )

    core = rng.standard_normal((3, 4, 2))
    factors = [rng.standard_normal((10, 3)), rng.standard_normal((8, 4)),
               rng.standard_normal((6, 2))]
    p = str(tmp_path / "tuck")
    save_tensor_factors(p, "tucker", core=core, factors=factors,
                        meta={"tol": 1e-3})
    out = load_tensor_factors(p)
    assert out["kind"] == "tucker" and out["meta"] == {"tol": 1e-3}
    np.testing.assert_array_equal(out["core"], core)
    for a, b in zip(out["factors"], factors):
        np.testing.assert_array_equal(a, b)

    cores = [rng.standard_normal((1, 5, 2)), rng.standard_normal((2, 4, 1))]
    p = str(tmp_path / "tt.npz")
    save_tensor_factors(p, "tt", cores=cores)
    out = load_tensor_factors(p)
    assert out["kind"] == "tt"
    for a, b in zip(out["cores"], cores):
        np.testing.assert_array_equal(a, b)

    w = np.array([2.0, 1.0])
    p = str(tmp_path / "cp")
    save_tensor_factors(p, "cp", weights=w, factors=factors[:2])
    out = load_tensor_factors(p)
    np.testing.assert_array_equal(out["weights"], w)


def test_tensor_factor_validation(tmp_path):
    import pytest

    from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
        save_tensor_factors,
    )

    with pytest.raises(ValueError):
        save_tensor_factors(str(tmp_path / "x"), "magic", cores=[])
    with pytest.raises(ValueError):
        save_tensor_factors(str(tmp_path / "x"), "tt")


class TestModelCheckpoint:
    def test_deim_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
            load_model,
            save_model,
        )
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.deim import (
            Deim,
            deim_fit,
            deim_interpolate,
        )

        rng = np.random.default_rng(0)
        snaps = jnp.asarray(rng.standard_normal((60, 12)))
        d = deim_fit(snaps, m=5)
        p = str(tmp_path / "deim")
        save_model(p, d, meta={"m": 5})
        d2, meta = load_model(p)
        assert isinstance(d2, Deim) and meta == {"m": 5}
        f = snaps[:, 0]
        np.testing.assert_allclose(np.asarray(deim_interpolate(d2, f)),
                                   np.asarray(deim_interpolate(d, f)),
                                   atol=1e-12)

    def test_hodlr_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        import numpy as np

        from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
            load_model,
            save_model,
        )
        from rsvd_kamaneh_raganato_terrana_tpu.rsvd.hodlr import (
            HodlrMatrix,
            hodlr_build,
            hodlr_matvec,
        )

        x = np.linspace(0, 1, 128)
        a = np.exp(-((x[:, None] - x[None, :]) ** 2) / 0.02) + 0.1 * np.eye(128)
        h = hodlr_build(jnp.asarray(a), levels=2, k=8)
        p = str(tmp_path / "hodlr.npz")
        save_model(p, h)
        h2, _ = load_model(p)
        assert isinstance(h2, HodlrMatrix)
        assert h2.n == 128 and h2.k == 8
        v = np.random.default_rng(1).standard_normal(128)
        np.testing.assert_allclose(
            np.asarray(hodlr_matvec(h2, jnp.asarray(v))),
            np.asarray(hodlr_matvec(h, jnp.asarray(v))), atol=1e-10)

    def test_rejects_non_namedtuple(self, tmp_path):
        import pytest

        from rsvd_kamaneh_raganato_terrana_tpu.core.checkpoint import (
            save_model,
        )

        with pytest.raises(TypeError):
            save_model(str(tmp_path / "x"), {"not": "a namedtuple"})
