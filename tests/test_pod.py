"""POD algorithm tests (reference POD.cpp: naive/standard/energy/weight +
svd_type dispatch + energy-criterion truncation) and the full
FOM -> POD -> ROM pipeline (reference Diff1D.cpp), checked against the
published error-decay behavior (BASELINE.md: POD test02 errors fall from
~0.34 at rom_size=2 to ~5e-3 at rom_size=10)."""

import numpy as np
import pytest
from dataclasses import replace

import jax.numpy as jnp

from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff, pod as podlib, rom
from rsvd_kamaneh_raganato_terrana_tpu.core.config import AdvDiffConfig, PodConfig


@pytest.fixture(scope="module")
def snapshots(rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    # synthetic snapshot matrix with fast spectral decay
    nh, ns, r = 80, 40, 12
    u, _ = np.linalg.qr(rng.standard_normal((nh, r)))
    v, _ = np.linalg.qr(rng.standard_normal((ns, r)))
    s = np.logspace(2, -6, r)
    return u * s @ v.T


def test_naive_pod(snapshots):
    p = podlib.naive_pod(jnp.asarray(snapshots), rank=10, svd_type=1)
    s_np = np.linalg.svd(snapshots, compute_uv=False)
    np.testing.assert_allclose(np.asarray(p.sigma), s_np[:10], rtol=1e-6)


def test_standard_pod_matches_svd(snapshots):
    p = podlib.standard_pod(jnp.asarray(snapshots), rank=10, tol=1e-12)
    s_np = np.linalg.svd(snapshots, compute_uv=False)
    # sigma from sqrt(eig(S^T S)): small sigmas lose half the digits
    # (squared condition number), so compare with an absolute floor.
    np.testing.assert_allclose(np.asarray(p.sigma), s_np[:10], rtol=1e-5,
                               atol=1e-7 * s_np[0])
    # modes orthonormal — for the significant modes; trailing modes
    # (sigma ~ sqrt(eps) * sigma_0) inherently lose orthogonality in the
    # classical C = S^T S method (same as the reference's eigenproblem
    # route, POD.cpp:153-175)
    # mode i's orthogonality error grows like eps * (sigma_0/sigma_i)^2,
    # so restrict the check to sigma_i > 1e-4 sigma_0 (error < ~1e-8).
    sig = np.asarray(p.sigma)
    keep = sig > 1e-4 * sig[0]
    w = np.asarray(p.modes)[:, keep]
    np.testing.assert_allclose(w.T @ w, np.eye(w.shape[1]), atol=1e-6)


def test_standard_pod_wide_branch(rng):
    """ns > Nh branch: K = S S^T path (POD.cpp:177-196)."""
    s = rng.standard_normal((20, 50))
    p = podlib.standard_pod(jnp.asarray(s), rank=8, tol=1e-12)
    s_np = np.linalg.svd(s, compute_uv=False)
    np.testing.assert_allclose(np.asarray(p.sigma), s_np[:8], rtol=1e-6)


def test_energy_truncation_criterion(snapshots):
    # sigma ~ logspace(2,-6,12): retained energy hits 1 - tol^2 quickly
    p = podlib.standard_pod(jnp.asarray(snapshots), rank=12, tol=1e-3)
    # tol=1e-3: need 1 - 1e-6 of energy; sigma decays 10^(-8/11) per mode
    assert 1 <= p.rank <= 8
    p_strict = podlib.standard_pod(jnp.asarray(snapshots), rank=12, tol=1e-12)
    assert p_strict.rank >= p.rank


def test_energy_pod_identity_matches_standard(snapshots):
    xh = np.eye(snapshots.shape[0])
    pe = podlib.energy_pod(jnp.asarray(snapshots), xh, rank=8, tol=1e-12)
    ps = podlib.standard_pod(jnp.asarray(snapshots), rank=8, tol=1e-12)
    np.testing.assert_allclose(np.asarray(pe.sigma), np.asarray(ps.sigma),
                               rtol=1e-5)


def test_energy_pod_xh_orthonormal(snapshots):
    """Energy modes are X_h-orthonormal: W^T X_h W = I."""
    nh = snapshots.shape[0]
    xh = (np.diag(np.full(nh, 2.0)) + np.diag(np.full(nh - 1, -1.0), 1)
          + np.diag(np.full(nh - 1, -1.0), -1))
    p = podlib.energy_pod(jnp.asarray(snapshots), xh, rank=6, tol=1e-12)
    w = np.asarray(p.modes)[:, : p.rank]
    gram = w.T @ xh @ w
    np.testing.assert_allclose(gram, np.eye(p.rank), atol=1e-5)


def test_energy_pod_wide_branch(rng):
    nh, ns = 16, 30
    xh = np.eye(nh) * 2.0
    s = rng.standard_normal((nh, ns))
    p = podlib.energy_pod(jnp.asarray(s), xh, rank=6, tol=1e-12)
    w = np.asarray(p.modes)[:, : p.rank]
    np.testing.assert_allclose(w.T @ xh @ w, np.eye(p.rank), atol=1e-6)


def test_weight_pod(snapshots):
    nh, ns = snapshots.shape
    xh = np.eye(nh)
    d = np.full(ns, 0.1)
    p = podlib.weight_pod(jnp.asarray(snapshots), xh, d, rank=6, tol=1e-12)
    # D = 0.1 I scales singular values by sqrt(0.1)
    s_np = np.linalg.svd(snapshots, compute_uv=False)
    np.testing.assert_allclose(np.asarray(p.sigma), np.sqrt(0.1) * s_np[:6],
                               rtol=1e-5)


def test_incremental_pod_matches_batch(snapshots):
    """Streaming POD over column batches tracks the batch POD spectrum."""
    batches = [snapshots[:, i : i + 10] for i in range(0, 40, 10)]
    p = podlib.incremental_pod(batches, rank=10)
    s_np = np.linalg.svd(snapshots, compute_uv=False)
    np.testing.assert_allclose(np.asarray(p.sigma)[:8], s_np[:8], rtol=1e-6)
    w = np.asarray(p.W)
    assert w.shape[1] <= 10


@pytest.mark.parametrize("svd_type", [0, 1, 2, 4])
def test_perform_svd_dispatch(svd_type, snapshots):
    u, s, v = podlib.perform_svd(jnp.asarray(snapshots), svd_type, rank=6)
    s_np = np.linalg.svd(snapshots, compute_uv=False)
    got = np.asarray(s)[:6]
    np.testing.assert_allclose(got, s_np[:6], rtol=1e-4)


def test_full_pipeline_error_decay():
    """Miniature Diff1D.cpp run: errors must decay with rom_size the way the
    published test02 series does (0.34 -> 5e-3 over rom 2..10)."""
    adv = AdvDiffConfig(beta=0.2, u0_choice=0, amplitude=1.0, N=59,
                        T=0.05, deltat=1e-3, theta=1.0, sample_every=5)
    pcfg = PodConfig(n=3, mu_min=0.01, mu_max=0.05, rank=15, tol=1e-12,
                     pod_type=1, svd_type=1, rom_sizes=[2, 4, 8])
    res = rom.run_pod_pipeline(pcfg, adv)
    mean_err = {rs: np.mean(res.errors[rs]) for rs in pcfg.rom_sizes}
    assert mean_err[8] < mean_err[2]
    assert mean_err[8] < 1e-4  # smooth 1-param family: fast POD decay
    # singular values decay steeply (BASELINE: 7 decades in 18 modes)
    sig = np.asarray(res.pod.sigma)
    assert sig[0] / max(sig[min(10, len(sig) - 1)], 1e-300) > 1e4


def test_pipeline_exports(tmp_path):
    adv = AdvDiffConfig(beta=0.2, u0_choice=0, amplitude=1.0, N=39,
                        T=0.02, deltat=1e-3, theta=1.0, sample_every=2)
    pcfg = PodConfig(n=2, mu_min=0.01, mu_max=0.05, rank=8, tol=1e-12,
                     pod_type=2, svd_type=1, rom_sizes=[2, 4])
    out = str(tmp_path / "results")
    rom.run_pod_pipeline(pcfg, adv, out_dir=out)
    import os
    for f in ("full.mtx", "reconstruction.mtx", "errors.mtx", "sigma.txt"):
        assert os.path.exists(os.path.join(out, f)), f


def test_new_param_study(tmp_path):
    adv = AdvDiffConfig(beta=0.2, u0_choice=0, amplitude=1.0, N=39,
                        T=0.02, deltat=1e-3, theta=1.0, sample_every=2)
    pcfg = PodConfig(n=3, mu_min=0.01, mu_max=0.05, mu_new=0.03, rank=8,
                     tol=1e-12, pod_type=1, svd_type=1, rom_sizes=[2, 4])
    rows = rom.run_new_param_study(pcfg, adv,
                                   out_csv=str(tmp_path / "t.csv"))
    assert len(rows) == 2
    assert rows[1]["err"] < rows[0]["err"] * 2  # more modes: no blow-up
    assert rows[1]["err"] < 0.1
    assert (tmp_path / "t.csv").exists()


def test_reference_config_files_parse():
    from rsvd_kamaneh_raganato_terrana_tpu.core.config import (
        parse_pod_config,
        parse_prm_config,
    )

    pcfg = parse_pod_config(
        "/root/reference/POD/ParametricDiffusion1D/input/test_pod_02.txt"
    )
    assert pcfg.n == 5 and pcfg.mu_new == 0.0025 and pcfg.pod_type == 2
    assert tuple(pcfg.rom_sizes) == (2, 4, 6, 8, 10, 20)
    acfg = parse_prm_config(
        "/root/reference/POD/ParametricDiffusion1D/input/test_advdiff_00.prm"
    )
    assert acfg.N == 119 and acfg.deltat == 1e-3 and acfg.theta == 1.0
    assert acfg.beta == 0.2 and acfg.sample_every == 1
