"""CLI entry-point tests (reference mains: image main.cpp, PCA main.cpp,
Diff1D drivers) — invoked in-process with tiny inputs."""

import os

import numpy as np
import pytest

from conftest import DATA_DIR


def test_pca_main(tmp_path, capsys):
    from rsvd_kamaneh_raganato_terrana_tpu.apps.pca_main import main

    out = str(tmp_path / "res.txt")
    main([os.path.join(DATA_DIR, "pca", "dataset_athletic.txt"), "yes",
          "--save", out])
    text = capsys.readouterr().out
    assert "Importance of components" in text
    assert os.path.exists(out)


def test_image_main(tmp_path, capsys):
    from PIL import Image as PILImage

    from rsvd_kamaneh_raganato_terrana_tpu.apps.image_main import main

    rng = np.random.default_rng(0)
    low = rng.standard_normal((64, 4)) @ rng.standard_normal((4, 64))
    low = ((low - low.min()) / (low.max() - low.min()) * 255).astype(np.uint8)
    src = str(tmp_path / "src.png")
    PILImage.fromarray(low, mode="L").save(src)

    main([src, "--k", "6", "--grid", "2x2", "--downscale", "1",
          "--out-dir", str(tmp_path)])
    text = capsys.readouterr().out
    assert "compression ratio" in text
    assert os.path.exists(str(tmp_path / "src_compressed.png"))
    assert os.path.exists(str(tmp_path / "src_factors.rsv"))


def test_rsvd_main(tmp_path, capsys):
    """The reference root-test workflow (tests/rSVD_test.cpp:15-118):
    factorize a .mtx, print the reconstruction norm, export factors."""
    from rsvd_kamaneh_raganato_terrana_tpu.apps.rsvd_main import main
    from rsvd_kamaneh_raganato_terrana_tpu.core.io import (
        read_matrix_market,
        write_matrix_market,
    )

    rng = np.random.default_rng(0)
    a = rng.standard_normal((40, 8)) @ rng.standard_normal((8, 30))
    src = str(tmp_path / "a.mtx")
    write_matrix_market(src, a)

    save = str(tmp_path / "out")
    rc = main([src, "--k", "8", "--p", "8", "--method", "eigh",
               "--save-dir", save])
    assert rc == 0
    text = capsys.readouterr().out
    assert "||A-USV^T||" in text
    # exact on rank-8 input: printed norm ~ 0
    import re

    err = float(re.search(r"\|\| = ([0-9.e+-]+)", text).group(1))
    assert err < 1e-8
    u = read_matrix_market(os.path.join(save, "a_U.mtx"))
    s = read_matrix_market(os.path.join(save, "a_S.mtx"))
    v = read_matrix_market(os.path.join(save, "a_V.mtx"))
    recon = u @ np.diag(s[:, 0]) @ v.T
    assert np.linalg.norm(recon - a) < 1e-8


def _write_pod_inputs(tmp_path):
    pod = tmp_path / "pod.txt"
    pod.write_text(
        "dim 1\nn 2\nmu_min 0.01\nmu_max 0.05\nmu_new 0.03\nrank 8\n"
        "tol 1e-12\npod_type 1\nsvd_type 1\nrom_sizes 2 4\n"
    )
    prm = tmp_path / "adv.prm"
    prm.write_text(
        "set beta = 0.2\nset u0_choice = 0\nset amplitude = 1.0\n"
        "set N = 39\nset degree = 1\nset T = 0.02\nset deltat = 1e-3\n"
        "set theta = 1.0\nset sample_every = 2\n"
    )
    return str(pod), str(prm)


def test_pod_main_standard(tmp_path, capsys):
    from rsvd_kamaneh_raganato_terrana_tpu.apps.pod_main import main

    pod, prm = _write_pod_inputs(tmp_path)
    main([pod, prm, "--out-dir", str(tmp_path / "out")])
    text = capsys.readouterr().out
    assert "rom_size" in text and "exports" in text
    assert os.path.exists(str(tmp_path / "out" / "sigma.txt"))


def test_pod_main_new_param(tmp_path, capsys):
    from rsvd_kamaneh_raganato_terrana_tpu.apps.pod_main import main

    pod, prm = _write_pod_inputs(tmp_path)
    main([pod, prm, "--mode", "new-param", "--out-dir", str(tmp_path / "o")])
    text = capsys.readouterr().out
    assert "err" in text
    assert os.path.exists(str(tmp_path / "o" / "time_new_param.csv"))


def test_pod_main_convergence(tmp_path, capsys):
    from rsvd_kamaneh_raganato_terrana_tpu.apps.pod_main import main

    pod, prm = _write_pod_inputs(tmp_path)
    main([pod, prm, "--mode", "convergence", "--deltats", "4e-3,2e-3",
          "--out-dir", str(tmp_path / "c")])
    text = capsys.readouterr().out
    assert "observed temporal orders" in text
    assert os.path.exists(str(tmp_path / "c" / "convergence.csv"))


def test_dispatcher_unknown_app(capsys):
    import sys

    from rsvd_kamaneh_raganato_terrana_tpu.__main__ import main

    old = sys.argv
    try:
        sys.argv = ["prog", "nope"]
        rc = main()
    finally:
        sys.argv = old
    assert rc == 1
    assert "unknown app" in capsys.readouterr().out


@pytest.mark.slow
def test_plot_pod_and_pca(tmp_path):
    """Plot scripts produce PNGs from pipeline exports (reference
    scripts/plot_*.py role)."""
    import subprocess
    import sys

    from rsvd_kamaneh_raganato_terrana_tpu.apps.pod_main import main as pod_main
    from rsvd_kamaneh_raganato_terrana_tpu.apps.pca_main import main as pca_main

    pod, prm = _write_pod_inputs(tmp_path)
    out = str(tmp_path / "out")
    pod_main([pod, prm, "--out-dir", out])
    pca_res = str(tmp_path / "pca.txt")
    pca_main([os.path.join(DATA_DIR, "pca", "dataset_athletic.txt"), "yes",
              "--save", pca_res])

    import tools.plot_pod as plot_pod
    import tools.plot_pca as plot_pca

    plot_pod.plot_solution(out)
    plot_pod.plot_sigma(out)
    assert os.path.exists(os.path.join(out, "solution.png"))
    assert os.path.exists(os.path.join(out, "sigma.png"))

    import sys as _s

    old = _s.argv
    try:
        _s.argv = ["plot_pca", pca_res, "--out", str(tmp_path / "pca.png")]
        plot_pca.main()
    finally:
        _s.argv = old
    assert os.path.exists(str(tmp_path / "pca.png"))


@pytest.mark.slow
def test_bench_json_contract():
    """bench.py must print ONE JSON line with the driver-contract keys
    plus the round-3 dual record {ondevice_ms, chain_ms} (value =
    ondevice_ms, the fori_loop ground truth)."""
    import json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({"PYTHONPATH": repo, "JAX_PLATFORMS": "cpu",
                "BENCH_M": "256", "BENCH_N": "256", "BENCH_K": "8"})
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [l for l in out.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    for key in ("metric", "value", "unit", "vs_baseline", "ondevice_ms",
                "chain_ms", "gflops", "err_ratio_vs_numpy"):
        assert key in rec, key
    assert rec["unit"] == "ms"
    assert rec["value"] == rec["ondevice_ms"]
    assert rec["err_ratio_vs_numpy"] < 1.5
