"""North-star q=2 production run at 100k^2 rank-128, with kill + resume.

Round 3 proved the out-of-core machinery at <= 32768^2 (real) and at toy
size (resume tests); this script proves the PRODUCTION configuration —
``rsvd_streaming(k=128, q=2, precision='default', panel_dtype='int8',
finish='rowspace', checkpoint_dir=...)`` — at the design size
(BASELINE.md north star), through a mid-run kill:

  python benchmarks/northstar_resume.py reference
      Small f32 reference run + exact-spectrum sanity.  The 100k
      operator is a vertical stack of ``tiles`` identical base blocks
      (TiledHostMatrix, streaming_bench.py): for every pipeline stage,
      the run on A = [B; B; ...; B] equals the run on B up to exact
      scalings (Y_A = stack(Y_B), G_A = tiles*G_B => Q_A =
      stack(Q_B)/sqrt(tiles), Z_A ∝ Z_B, C_A = stack(C_B)), hence
      sigma_f32(A) = sqrt(tiles) * sigma_f32(B) with identical V — an
      f32 reference at 1/tiles of the stream cost (f32 roundoff ~1e-6,
      two decades below the int8 wire floor it scores).  Cross-checked
      here against the operator's EXACT spectrum sqrt(tiles)*sigma(B)
      from a host f64 Gram eigendecomposition.

  python benchmarks/northstar_resume.py run --ckpt-dir D --tag full
      The full streamed factorization.  Resumable: re-running the same
      command after a kill resumes from the last completed pass
      (pass-level checkpoints, rsvd/streaming.py).  On completion
      appends a streaming.csv row (s_rel_vs_f32 scored against the
      reference) and snapshots sigma + device-side probe projections to
      bench_results/northstar/factors_<tag>.npz — U/V stay on device
      (D2H here is ~0.2 MB/s; a 51 MB factor fetch would take minutes
      and prove nothing the probes don't).

  python benchmarks/northstar_resume.py verify --a full --b resumed
      Assert the resumed factorization matches the uninterrupted one
      (identical programs + identical inputs => deterministic factors)
      and both match the reference spectrum.

Driven by the round-4 session as: reference -> run(tag=full) ->
run(tag=resumed) killed after round0.npy appears -> run(tag=resumed)
again -> verify.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import benchmarks.streaming_bench as _sb  # noqa: E402
from benchmarks.streaming_bench import (  # noqa: E402
    PANEL_BYTES,
    ROOFLINE_TFLOPS,
    TiledHostMatrix,
    append_row,
    log,
)

OUT_DIR = os.environ.get("NS_OUT", "bench_results/northstar")
if OUT_DIR != "bench_results/northstar":
    # smoke runs must not write toy rows into the real perf record
    _sb.CSV_PATH = os.path.join(OUT_DIR, "streaming.csv")
SIZE = int(os.environ.get("NS_SIZE", 100_000))  # override for smoke tests
K, P, Q = 128, 16, 2
PRECISION = "default"
PANEL_DTYPE = "int8"
FINISH = "rowspace"
SEED = 0  # rsvd_streaming sketch seed (default)


def make_operator():
    """EXACTLY streaming_bench.py's --real-tiled operator (seed 3,
    rank-64 signal + noise base, 2-panel tiles) so rows are comparable
    across rounds."""
    n = SIZE
    panel_mb = int(os.environ.get("NS_PANEL_MB", 256))
    panel_rows = max(1, (panel_mb << 20) // (n * 4))     # 671 at 100k
    rng0 = np.random.default_rng(3)
    br = panel_rows * 2                                   # 1342
    base = (5.0 * rng0.standard_normal((br, 64)).astype(np.float32)
            @ rng0.standard_normal((64, n)).astype(np.float32)
            + rng0.standard_normal((br, n)).astype(np.float32))
    tiles = -(-SIZE // br)                                # 75
    src = TiledHostMatrix(base, tiles * br)
    norm_sq = float((base.astype(np.float64) ** 2).sum()) * tiles
    return src, base, tiles, panel_rows, norm_sq


def _probes(u, s, v, m, n):
    """Device-side probe projections: k-sized fetches only."""
    import jax
    import jax.numpy as jnp

    rngp = np.random.default_rng(12345)
    w_m = jnp.asarray(rngp.standard_normal(m).astype(np.float32))
    w_n = jnp.asarray(rngp.standard_normal(n).astype(np.float32))

    @jax.jit
    def probe(u_, s_, v_, wm, wn):
        pu = jnp.matmul(wm[None, :], u_)[0]              # k
        pv = jnp.matmul(wn[None, :], v_)[0]              # k
        recon = jnp.sum(pu * s_ * pv)                    # w_m^T U S V^T w_n
        return pu, pv, recon

    pu, pv, recon = probe(u, s, v, w_m, w_n)
    return (np.asarray(pu, np.float64), np.asarray(pv, np.float64),
            float(recon))


def probe_exact(base, tiles, m, n):
    """w_m^T A w_n on the host in f64 (A = stack of ``tiles`` bases)."""
    rngp = np.random.default_rng(12345)
    w_m = rngp.standard_normal(m)
    w_n = rngp.standard_normal(n)
    bw = base.astype(np.float64) @ w_n                   # br
    br = base.shape[0]
    wsum = w_m.reshape(tiles, br).sum(axis=0)            # br
    return float(wsum @ bw)


def cmd_reference():
    src, base, tiles, panel_rows, norm_sq = make_operator()
    os.makedirs(OUT_DIR, exist_ok=True)

    # exact spectrum: sigma(A) = sqrt(tiles) * sigma(B), B's singular
    # values from the f64 host Gram (br x br)
    t0 = time.perf_counter()
    b64 = base.astype(np.float64)
    lam = np.linalg.eigvalsh(b64 @ b64.T)[::-1]
    s_exact = np.sqrt(tiles) * np.sqrt(np.maximum(lam, 0.0))
    log(f"exact spectrum in {time.perf_counter() - t0:.1f}s: "
        f"sigma0={s_exact[0]:.2f} sigma_k-1={s_exact[K - 1]:.2f}")

    # f32 reference: the SAME pipeline (q=2, rowspace, default precision,
    # f32 panels, same sketch seed/omega — omega depends only on (n, l))
    # on B, scaled by sqrt(tiles)
    import jax

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming,
    )

    t0 = time.perf_counter()
    u_b, s_b, v_b = rsvd_streaming(
        base, k=K, p=P, q=Q, method="eigh", panel_rows=panel_rows,
        precision=PRECISION, finish=FINISH, seed=SEED)
    jax.block_until_ready((u_b, s_b, v_b))
    s_ref = np.sqrt(tiles) * np.asarray(s_b, np.float64)
    log(f"f32 base-run reference in {time.perf_counter() - t0:.1f}s: "
        f"sigma0={s_ref[0]:.2f}")
    drift = np.max(np.abs(s_ref[:64] - s_exact[:64]) / s_exact[0])
    log(f"f32 reference vs exact spectrum (top-64, rel to sigma0): "
        f"{drift:.2e}")
    assert drift < 1e-4, "f32 reference disagrees with exact spectrum"
    np.save(os.path.join(OUT_DIR, "s_ref.npy"), s_ref)
    np.save(os.path.join(OUT_DIR, "s_exact.npy"), s_exact)
    with open(os.path.join(OUT_DIR, "reference.json"), "w") as f:
        json.dump({"tiles": tiles, "panel_rows": panel_rows,
                   "norm_sq": norm_sq, "drift_vs_exact": float(drift),
                   "recon_probe_exact": probe_exact(
                       base, tiles, tiles * base.shape[0], SIZE)}, f)
    log("reference written")


def cmd_run(ckpt_dir: str, tag: str):
    import jax

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming,
    )

    src, base, tiles, panel_rows, norm_sq = make_operator()
    m, n = src.shape
    os.makedirs(OUT_DIR, exist_ok=True)
    s_ref = None
    ref_path = os.path.join(OUT_DIR, "s_ref.npy")
    if os.path.exists(ref_path):
        s_ref = np.load(ref_path)

    # which passes were already checkpointed (for honest resume
    # accounting in the appended row)
    stages = ["q0", "round0", "zq_final", "c_final"]
    pass_cost = {"q0": 1, "round0": 2, "zq_final": 1, "c_final": 1}
    done = [st for st in stages
            if os.path.exists(os.path.join(ckpt_dir, f"{st}.npy"))]
    passes_todo = 5 - sum(pass_cost[st] for st in done)
    log(f"tag={tag} checkpointed stages: {done} -> {passes_todo} of 5 "
        f"streamed passes to run")

    phase = {}
    t0 = time.perf_counter()
    u, s, v = rsvd_streaming(
        src, k=K, p=P, q=Q, method="eigh", panel_rows=panel_rows,
        precision=PRECISION, panel_dtype=PANEL_DTYPE, finish=FINISH,
        seed=SEED, checkpoint_dir=ckpt_dir, phase_times=phase)
    jax.block_until_ready((u, s, v))
    wall = time.perf_counter() - t0
    s_host = np.asarray(s, np.float64)

    l = K + P
    wire = PANEL_BYTES[PANEL_DTYPE] + 4.0 / n
    gb = m * n * wire * passes_todo / 1e9
    gemm_s = (phase.get("sketch", 0.0) + phase.get("power_zt", 0.0)
              + phase.get("power_y", 0.0))
    gemm_flops = 2.0 * m * n * l * passes_todo
    tflops = gemm_flops / max(gemm_s, 1e-9) / 1e12
    captured = float((s_host ** 2).sum() / norm_sq)
    s_rel = ""
    if s_ref is not None:
        s_rel = round(float(np.max(np.abs(s_host - s_ref[:K])
                                   / np.maximum(s_ref[:K], 1e-30))), 8)
    row = {
        "mode": f"real-tiled-rowspace-{tag}",
        "m": m, "n": n, "k": K, "l": l, "q": Q,
        "precision": PRECISION, "panel_dtype": PANEL_DTYPE,
        "panel_rows": panel_rows,
        "wall_s": round(wall, 3),
        "transfer_gb": round(gb, 2),
        "h2d_gbps": round(gb / wall, 3),
        "sketch_s": round(phase.get("sketch", 0.0), 3),
        "power_s": round(phase.get("power_zt", 0.0)
                         + phase.get("power_y", 0.0), 3),
        "project_s": round(phase.get("project", 0.0), 3),
        "qr_s": round(phase.get("qr", 0.0), 3),
        "tail_s": round(phase.get("tail", 0.0), 3),
        "gemm_tflops": round(tflops, 2),
        "mxu_roofline_pct": round(
            100.0 * tflops / ROOFLINE_TFLOPS[PRECISION], 1),
        "hbm_gbps": "", "hbm_roofline_pct": "",
        "bound": "h2d-link",
        "captured_energy": round(captured, 6),
        "s_rel_vs_f32": s_rel,
        "sigma0": round(float(s_host[0]), 3),
    }
    log(" ".join(f"{kk}={vv}" for kk, vv in row.items()))
    append_row(row)

    pu, pv, recon = _probes(u, s, v, m, n)
    np.savez(os.path.join(OUT_DIR, f"factors_{tag}.npz"),
             s=s_host, probe_u=pu, probe_v=pv, recon=recon,
             wall_s=wall, passes_run=passes_todo,
             resumed_from=",".join(done),
             phases=json.dumps({kk: round(vv, 3)
                                for kk, vv in phase.items()}))
    log(f"factors_{tag}.npz written (recon probe {recon:.4f})")


def cmd_verify(tag_a: str, tag_b: str):
    a = np.load(os.path.join(OUT_DIR, f"factors_{tag_a}.npz"))
    b = np.load(os.path.join(OUT_DIR, f"factors_{tag_b}.npz"))
    s_ref = np.load(os.path.join(OUT_DIR, "s_ref.npy"))
    s_exact = np.load(os.path.join(OUT_DIR, "s_exact.npy"))
    with open(os.path.join(OUT_DIR, "reference.json")) as f:
        ref = json.load(f)

    ds = float(np.max(np.abs(a["s"] - b["s"]) / a["s"][0]))
    dpu = float(np.max(np.abs(a["probe_u"] - b["probe_u"])))
    dpv = float(np.max(np.abs(a["probe_v"] - b["probe_v"])))
    drec = abs(float(a["recon"]) - float(b["recon"]))
    log(f"{tag_a} vs {tag_b}: max rel d-sigma={ds:.2e} "
        f"probe dU={dpu:.2e} dV={dpv:.2e} d-recon={drec:.2e}")
    assert ds < 1e-6, f"resumed spectrum deviates: {ds}"
    assert dpu < 1e-4 and dpv < 1e-4, "resumed factors deviate"

    for tag, z in ((tag_a, a), (tag_b, b)):
        # signal block (the operator's rank-64 low-rank part): per-sigma
        # relative error must sit on the int8 wire floor.  The trailing
        # noise sigmas are reported but not gated — int8's added noise
        # perturbs noise directions relatively, not the factorization's
        # recovery of signal.
        rel_sig = float(np.max(np.abs(z["s"][:64] - s_ref[:64])
                               / s_ref[:64]))
        rel_all = float(np.max(np.abs(z["s"] - s_ref[:K]) / s_ref[:K]))
        rel_exact = float(np.max(np.abs(z["s"][:64] - s_exact[:64])
                                 / s_exact[:64]))
        rec_err = abs(float(z["recon"]) - ref["recon_probe_exact"]) / abs(
            ref["recon_probe_exact"])
        log(f"{tag}: sigma(top64) vs f32-ref {rel_sig:.2e}, vs exact "
            f"{rel_exact:.2e}, all-k vs f32-ref {rel_all:.2e}, recon "
            f"probe rel err {rec_err:.2e}, wall {float(z['wall_s']):.1f}s"
            f" passes={int(z['passes_run'])} phases={z['phases']}")
        assert rel_sig < 5e-3, f"{tag} spectrum off the int8 floor: {rel_sig}"
    print("VERIFY-OK")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["reference", "run", "verify"])
    ap.add_argument("--ckpt-dir", default="")
    ap.add_argument("--tag", default="full")
    ap.add_argument("--a", default="full")
    ap.add_argument("--b", default="resumed")
    args = ap.parse_args()
    if args.cmd == "reference":
        cmd_reference()
    elif args.cmd == "run":
        assert args.ckpt_dir, "--ckpt-dir required"
        cmd_run(args.ckpt_dir, args.tag)
    else:
        cmd_verify(args.a, args.b)


if __name__ == "__main__":
    main()
