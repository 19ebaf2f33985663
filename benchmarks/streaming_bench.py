"""North-star streaming benchmark: out-of-core rSVD at up to 100k x 100k.

Two complementary measurements (BASELINE.md north star: >=70% of peak
matmul FLOP/s in the sketch/power phases at 100k^2 rank-128):

1. REAL host-streamed runs (`--real` sizes): A lives in host RAM and
   streams through the relay.  Reports wall time, sustained H2D
   bandwidth, and per-phase seconds.  In this environment the host relay
   (~10-50 MB/s sustained, measured with forced fetches) — not the MXU —
   is the bound; a production TPU host (PCIe/DMA tens of GB/s) moves the
   bound back to compute.

2. SYNTHESIZED-panel runs (`--synth` sizes): the full pipeline over an
   implicit sign-flipped-tiled operator (panel i = (+/-1)^i * base, base
   a device-resident Gaussian block) with each streamed pass compiled to
   ONE XLA program (fori_loop over panels).  Per-pass HBM traffic and
   FLOPs are identical to streaming compute, with the relay and Python
   dispatch loop removed — this measures the device-side roofline
   fraction of the sketch/power GEMM phases at the true north-star
   shape.  The sign flip keeps the per-panel GEMM loop-dependent so XLA
   cannot hoist it.

Writes/updates bench_results/streaming.csv (one row per run) and prints a
summary to stderr.

Usage:
  python benchmarks/streaming_bench.py --synth 100000 --k 128
  python benchmarks/streaming_bench.py --real 16384,32768 --k 128
  python benchmarks/streaming_bench.py --real-tiled 100000 --k 128
"""

import argparse
import csv
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-precision MXU ceilings for f32 inputs on this chip (TFLOP/s):
# bf16 peak ~197 (v5e-class); highest = 6-pass bf16, high = 3-pass.
ROOFLINE_TFLOPS = {"highest": 197.0 / 6, "high": 197.0 / 3, "default": 197.0}
# HBM bandwidth ceiling of the same chip (v5e: 819 GB/s).  Every row is
# scored against BOTH rooflines and labels its binding resource: the
# streamed GEMM's arithmetic intensity is l/2 FLOP/byte, so at l=144 the
# `highest` rows (critical AI 40) are MXU-bound while `high`/`default`
# (critical AI 80/241) are HBM-bound — the % columns must not silently
# switch meaning (VERDICT r2 item 8).
HBM_GBPS = 819.0
# bytes of wire traffic per matrix entry by panel encoding
PANEL_BYTES = {"": 4.0, "none": 4.0, "bfloat16": 2.0, "int8": 1.0}

CSV_PATH = "bench_results/streaming.csv"
FIELDS = [
    "mode", "m", "n", "k", "l", "q", "precision", "panel_dtype",
    "panel_rows", "wall_s", "transfer_gb", "h2d_gbps",
    "sketch_s", "power_s", "project_s", "qr_s", "tail_s",
    "gemm_tflops", "mxu_roofline_pct", "hbm_gbps", "hbm_roofline_pct",
    "bound", "captured_energy", "s_rel_vs_f32", "sigma0",
]


def log(msg):
    print(f"[stream-bench] {msg}", file=sys.stderr, flush=True)


def append_row(row):
    """Append immediately so killed/partial runs keep their rows.  If the
    existing file's header predates the current schema, migrate it in
    place (old rows keep '' in new columns) instead of silently writing
    misaligned rows."""
    from benchmarks._timing import migrate_csv

    os.makedirs("bench_results", exist_ok=True)
    migrate_csv(CSV_PATH, FIELDS, {"mxu_roofline_pct": "roofline_pct"})
    exists = os.path.exists(CSV_PATH)
    with open(CSV_PATH, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        if not exists:
            w.writeheader()
        w.writerow(row)


def gen_host_matrix(m, n, seed=0, threads=4):
    """iid N(0,1) f32 host matrix, generated in parallel row blocks;
    returns (A, ||A||_F^2)."""
    a = np.empty((m, n), dtype=np.float32)
    norms = [0.0] * threads
    block = -(-m // threads)

    def fill(t):
        rng = np.random.default_rng(seed + 1000 * t)
        lo = t * block
        hi = min(m, lo + block)
        for s in range(lo, hi, 1024):
            e = min(hi, s + 1024)
            a[s:e] = rng.standard_normal((e - s, n), dtype=np.float32)
        norms[t] = float((a[lo:hi].astype(np.float64) ** 2).sum())

    ts = [threading.Thread(target=fill, args=(t,)) for t in range(threads)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    return a, sum(norms)


class TiledHostMatrix:
    """Host-side implicit tiled matrix: row slices resolve into a base
    block, so a 40 GB operand needs neither 40 GB of RAM nor an hour of
    host RNG — while every panel still genuinely crosses the host->device
    wire (the quantity the real-streamed benchmark measures).  Slices must
    stay within one tile: keep panel_rows | base rows."""

    def __init__(self, base, m):
        self.base = base
        self.shape = (m, base.shape[1])

    def __getitem__(self, sl):
        start = sl.start or 0
        rows = sl.stop - start
        br = self.base.shape[0]
        off = start % br
        assert off + rows <= br, "panel crosses tile boundary"
        return self.base[off:off + rows]


def run_one(mode, a_src, m, n, k, q, precision, panel_rows, norm_sq,
            onepass=False, panel_dtype=None, s_f32=None,
            finish="project", qr_method="robust"):
    import jax

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        rsvd_streaming,
        rsvd_streaming_onepass,
    )

    phase = {}
    t0 = time.perf_counter()
    if onepass:
        u, s, v = rsvd_streaming_onepass(
            a_src, k=k, p=16, method="eigh", panel_rows=panel_rows,
            precision=precision, phase_times=phase,
            panel_dtype=panel_dtype)
    else:
        u, s, v = rsvd_streaming(
            a_src, k=k, p=16, q=q, method="eigh", panel_rows=panel_rows,
            precision=precision, phase_times=phase,
            panel_dtype=panel_dtype, finish=finish, qr_method=qr_method)
    jax.block_until_ready((u, s, v))
    wall = time.perf_counter() - t0
    s_host = np.asarray(s, dtype=np.float64)

    l = min(k + 16, min(m, n))
    passes = 1 if onepass else (
        2 * q + 1 if finish in ("rowspace", "rowspace_utv") else 2 * q + 2)
    wire_bytes = PANEL_BYTES[panel_dtype or ""]
    if panel_dtype == "int8":
        wire_bytes += 4.0 / n  # per-row f32 scale
    gb = m * n * wire_bytes * passes / 1e9
    # sketch/power GEMM FLOPs (the north-star phases). one-pass does
    # 2 GEMMs (Omega l + Psi s cols) in its single sweep.
    s_cols = 2 * l + 1
    gemm_flops = (2.0 * m * n * (l + s_cols) if onepass
                  else 2.0 * m * n * l * (2 * q + 2))
    gemm_s = (phase.get("sketch_pass", 0.0) if onepass else
              phase.get("sketch", 0.0) + phase.get("power_zt", 0.0)
              + phase.get("power_y", 0.0) + phase.get("project", 0.0))
    tflops = gemm_flops / max(gemm_s, 1e-9) / 1e12
    roof = ROOFLINE_TFLOPS.get(precision, float("nan"))
    captured = float((s_host ** 2).sum() / norm_sq) if norm_sq else float("nan")
    s_rel = ""
    if s_f32 is not None:
        s_rel = round(float(np.max(np.abs(s_host - s_f32)
                                   / np.maximum(s_f32, 1e-30))), 8)

    row = {
        "mode": (mode if finish == "project" else f"{mode}-{finish}"
                 + ("" if qr_method == "robust" else f"+{qr_method}")),
        "m": m, "n": n, "k": k, "l": l,
        "q": (0 if onepass else q), "precision": precision,
        "panel_dtype": panel_dtype or "",
        "panel_rows": panel_rows,
        "wall_s": round(wall, 3),
        "transfer_gb": round(gb, 2) if "real" in mode else 0.0,
        "h2d_gbps": round(gb / wall, 3) if "real" in mode else "",
        "sketch_s": round(phase.get("sketch",
                                    phase.get("sketch_pass", 0.0)), 3),
        "power_s": round(phase.get("power_zt", 0.0)
                         + phase.get("power_y", 0.0), 3),
        "project_s": round(phase.get("project", 0.0), 3),
        "qr_s": round(phase.get("qr", 0.0), 3),
        "tail_s": round(phase.get("tail", phase.get("solve_tail", 0.0)), 3),
        "gemm_tflops": round(tflops, 2),
        "mxu_roofline_pct": round(100.0 * tflops / roof, 1),
        "hbm_gbps": "", "hbm_roofline_pct": "",
        # a real host-streamed run is bound by the host->device link,
        # not by either on-chip roofline
        "bound": "h2d-link",
        "captured_energy": round(captured, 6),
        "s_rel_vs_f32": s_rel,
        "sigma0": round(float(s_host[0]), 3),
    }
    log(" ".join(f"{k}={v}" for k, v in row.items()))
    append_row(row)
    row["_s"] = s_host
    return row


def run_synth(size, k, q, precisions, panel_rows=2048):
    """Device-roofline measurement: every streamed pass of the pipeline as
    one compiled fori_loop over panels of an implicit tiled operator."""
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
    from rsvd_kamaneh_raganato_terrana_tpu.linalg.svd import _gram_eigh_svd

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        _PRECISIONS as _PREC,
    )

    tiles = max(1, round(size / panel_rows))
    m = n = tiles * panel_rows
    l = k + 16
    base = jax.random.normal(jax.random.PRNGKey(7), (panel_rows, n),
                             jnp.float32)
    base.block_until_ready()
    log(f"synth operator: {m}x{n} = {tiles} tiles of {panel_rows} rows "
        f"({base.nbytes / 1e9:.2f} GB base block)")

    jit_qr = jax.jit(qr_reduced, static_argnums=(1,))
    rows_out = []

    def _force(x):
        # block_until_ready under-reports through the relay; a 1-element
        # device->host fetch cannot (execution is in-order per device)
        np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    def chain(fn, arg, n_small=2, n_large=8):
        """Per-call seconds from the slope between two chain lengths (the
        fetch RTT cancels in the delta).  Calls ALTERNATE between two
        scaled copies of the input — identical FLOPs, different values —
        so no transport layer can deduplicate repeated (program, input)
        pairs into impossible throughput (round 3 found the previous
        same-input chain reporting 127 TFLOP/s where the HBM bound
        allows at most ~59: the relay had been collapsing duplicates)."""
        args = (arg, arg * np.float32(2.0))
        out = fn(args[0])
        _force(out)
        _force(fn(args[1]))

        def run(nn):
            t0 = time.perf_counter()
            o = None
            for i in range(nn):
                o = fn(args[i % 2])
            _force(o)
            return time.perf_counter() - t0

        t_s = min(run(n_small) for _ in range(2))
        t_l = min(run(n_large) for _ in range(2))
        return max((t_l - t_s) / (n_large - n_small), 1e-9), out

    for prec_name in precisions:
        prec = _PREC[prec_name]

        # NOTES: (1) the base block is a function ARGUMENT, never a
        # closure — a closed-over device array is embedded in the jaxpr
        # as a constant and serialized with the program to the remote
        # compiler (observed: 45+ min "compile" for the 0.8 GB block);
        # (2) the per-panel sign is read from a TRACED vector — a
        # compile-time (-1)^i constant-folds once the loop unrolls and
        # CSE collapses all panel GEMMs into one (observed: "283% of
        # roofline").
        @jax.jit
        def pass_right_impl(bb, sg, bmat):
            """Y = A @ B over the tiled operator, one program."""
            y0 = jnp.zeros((m, bmat.shape[1]), jnp.float32)

            def body(i, y):
                s = jax.lax.dynamic_index_in_dim(sg, i, keepdims=False)
                yp = jnp.matmul(bb, bmat * s, precision=prec,
                                preferred_element_type=jnp.float32)
                return jax.lax.dynamic_update_slice(
                    y, yp, (i * panel_rows, 0))

            return jax.lax.fori_loop(0, tiles, body, y0)

        @jax.jit
        def pass_left_impl(bb, sg, qmat):
            """Z = A^T @ Q over the tiled operator, one program."""
            acc0 = jnp.zeros((n, qmat.shape[1]), jnp.float32)

            def body(i, acc):
                s = jax.lax.dynamic_index_in_dim(sg, i, keepdims=False)
                qp = jax.lax.dynamic_slice(
                    qmat, (i * panel_rows, 0),
                    (panel_rows, qmat.shape[1]))
                return acc + jnp.matmul(bb.T, qp * s, precision=prec,
                                        preferred_element_type=jnp.float32)

            return jax.lax.fori_loop(0, tiles, body, acc0)

        signs = jnp.asarray(
            np.where(np.arange(tiles) % 2 == 0, 1.0, -1.0), jnp.float32)

        def pass_right(bmat):
            return pass_right_impl(base, signs, bmat)

        def pass_left(qmat):
            return pass_left_impl(base, signs, qmat)

        omega = jax.random.normal(jax.random.PRNGKey(1), (n, l), jnp.float32)
        pass_flops = 2.0 * m * n * l
        roof = ROOFLINE_TFLOPS[prec_name]

        # warm/compile the whole phase chain once so no timed bucket
        # includes trace/compile time (observed: 5.7 s of compile in the
        # first precision's tail_s)
        y_w = pass_right(omega)
        qm_w, _ = jit_qr(y_w, "robust")
        z_w = pass_left(qm_w)
        b_w = z_w.T
        uw, sw, vw = jax.jit(_gram_eigh_svd)(b_w)
        _force(qm_w @ uw)

        t_sketch, y = chain(pass_right, omega)
        q_mat, _ = jit_qr(y, "robust")
        t_zt, z = chain(pass_left, q_mat)
        z_q, _ = jit_qr(z, "robust")
        t_y2, y = chain(pass_right, z_q)
        q_mat, _ = jit_qr(y, "robust")
        # project pass reuses pass_left; tail on-device
        t0 = time.perf_counter()
        b = pass_left(q_mat).T
        u, s, v = jax.jit(_gram_eigh_svd)(b)
        u = q_mat @ u
        jax.block_until_ready((u, s, v))
        _force(u)
        t_tail = time.perf_counter() - t0
        s_host = np.asarray(s, np.float64)

        gemm_s = t_sketch + t_zt + t_y2
        tflops = 3 * pass_flops / gemm_s / 1e12
        # dual roofline.  Bytes of A read from HBM per pass depend on the
        # precision's operand handling: XLA hoists the f32->bf16 convert
        # of the loop-invariant base block OUT of the fori_loop, so
        # 'high'/'default' passes re-read a 2-byte bf16 copy, while
        # 'highest' (6-pass hi+lo bf16 split) reads 4 bytes/element.
        # (Round 3 verified this: assuming 4 B for 'default' implied
        # 1.4 TB/s on an 819 GB/s chip; at 2 B the same measurement is
        # 700 GB/s = 85% of peak — physical, and reproduced with the
        # dedup-proof alternating-input chain.)  The small operand +
        # output are l/n-th of A's traffic.  AI = 2l/bytes_per_elt
        # decides which ceiling binds this precision.
        bytes_per_elt = 4.0 if prec_name == "highest" else 2.0
        hbm_gbps = 3 * (m * n * bytes_per_elt) / gemm_s / 1e9
        ai = 2.0 * l / bytes_per_elt
        ai_crit = roof * 1e12 / (HBM_GBPS * 1e9)
        bound = "mxu" if ai >= ai_crit else "hbm"
        # expected sigma0 of the tiled operator ~ sqrt(tiles)*(sqrt(n)+sqrt(rows))
        sig0_exp = (tiles ** 0.5) * (n ** 0.5 + panel_rows ** 0.5)
        row = {
            "mode": "synth-jit", "m": m, "n": n, "k": k, "l": l, "q": q,
            "precision": prec_name, "panel_dtype": "",
            "panel_rows": panel_rows,
            "wall_s": round(gemm_s * (2 * q + 2) / 3 + t_tail, 3),
            "transfer_gb": 0.0, "h2d_gbps": "",
            "sketch_s": round(t_sketch, 3),
            "power_s": round(t_zt + t_y2, 3),
            "project_s": round(t_zt, 3),
            "qr_s": "", "tail_s": round(t_tail, 3),
            "gemm_tflops": round(tflops, 2),
            "mxu_roofline_pct": round(100.0 * tflops / roof, 1),
            "hbm_gbps": round(hbm_gbps, 1),
            "hbm_roofline_pct": round(100.0 * hbm_gbps / HBM_GBPS, 1),
            "bound": bound,
            "captured_energy": "",
            "s_rel_vs_f32": "",
            "sigma0": round(float(s_host[0]), 2),
        }
        log(" ".join(f"{kk}={vv}" for kk, vv in row.items())
            + f"  [sigma0 expected ~{sig0_exp:.0f}]")
        append_row(row)
        rows_out.append(row)
    return rows_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--real", default="", help="comma sizes for host-streamed")
    ap.add_argument("--real-tiled", default="",
                    help="comma sizes for host-streamed TILED operators "
                         "(full wire traffic, no 40 GB host buffer)")
    ap.add_argument("--synth", default="", help="comma sizes for synthesized")
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--q", type=int, default=2)
    ap.add_argument("--precisions", default="highest,high,default")
    ap.add_argument("--panel-mb", type=int, default=256)
    ap.add_argument("--onepass", action="store_true",
                    help="also run the one-pass variant per config")
    ap.add_argument("--panel-dtypes", default="none",
                    help="comma list of wire encodings per real run: "
                         "none,bfloat16,int8")
    ap.add_argument("--finish", default="project",
                    help="rsvd_streaming end-game: project | rowspace "
                         "(2q+1 streamed passes) | utv | rowspace_utv "
                         "(serving tails, round 5)")
    ap.add_argument("--qr-method", default="robust",
                    help="orthonormalization variant for every streamed "
                         "QR (serving: cholqr1)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.streaming import (
        SynthesizedMatrix,
    )

    log(f"devices: {jax.devices()}")
    rows = []
    precisions = args.precisions.split(",")
    panel_dtypes = [None if x in ("", "none") else x
                    for x in args.panel_dtypes.split(",")]

    for size in [int(x) for x in args.synth.split(",") if x]:
        rows.extend(run_synth(size, args.k, args.q, precisions))

    for size in [int(x) for x in args.real_tiled.split(",") if x]:
        m = n = size
        panel_rows = max(1, (args.panel_mb << 20) // (n * 4))
        rng0 = np.random.default_rng(3)
        # base: low-rank signal + noise so the tiled operator has a
        # decaying spectrum the one-pass estimator resolves
        br = panel_rows * 2
        base = (5.0 * rng0.standard_normal((br, 64)).astype(np.float32)
                @ rng0.standard_normal((64, n)).astype(np.float32)
                + rng0.standard_normal((br, n)).astype(np.float32))
        tiles = -(-m // br)
        src_t = TiledHostMatrix(base, tiles * br)
        m = n_rows = tiles * br
        norm_sq = float((base.astype(np.float64) ** 2).sum()) * tiles
        for prec in precisions:
            s_ref = None
            for pd in panel_dtypes:
                r = run_one("real-tiled-onepass", src_t, m, n, args.k,
                            args.q, prec, panel_rows, norm_sq,
                            onepass=True, panel_dtype=pd, s_f32=s_ref)
                if pd is None:
                    s_ref = r["_s"]
                rows.append(r)

    for size in [int(x) for x in args.real.split(",") if x]:
        m = n = size
        panel_rows = max(1, (args.panel_mb << 20) // (n * 4))
        log(f"generating {m}x{n} host matrix "
            f"({m * n * 4 / 1e9:.1f} GB) ...")
        t0 = time.perf_counter()
        a, norm_sq = gen_host_matrix(m, n)
        log(f"generated in {time.perf_counter() - t0:.1f}s")
        for prec in precisions:
            s_ref = None
            for pd in panel_dtypes:
                r = run_one("real", a, m, n, args.k, args.q, prec,
                            panel_rows, norm_sq, panel_dtype=pd,
                            s_f32=s_ref, finish=args.finish,
                            qr_method=args.qr_method)
                if pd is None:
                    s_ref = r["_s"]
                rows.append(r)
                if args.onepass:
                    rows.append(run_one("real-onepass", a, m, n, args.k,
                                        args.q, prec, panel_rows, norm_sq,
                                        onepass=True, panel_dtype=pd))
        del a

    log(f"recorded {len(rows)} rows in {CSV_PATH}")


if __name__ == "__main__":
    main()
