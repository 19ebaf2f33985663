"""Accelerator benchmark for the beyond-parity extension modules.

Times each extension's jitted program with the shared chain-delta
protocol (benchmarks/_timing.py) and writes one CSV row per kernel:
Tucker / TT / CP over a (T, H, W) video-like tensor, Hutch++ and SLQ
log-det over an n x n PSD operator, and the sketched solver over a tall
system — the shapes a production user of each API would run.

Usage: python benchmarks/extensions_bench.py [--n 4096] [--t 64]
       [--out bench_results/extensions.csv]
(Requires the TPU relay; safe anywhere, but numbers only mean something
on the accelerator with a QUIET host — CLAUDE.md timing rules.)
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import chain_delta, scaled_variants  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4096,
                    help="square-operator size for trace/SLQ/solver rows")
    ap.add_argument("--t", type=int, default=64,
                    help="video tensor frames (t x n/8 x n/8)")
    ap.add_argument("--out", default="bench_results/extensions.csv")
    ap.add_argument("--only", default="",
                    help="comma list of substrings matched against the "
                         "RECORDED kernel names (the 'kernel' column of "
                         "the output CSV, e.g. rutv_k64, hutchpp_b96); "
                         "rows APPEND to --out instead of overwriting")
    args = ap.parse_args()

    def want(name):
        if not args.only:
            return True
        return any(s and s in name for s in args.only.split(","))

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
        cp_decompose,
        hutchpp,
        logdet_psd,
        sketch_lstsq,
        tt_decompose,
        tucker,
    )

    rng = np.random.default_rng(0)
    n = args.n
    h = w = max(args.n // 8, 64)
    rows = []

    def record(name, shape_desc, per):
        row = {"kernel": name, "shape": shape_desc,
               "ms_per_call": round(per * 1e3, 3)}
        rows.append(row)
        print(row, flush=True)

    # tensor formats on a video-like stack
    if want("tucker_r16x32x32") or want("tt_r16_32") or want("cp_als16_it10"):
        vid = jnp.asarray(
            rng.standard_normal((args.t, h, w)).astype("float32"))
        r = (16, 32, 32)
        if want("tucker_r16x32x32"):
            per = chain_delta(lambda x: tucker(x, r, q=1)[0],
                              scaled_variants((vid,)))
            record("tucker_r16x32x32", f"{args.t}x{h}x{w}", per)
        if want("tt_r16_32"):
            per = chain_delta(lambda x: tt_decompose(x, (16, 32))[0],
                              scaled_variants((vid,)))
            record("tt_r16_32", f"{args.t}x{h}x{w}", per)
        if want("cp_als16_it10"):
            per = chain_delta(lambda x: cp_decompose(x, 16, iters=10)[0],
                              scaled_variants((vid,)))
            record("cp_als16_it10", f"{args.t}x{h}x{w}", per)

    # implicit-matrix estimators on an n x n PSD operator
    if want("hutchpp_b96") or want("slq_logdet_p16s30") or want("nystrom_pcg_r128_i30"):
        b = jnp.asarray(rng.standard_normal((n, 256)).astype("float32"))
        a_psd = (b @ b.T) / 256.0 + jnp.eye(n, dtype=jnp.float32)
        if want("hutchpp_b96"):
            per = chain_delta(lambda x, s: hutchpp(x, seed=s, budget=96),
                              [(a_psd, 0), (a_psd, 1)])
            record("hutchpp_b96", f"{n}x{n}", per)
        if want("slq_logdet_p16s30"):
            per = chain_delta(lambda x, s: logdet_psd(x, seed=s,
                                                      num_probes=16,
                                                      steps=30),
                              [(a_psd, 0), (a_psd, 1)])
            record("slq_logdet_p16s30", f"{n}x{n}", per)
        if want("nystrom_pcg_r128_i30"):
            from rsvd_kamaneh_raganato_terrana_tpu.rsvd import nystrom_pcg

            rhs = jnp.asarray(rng.standard_normal(n).astype("float32"))
            per = chain_delta(
                lambda x, y: nystrom_pcg(x, y, mu=1e-2, rank=128,
                                         iters=30, precision="default"),
                scaled_variants((a_psd, rhs)))
            record("nystrom_pcg_r128_i30", f"{n}x{n}", per)

    # sketched solver on a tall system
    if want("sketch_lstsq_i40"):
        at = jnp.asarray(rng.standard_normal((8 * n, 128)).astype("float32"))
        bt = jnp.asarray(rng.standard_normal((8 * n,)).astype("float32"))
        per = chain_delta(lambda x, y: sketch_lstsq(x, y, iters=40),
                          scaled_variants((at, bt)))
        record("sketch_lstsq_i40", f"{8 * n}x128", per)

    # rank-revealing UTV at the headline shape
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
        complete_lowrank,
        rpca,
        rutv,
    )

    if want("rutv_k64") or want("rlu_k64"):
        sq = jnp.asarray(rng.standard_normal((n, n)).astype("float32"))
        if want("rutv_k64"):
            per = chain_delta(lambda x: rutv(x, k=64, p=16)[1],
                              scaled_variants((sq,)))
            record("rutv_k64", f"{n}x{n}", per)
        if want("rlu_k64"):
            from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rlu

            per = chain_delta(lambda x: rlu(x, k=64, p=16,
                                            precision="default").l_factor,
                              scaled_variants((sq,)))
            record("rlu_k64", f"{n}x{n}", per)

    # robust PCA and completion on a quarter-size problem (whole
    # iteration loops = one program each)
    nq = n // 4
    if want("rpca_k32_it20") or want("completion_k16_it15"):
        lowq = jnp.asarray(
            (rng.standard_normal((nq, 16)) @ rng.standard_normal((16, nq))
             ).astype("float32"))
        if want("rpca_k32_it20"):
            per = chain_delta(
                lambda x: rpca(x, k_max=32, iters=20).low_rank,
                scaled_variants((lowq,)))
            record("rpca_k32_it20", f"{nq}x{nq}", per)
        if want("completion_k16_it15"):
            maskq = jnp.asarray(rng.random((nq, nq)) < 0.5)
            per = chain_delta(
                lambda x: complete_lowrank(x, maskq, k=16, iters=15).s,
                scaled_variants((lowq,)))
            record("completion_k16_it15", f"{nq}x{nq}", per)

    # HODLR: hierarchical build + matvec on a kernel-like matrix
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import (
        hodlr_build,
        hodlr_matvec,
    )

    if want("hodlr_build_L4_k16") or want("hodlr_matvec_L4_k16") \
            or want("dense_matvec"):
        xs = np.linspace(0, 1, n, dtype="float32")
        kern = jnp.asarray(
            np.exp(-((xs[:, None] - xs[None, :]) ** 2) / (2 * 0.1 * 0.1))
            + 0.1 * np.eye(n, dtype="float32"))
        if want("hodlr_build_L4_k16"):
            per = chain_delta(
                lambda x: hodlr_build(x, levels=4, k=16).leaves,
                scaled_variants((kern,)))
            record("hodlr_build_L4_k16", f"{n}x{n}", per)
        if want("hodlr_matvec_L4_k16"):
            hm = hodlr_build(kern, levels=4, k=16)
            vecs = [(jnp.asarray(rng.standard_normal(n).astype("float32")),),
                    (jnp.asarray(rng.standard_normal(n).astype("float32")),)]
            per = chain_delta(lambda x: hodlr_matvec(hm, x), vecs)
            record("hodlr_matvec_L4_k16", f"{n}x{n}", per)
        if want("dense_matvec"):
            vecs = [(jnp.asarray(rng.standard_normal(n).astype("float32")),),
                    (jnp.asarray(rng.standard_normal(n).astype("float32")),)]
            per = chain_delta(lambda x: kern @ x, vecs)
            record("dense_matvec", f"{n}x{n}", per)

    if not rows:
        print("no kernels matched --only; nothing to write")
        return
    from benchmarks._timing import migrate_csv

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    fields = list(rows[0].keys())
    append = bool(args.only) and os.path.exists(args.out)
    if append:
        # a stale file from an older schema would otherwise accumulate
        # misaligned rows: migrate it in place (missing columns -> '')
        migrate_csv(args.out, fields)
    with open(args.out, "a" if append else "w", newline="") as f:
        wtr = csv.DictWriter(f, fieldnames=fields)
        if not append:
            wtr.writeheader()
        wtr.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
