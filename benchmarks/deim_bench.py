"""POD-DEIM online-stage benchmark: FOM vs full-nonlinearity ROM vs DEIM.

Whole-solve wall time (jitted scan over all time steps = ONE dispatch,
chain-delta protocol) for the advection-diffusion-reaction problem at a
production-ish Nh.  The claim under test: the DEIM ROM's online stage is
independent of Nh (O(r^2 + rm) per step after projection), while the
full-nonlinearity ROM pays O(Nh r + Nh^2) per step and the FOM pays the
full-order solve.

Usage: python benchmarks/deim_bench.py [--nh 4097] [--steps 400]
       [--r 8] [--m 10] [--out bench_results/deim.csv]
"""

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks._timing import chain_delta  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nh", type=int, default=4097)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--r", type=int, default=8)
    ap.add_argument("--m", type=int, default=10)
    ap.add_argument("--c-react", type=float, default=4.0)
    ap.add_argument("--out", default="bench_results/deim.csv")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff, rom
    from rsvd_kamaneh_raganato_terrana_tpu.core.config import AdvDiffConfig
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd import rsvd
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.deim import deim_fit

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    cfg = AdvDiffConfig(N=args.nh - 2, T=args.steps * 1e-3, deltat=1e-3,
                        theta=1.0, beta=1.0, u0_choice=0, amplitude=1.0,
                        sample_every=4)
    dtype = jnp.float32
    c = args.c_react

    # offline: snapshots at 3 training parameters -> POD modes + DEIM
    mus_train = (0.05, 0.12, 0.25)
    snaps = jnp.concatenate(
        [advdiff.solve_fom_reaction(cfg, m, c, dtype=dtype).snapshots
         for m in mus_train], axis=1)
    modes, _, _ = rsvd(snaps, k=args.r, method="eigh")
    d = deim_fit(advdiff.reaction(snaps, "cubic", c), m=args.m)
    print(f"offline done: snaps {snaps.shape}, modes {modes.shape}",
          file=sys.stderr, flush=True)

    mus_eval = [(0.10,), (0.18,)]   # two distinct args (dedup defense)
    rows = []

    def record(name, fn):
        per = chain_delta(fn, mus_eval, n_small=2, n_large=8)
        row = {"surface": name, "nh": args.nh, "steps": cfg.n_steps,
               "r": args.r, "m": args.m,
               "ms_per_solve": round(per * 1e3, 3),
               "us_per_step": round(per / cfg.n_steps * 1e6, 2)}
        rows.append(row)
        print(row, flush=True)

    record("fom", lambda mu: advdiff.solve_fom_reaction(
        cfg, mu, c, dtype=dtype).solution)
    record("rom_full_nonlin", lambda mu: rom.solve_rom_reaction_full(
        cfg, mu, modes, c, dtype=dtype))
    record("rom_deim", lambda mu: rom.solve_rom_deim(
        cfg, mu, modes, d, c, dtype=dtype))

    # accuracy context for the same eval parameter
    mu = 0.10
    u_f = advdiff.solve_fom_reaction(cfg, mu, c, dtype=dtype).solution
    e_full = rom.relative_l2_error(
        u_f, rom.solve_rom_reaction_full(cfg, mu, modes, c, dtype=dtype))
    e_deim = rom.relative_l2_error(
        u_f, rom.solve_rom_deim(cfg, mu, modes, d, c, dtype=dtype))
    for row in rows:
        row["rel_err_rom_full"] = round(e_full, 8)
        row["rel_err_rom_deim"] = round(e_deim, 8)
    print(f"rel-L2 err @ mu={mu}: rom_full={e_full:.3e} deim={e_deim:.3e}",
          file=sys.stderr, flush=True)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
