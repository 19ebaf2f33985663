"""POD pipeline CLI (reference POD/.../Diff1D*.cpp driver family:
``./Diff1D <pod.txt> <advdiff.prm>``).

Modes:
  standard     — Diff1D.cpp: FOM sweep -> POD -> ROM loop -> error table +
                 full/reconstruction/errors/sigma exports.
  new-param    — Diff1D_new_prm.cpp: ROM prediction at unseen mu_new with
                 FOM ground truth + timing CSV.
  convergence  — Diff1D_convergence.cpp: FOM L2/H1 error vs deltat with
                 convergence orders.

The reference's own input files run unmodified:
  python -m rsvd_kamaneh_raganato_terrana_tpu.apps.pod_main \
      /root/reference/POD/ParametricDiffusion1D/input/test_pod_00.txt \
      /root/reference/POD/ParametricDiffusion1D/input/test_advdiff_00.prm
"""

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pod_file")
    ap.add_argument("prm_file")
    ap.add_argument("--mode", default="standard",
                    choices=["standard", "new-param", "convergence"])
    ap.add_argument("--out-dir", default="data/output/pod")
    ap.add_argument("--deltats", default="5e-3,2.5e-3,1.25e-3",
                    help="convergence-mode dt list")
    ap.add_argument("--rom-size", type=int, default=0,
                    help="convergence mode: also track the ROM error with "
                         "this many modes (Diff1D_convergence.cpp computed "
                         "both FOM and ROM errors)")
    args = ap.parse_args(argv)

    import jax

    # The POD/FEM pipeline is double-precision science code (the reference
    # is all-double Eigen); enable x64 off-TPU.  On TPU the f32 path runs
    # with HIGHEST-precision dots.
    if jax.default_backend() != "tpu":
        jax.config.update("jax_enable_x64", True)

    from rsvd_kamaneh_raganato_terrana_tpu.apps import rom
    from rsvd_kamaneh_raganato_terrana_tpu.core.config import (
        parse_pod_config,
        parse_prm_config,
    )

    pod_cfg = parse_pod_config(args.pod_file)
    adv_cfg = parse_prm_config(args.prm_file)
    print(f"pod config: {pod_cfg}")
    print(f"advdiff config: {adv_cfg}")
    os.makedirs(args.out_dir, exist_ok=True)

    if args.mode == "standard":
        res = rom.run_pod_pipeline(pod_cfg, adv_cfg, out_dir=args.out_dir)
        print(f"timings: {res.timings}")
        print(f"POD retained rank (energy criterion): {res.pod.rank}")
        print(f"{'rom_size':>9} {'mean rel-L2 err':>16} {'max':>12}")
        for rs in pod_cfg.rom_sizes:
            errs = res.errors[rs]
            print(f"{rs:>9} {sum(errs) / len(errs):>16.6e} {max(errs):>12.3e}")
        print(f"exports -> {args.out_dir}")
    elif args.mode == "new-param":
        rows = rom.run_new_param_study(
            pod_cfg, adv_cfg,
            out_csv=os.path.join(args.out_dir, "time_new_param.csv"),
        )
        keys = list(rows[0].keys())
        print(",".join(keys))
        for r in rows:
            print(",".join(str(r[k]) for k in keys))
    else:
        dts = [float(x) for x in args.deltats.split(",")]
        rom_modes = None
        if args.rom_size > 0:
            import numpy as np

            from rsvd_kamaneh_raganato_terrana_tpu.apps import advdiff
            from rsvd_kamaneh_raganato_terrana_tpu.apps.pod import make_pod

            mus = np.linspace(pod_cfg.mu_min, pod_cfg.mu_max, pod_cfg.n)
            snaps = advdiff.snapshot_matrix(adv_cfg, mus)
            pod_res = make_pod(pod_cfg.pod_type, snaps, pod_cfg.rank,
                               pod_cfg.tol, pod_cfg.svd_type)
            rom_modes = pod_res.modes[:, : args.rom_size]
        out = rom.run_convergence_study(
            adv_cfg, dts, mu=pod_cfg.mu_min, rom_modes=rom_modes,
            out_csv=os.path.join(args.out_dir, "convergence.csv"),
        )
        cols = f"{'deltat':>10} {'L2':>12} {'H1':>12}"
        if rom_modes is not None:
            cols += f" {'ROM L2':>12}"
        print(cols)
        for i, dt in enumerate(dts):
            line = f"{dt:>10.2e} {out['fom_l2'][i]:>12.4e} {out['fom_h1'][i]:>12.4e}"
            if rom_modes is not None:
                line += f" {out['rom_l2'][i]:>12.4e}"
            print(line)
        print(f"observed temporal orders: {out['fom_order']}")
        if rom_modes is not None:
            print(f"ROM temporal orders: {out['rom_order']}")


if __name__ == "__main__":
    main()
