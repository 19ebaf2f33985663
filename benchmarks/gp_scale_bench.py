"""GP regression at beyond-dense-kernel scale (round 4).

Exercises the never-materialize-K regime end to end on hardware: fit a
GP on n 1-D points via `hodlr_build_implicit` (kernel blocks computed
on device on demand), predict, and estimate the log-marginal-likelihood
with matrix-free SLQ on the hierarchical matvec.  At n = 32768 the
dense train kernel would be 4.3 GB (f32) + an O(n^3) = 1.2e13-FLOP
Cholesky; at 65536 it cannot exist in HBM at all.

One-shot wall times (these are multi-second operations — the ~32 ms
relay RTT is noise); accuracy gated against the analytic test function.
Appends rows to bench_results/hodlr_sweep.csv (op=gp_implicit_*).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.hodlr_sweep import append_row  # noqa: E402
from benchmarks.streaming_bench import log  # noqa: E402


def main(n: int = 32768, levels: int = 6, rank: int = 24):
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.apps.gp import GP

    log(f"devices: {jax.devices()}  n={n} levels={levels} rank={rank}")
    rng = np.random.default_rng(0)
    x = np.sort(rng.uniform(0.0, 20.0, n)).astype(np.float32)
    y = (np.sin(x) + 0.1 * np.cos(7.0 * x)
         + 0.05 * rng.standard_normal(n)).astype(np.float32)

    gp = GP(noise=0.05, levels=levels, rank=rank, implicit_threshold=1)
    t0 = time.perf_counter()
    gp.fit(x, y)
    np.asarray(gp.alpha_[:1])                       # force completion
    fit_s = time.perf_counter() - t0
    assert "implicit" in gp.solver_used_, gp.solver_used_
    log(f"fit: {fit_s:.2f}s ({gp.solver_used_})")

    xt = np.linspace(0.5, 19.5, 512).astype(np.float32)
    t0 = time.perf_counter()
    mean, var = gp.predict(xt, return_var=True)
    np.asarray(mean[:1]), np.asarray(var[:1])
    pred_s = time.perf_counter() - t0
    truth = np.sin(xt) + 0.1 * np.cos(7.0 * xt)
    err = float(np.max(np.abs(np.asarray(mean) - truth)))
    log(f"predict(512): {pred_s:.2f}s  max|mean-f| = {err:.4f}")
    assert err < 0.1, err

    t0 = time.perf_counter()
    lml = gp.log_marginal_likelihood(num_probes=8, steps=30)
    lml_s = time.perf_counter() - t0
    log(f"log-ML (matrix-free SLQ): {lml:.1f} in {lml_s:.2f}s")

    leaf = n // 2 ** levels
    append_row({"op": "gp_implicit_fit", "n": n, "levels": levels,
                "k": rank, "leaf": leaf, "ms": round(fit_s * 1e3, 1),
                "dense_ms": "", "speedup": "",
                "bytes_mb": "", "dense_bytes_mb": round(n * n * 4 / 1e6, 1),
                "note": f"one-shot wall; K never materialized; "
                        f"max|mean-f|={err:.4f} at 512 test pts"})
    append_row({"op": "gp_implicit_predict512", "n": n, "levels": levels,
                "k": rank, "leaf": leaf, "ms": round(pred_s * 1e3, 1),
                "dense_ms": "", "speedup": "", "bytes_mb": "",
                "dense_bytes_mb": "",
                "note": "posterior mean+var via 512 CG solves on the "
                        "hierarchical matvec"})
    append_row({"op": "gp_implicit_logml", "n": n, "levels": levels,
                "k": rank, "leaf": leaf, "ms": round(lml_s * 1e3, 1),
                "dense_ms": "", "speedup": "", "bytes_mb": "",
                "dense_bytes_mb": "",
                "note": f"SLQ 8x30 on hodlr_matvec; lml={lml:.1f}"})


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    levels = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    main(n=n, levels=levels)
