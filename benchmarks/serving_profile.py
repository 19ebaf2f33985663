"""In-loop cumulative phase profile of the SERVING pipeline
(finish='rowspace_utv', qr_method='robust1' finals — the 0.285 ms
config of bench_results/scale_ondevice.csv).

Same protocol as round 3's phase_profile_inloop_4096.csv: a sequence of
TRUNCATED pipelines, each ending at one more stage, every one iterated
inside a single jitted fori_loop whose carry consumes a sum-of-squares
probe of the stage output (so XLA cannot fold the dead suffix), timed by
the wide-spread slope.  Stage cost = consecutive cumulative difference.

Writes bench_results/phase_profile_serving_<M>.csv.
"""

import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
K, P, Q = 64, 16, 2


def log(msg):
    print(f"[serve-prof] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.linalg.qr import qr_reduced
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        _PRECISIONS,
        _fold_weights,
        _mm,
        generate_omega,
        orthonormal_basis,
    )

    n = M
    l = K + P
    prec = _PRECISIONS["default"]
    log(f"devices: {jax.devices()}  {M}x{n} k={K} l={l}")
    a = jnp.asarray(
        np.random.default_rng(0).standard_normal((M, n)), jnp.float32)

    # the serving pipeline, stage by stage (q=2 rowspace_utv: 5 passes)
    def stages(x, omega):
        y = _mm(x, omega, prec)
        yield "sketch", y
        q_mat = orthonormal_basis(y, "robust1")
        yield "qr1_robust1", q_mat
        z0 = _mm(x.T, q_mat, prec)                     # round 0 (q-1=1)
        yield "round0_z", z0
        # reorth='half' (the bench config): no Z-side orthonormalization
        q_mat = orthonormal_basis(_mm(x, z0, prec), "robust1")
        yield "round0_y_qr", q_mat
        z = _mm(x.T, q_mat, prec)                      # final co-range
        yield "z_final", z
        z_q = orthonormal_basis(z, "robust1")
        yield "zq_qr_robust1", z_q
        c = _mm(x, z_q, prec)                          # LAST pass
        yield "c_pass", c
        q_c, t = qr_reduced(c, "robust1")
        yield "c_qr_robust1", q_c
        s, safe = _fold_weights(t)
        u = _mm(q_c, t / safe[None, :])
        order = jnp.argsort(-s)
        yield "fold_sort", u[:, order]

    names = [nm for nm, _ in stages(a, jnp.zeros((n, l), jnp.float32))]

    def make_loop(upto, reps):
        def body_fn(x, seeds):
            def body(i, acc):
                omega = generate_omega(seeds[i], n, l, x.dtype)
                out = None
                for j, (_, val) in enumerate(stages(x, omega)):
                    out = val
                    if j == upto:
                        break
                return acc + jnp.sum(out.astype(jnp.float32) ** 2)

            return jax.lax.fori_loop(0, reps, body, jnp.zeros((),
                                                              jnp.float32))

        return jax.jit(body_fn)

    def timed(fn, seed0, reps):
        seeds = jnp.arange(seed0, seed0 + reps, dtype=jnp.int32)
        t0 = time.perf_counter()
        out = fn(a, seeds)
        np.asarray(jax.device_get(out))
        return time.perf_counter() - t0

    r_small, r_large = 4, 32
    rows = []
    prev = 0.0
    for upto, name in enumerate(names):
        f_s, f_l = make_loop(upto, r_small), make_loop(upto, r_large)
        timed(f_s, 50, r_small), timed(f_l, 60, r_large)  # compile+warm
        t_s = min(timed(f_s, 100 + 1000 * i, r_small) for i in range(3))
        t_l = min(timed(f_l, 200 + 1000 * i, r_large) for i in range(3))
        cum = max((t_l - t_s) / (r_large - r_small), 0.0) * 1e3
        rows.append({"stage": name, "cumulative_ms": round(cum, 3),
                     "delta_ms": round(cum - prev, 3), "note": ""})
        log(f"{name:18s} cum {cum:.3f} ms  (+{cum - prev:.3f})")
        prev = cum

    out = f"bench_results/phase_profile_serving_{M}.csv"
    os.makedirs("bench_results", exist_ok=True)
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["stage", "cumulative_ms",
                                          "delta_ms", "note"])
        w.writeheader()
        w.writerows(rows)
    log(f"wrote {out}")


if __name__ == "__main__":
    main()
