"""Probe the effective bandwidth of a dependent 5-pass skinny-GEMM chain
vs operand size: if an on-chip/near memory of size S exists, effective
GB/s collapses to HBM rate once 2*n^2 bytes > S.  Uses threefry omegas
(non-hoistable, unlike the retracted linear-seed probe) and escalated
spreads.  Informs the depth-vs-hbm 'bound' column of scale_ondevice.csv.
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rsvd_kamaneh_raganato_terrana_tpu.core.rng import (  # noqa: E402
    key_from_seed,
)

L = 80
PREC = jax.lax.Precision.DEFAULT


def make_loop(n, reps):
    def run(x, seeds):
        def body(i, acc):
            om = jax.random.normal(key_from_seed(seeds[i]), (n, L),
                                   jnp.bfloat16)
            y1 = jnp.matmul(x, om, precision=PREC,
                            preferred_element_type=jnp.float32)
            z = jax.lax.dot_general(
                x, y1.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                precision=PREC, preferred_element_type=jnp.float32)
            y2 = jnp.matmul(x, z.astype(jnp.bfloat16), precision=PREC,
                            preferred_element_type=jnp.float32)
            z2 = jax.lax.dot_general(
                x, y2.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                precision=PREC, preferred_element_type=jnp.float32)
            y3 = jnp.matmul(x, z2.astype(jnp.bfloat16), precision=PREC,
                            preferred_element_type=jnp.float32)
            return acc + jnp.sum(y3 * y3) + jnp.sum(z2 * z2) \
                + jnp.sum(y1 * y1)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), jnp.float32))

    return jax.jit(run)


def timed(fn, x, seed0, reps):
    seeds = jnp.arange(seed0, seed0 + reps, dtype=jnp.int32)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn(x, seeds)))
    return time.perf_counter() - t0


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    for n in (2048, 4096, 6144, 8192):
        x = jnp.asarray(
            rng.standard_normal((n, n)).astype(np.float32)
        ).astype(jnp.bfloat16)
        # pick spreads so the delta clears ~20 ms
        per_guess = 5 * n * n * 2 / (500e9)
        r_l = int(min(2048, max(64, 0.04 / per_guess)))
        r_s = max(8, r_l // 8)
        fn_s, fn_l = make_loop(n, r_s), make_loop(n, r_l)
        timed(fn_s, x, 50, r_s)
        timed(fn_l, x, 50, r_l)
        t_s = min(timed(fn_s, x, 100 + 1000 * i, r_s) for i in range(3))
        t_l = min(timed(fn_l, x, 200 + 1000 * i, r_l) for i in range(3))
        per = (t_l - t_s) / (r_l - r_s)
        gbs = 5 * n * n * 2 / per / 1e9
        print(f"n={n}: [{r_s}:{r_l}] delta {1e3 * (t_l - t_s):.1f} ms, "
              f"{per * 1e3:.3f} ms/iter, {gbs:.0f} GB/s eff "
              f"({gbs / 819 * 100:.0f}% of HBM peak), operand "
              f"{2 * n * n / 1e6:.0f} MB", flush=True)


if __name__ == "__main__":
    main()
