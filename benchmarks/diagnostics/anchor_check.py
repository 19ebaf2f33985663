"""Decisive check of the 0.144 ms serving anchor: same loop body as
bench.py (rsvd_with_omega, serving config, threefry per-iteration
omegas), measured at THREE rep spreads plus absolute-wall sanity
(wall(R) - wall(0-ish) at large R leaves no room for slope artifacts).
"""
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (  # noqa: E402
    generate_omega,
    rsvd_with_omega,
)

M = N = 4096
K, P, Q = 64, 16, 2


def make_loop(reps):
    def run_loop(x, seeds):
        def body(i, acc):
            omega = generate_omega(seeds[i], N, K + P, x.dtype)
            u_i, s_i, v_i = rsvd_with_omega(
                x, omega, q=Q, k=K, method="eigh", qr_method="cholqr1",
                precision="default", reorth="half", interior_qr="cholqr1",
                finish="rowspace_utv")
            return acc + s_i[0] + jnp.sum(u_i ** 2) + jnp.sum(v_i ** 2)

        return jax.lax.fori_loop(0, reps, body, jnp.zeros((), x.dtype))

    return jax.jit(run_loop)


def timed(fn, seed0, reps):
    seeds = jnp.arange(seed0, seed0 + reps, dtype=jnp.int32)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn(x_glob, seeds)))
    return time.perf_counter() - t0


def main():
    global x_glob
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    x_glob = jnp.asarray(rng.standard_normal((M, N)).astype(np.float32))

    walls = {}
    for reps in (4, 32, 64, 256):
        fn = make_loop(reps)
        timed(fn, 50, reps)  # compile + first
        walls[reps] = min(timed(fn, 100 + 1000 * i, reps)
                          for i in range(3))
        print(f"R={reps}: wall {walls[reps] * 1e3:.1f} ms", flush=True)
    for a, b in ((4, 32), (32, 256), (4, 256), (64, 256)):
        s = (walls[b] - walls[a]) / (b - a)
        print(f"slope [{a}:{b}] = {s * 1e3:.3f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
