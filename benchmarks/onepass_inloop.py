"""In-loop protocol-v2.1 measurement of `rsvd_onepass` (the single-pass
in-core serving mode) with auto-escalating spreads — bench.py's clock
applied to the one-pass driver.

Usage (TPU, default env, solo):
  ONEPASS_M=16384 ONEPASS_K=64 ONEPASS_PRECISION=int8 \
      python benchmarks/onepass_inloop.py
Env: ONEPASS_M/N/K/P/PRECISION, ONEPASS_SYNTH=1 (device operand).
Prints one JSON line (metric rsvd_onepass_*).
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = int(os.environ.get("ONEPASS_M", 8192))
N = int(os.environ.get("ONEPASS_N", M))
K = int(os.environ.get("ONEPASS_K", 64))
P = int(os.environ.get("ONEPASS_P", 16))
PRECISION = os.environ.get("ONEPASS_PRECISION", "default")
SYNTH = os.environ.get("ONEPASS_SYNTH", "0") == "1"


def log(msg):
    print(f"[onepass] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
        quantize_int8_rows,
        rsvd_onepass,
    )

    log(f"devices: {jax.devices()}")
    if SYNTH:
        a = jax.block_until_ready(jax.random.normal(
            jax.random.PRNGKey(0), (M, N), jnp.float32))
    else:
        a = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((M, N)).astype(np.float32))
    if PRECISION == "int8":
        a = jax.block_until_ready(jax.jit(quantize_int8_rows)(a))
        log("operand pre-quantized (1 byte/element for THE pass)")

    def make_loop(reps):
        def run_loop(x, seeds):
            def body(i, acc):
                u, s, v = rsvd_onepass(x, k=K, p=P, seed=seeds[i],
                                       precision=PRECISION)
                return acc + s[0] + jnp.sum(u ** 2) + jnp.sum(v ** 2)

            return jax.lax.fori_loop(0, reps, body,
                                     jnp.zeros((), jnp.float32))

        return jax.jit(run_loop)

    def timed(fn, seed0, reps):
        seeds = jnp.arange(seed0, seed0 + reps, dtype=jnp.int32)
        t0 = time.perf_counter()
        np.asarray(jax.device_get(fn(a, seeds)))
        return time.perf_counter() - t0

    r_s, r_l = 4, 32
    while True:
        f_s, f_l = make_loop(r_s), make_loop(r_l)
        timed(f_s, 50, r_s)
        timed(f_l, 50, r_l)
        t_s = min(timed(f_s, 100 + 1000 * i, r_s) for i in range(3))
        t_l = min(timed(f_l, 200 + 1000 * i, r_l) for i in range(3))
        per = max((t_l - t_s) / (r_l - r_s), 1e-9)
        log(f"[{r_s}:{r_l}] {t_s * 1e3:.1f}/{t_l * 1e3:.1f} ms -> "
            f"{per * 1e3:.3f} ms/iter")
        if t_l - t_s >= 0.020 or r_l >= 2048:
            break
        r_s, r_l = r_s * 8, r_l * 8

    # error vs the dequantized/raw operand, on device
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import Int8Stored

    @jax.jit
    def derr(x, seed):
        u, s, v = rsvd_onepass(x, k=K, p=P, seed=seed,
                               precision=PRECISION)
        xd = (x.q8.astype(jnp.float32) * x.row_scale[:, None]
              if isinstance(x, Int8Stored) else x)
        rec = (u * s[None, :]) @ v.T
        return jnp.linalg.norm(xd - rec), jnp.linalg.norm(xd)

    e, an = (float(t) for t in derr(a, 0))
    floor = float(np.sqrt((min(M, N) - K) / min(M, N))) * an
    print(json.dumps({
        "metric": f"rsvd_onepass_{M}x{N}_rank{K}",
        "value": round(per * 1e3, 3), "unit": "ms",
        "precision": PRECISION, "synth": SYNTH,
        "err_vs_iid_floor": round(e / floor, 4),
    }))


if __name__ == "__main__":
    main()
