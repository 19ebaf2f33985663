"""Quick TPU probe: device info, H2D relay bandwidth, GEMM roofline.

Measures what the streaming north-star benchmark needs to be sized
against: sustained host->device panel bandwidth through the relay and
achievable MXU TFLOP/s per precision.
"""

import sys
import time

import numpy as np


def log(msg):
    print(f"[probe] {msg}", file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    devs = jax.devices()
    log(f"devices: {devs}")
    dev = devs[0]

    # --- H2D bandwidth: successive panel puts of increasing size ---
    for mb in (16, 64, 256):
        n = mb * (1 << 20) // 4
        host = np.random.default_rng(0).standard_normal(n).astype(np.float32)
        t0 = time.perf_counter()
        x = jax.device_put(host, dev)
        x.block_until_ready()
        # force completion: block_until_ready can return before the
        # transfer lands on relay transports — fetch one element back
        np.asarray(jax.device_get(x[:1]))
        dt = time.perf_counter() - t0
        log(f"H2D {mb} MB: {dt:.3f}s = {mb / dt:.1f} MB/s")
        del x

    # --- D2H ---
    x = jnp.zeros((64 * (1 << 20) // 4,), jnp.float32)
    x.block_until_ready()
    t0 = time.perf_counter()
    np.asarray(x)
    dt = time.perf_counter() - t0
    log(f"D2H 64 MB: {dt:.3f}s = {64 / dt:.1f} MB/s")

    # --- on-device PRNG gen speed (panel synthesis for the 100k bench) ---
    @jax.jit
    def gen(seed):
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed)
        return jax.random.normal(key, (2048, 16384), jnp.float32)

    gen(0).block_until_ready()
    t0 = time.perf_counter()
    for i in range(1, 9):
        y = gen(i)
    y.block_until_ready()
    dt = (time.perf_counter() - t0) / 8
    gb = 2048 * 16384 * 4 / 1e9
    log(f"threefry normal gen: {gb / dt:.1f} GB/s of f32 normals")

    # --- GEMM roofline per precision (8192^2 x 144) ---
    a = jax.random.normal(jax.random.PRNGKey(1), (8192, 8192), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(2), (8192, 144), jnp.float32)
    a.block_until_ready(); b.block_until_ready()
    from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import _PRECISIONS

    for prec in ("highest", "high", "default"):
        p = _PRECISIONS[prec]

        @jax.jit
        def mm(x, y, p=p):
            return jnp.matmul(x, y, precision=p)

        mm(a, b).block_until_ready()
        # chain to amortize relay RTT
        t0 = time.perf_counter()
        out = b
        for _ in range(20):
            out = mm(a, out)
        out.block_until_ready()
        t20 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = b
        for _ in range(4):
            out = mm(a, out)
        out.block_until_ready()
        t4 = time.perf_counter() - t0
        per = (t20 - t4) / 16
        fl = 2 * 8192 * 8192 * 144
        log(f"GEMM 8192^2x144 {prec}: {per * 1e3:.3f} ms = {fl / per / 1e12:.1f} TFLOP/s")

    # bf16 end-to-end
    ab = a.astype(jnp.bfloat16); bb = b.astype(jnp.bfloat16)

    @jax.jit
    def mmb(x, y):
        return jnp.matmul(x, y, preferred_element_type=jnp.bfloat16)

    mmb(ab, bb).block_until_ready()
    t0 = time.perf_counter()
    out = bb
    for _ in range(20):
        out = mmb(ab, out)
    out.block_until_ready()
    t20 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = bb
    for _ in range(4):
        out = mmb(ab, out)
    out.block_until_ready()
    t4 = time.perf_counter() - t0
    per = (t20 - t4) / 16
    fl = 2 * 8192 * 8192 * 144
    log(f"GEMM 8192^2x144 bf16: {per * 1e3:.3f} ms = {fl / per / 1e12:.1f} TFLOP/s")

    # HBM bandwidth probe: big elementwise copy
    @jax.jit
    def cp(x):
        return x * 1.0000001

    cp(a).block_until_ready()
    t0 = time.perf_counter()
    out = a
    for _ in range(20):
        out = cp(out)
    out.block_until_ready()
    t20 = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = a
    for _ in range(4):
        out = cp(out)
    out.block_until_ready()
    t4 = time.perf_counter() - t0
    per = (t20 - t4) / 16
    gb = 2 * 8192 * 8192 * 4 / 1e9
    log(f"HBM stream (r+w): {gb / per:.0f} GB/s")

    log("probe done")


if __name__ == "__main__":
    main()
