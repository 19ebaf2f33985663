"""Bisect the polar_fused NaN inside the Mosaic kernel: check the
in-kernel Gram, alpha, first-iteration W, and H separately."""
import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

from rsvd_kamaneh_raganato_terrana_tpu.linalg.polar import (  # noqa: E402
    ns_schedule,
)


def make_probe(stage: str, coeffs, l_pad=128):
    def kernel(y_ref, out_ref):
        f32 = jnp.float32
        y = y_ref[:]
        g = jax.lax.dot_general(y, y, (((0,), (0,)), ((), ())),
                                preferred_element_type=f32)
        if stage == "gram":
            out_ref[:] = g
            return
        alpha = jnp.sqrt(jnp.sum(g * g)) + jnp.float32(1e-30)
        gt = g * (1.0 / alpha)
        if stage == "gt":
            out_ref[:] = gt
            return
        row = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (l_pad, l_pad), 1)
        eye = (row == col).astype(f32)

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=f32)

        a0, b0, c0 = coeffs[0]
        h2 = dot(gt, gt)
        w = a0 * eye + b0 * gt + c0 * h2
        if stage == "w1":
            out_ref[:] = w
            return
        h = dot(gt, dot(w, w))
        if stage == "h1":
            out_ref[:] = h
            return
        for it, (a, b, c) in enumerate(coeffs[1:], start=2):
            h2 = dot(h, h)
            p = a * eye + b * h + c * h2
            w = dot(w, p)
            h = dot(h, dot(p, p))
            h = 0.5 * (h + h.T)
            if stage == f"h{it}":
                out_ref[:] = h
                return
        out_ref[:] = h

    return kernel


def main():
    print("devices:", jax.devices(), flush=True)
    coeffs, _ = ns_schedule(8, 1e-6)
    print("coeffs:", [tuple(round(x, 3) for x in c) for c in coeffs],
          flush=True)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((4096, 80)).astype(np.float32))
    y_pad = jnp.pad(y, ((0, 0), (0, 48)))

    g_ref = np.asarray(y.T @ y @ np.eye(80, dtype=np.float32))

    for stage in ("gram", "gt", "w1", "h1", "h2", "h4", "h8"):
        kern = make_probe(stage, coeffs)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
        )(y_pad)
        o = np.asarray(out)
        fin = np.isfinite(o).all()
        print(f"{stage}: finite={fin} max={np.abs(o).max() if fin else 'nan'}"
              f" diag_min={np.diag(o).min() if fin else 'nan'}", flush=True)
        if stage == "gram" and fin:
            print("   gram rel err vs host:",
                  np.abs(o[:80, :80] - g_ref).max() / np.abs(g_ref).max(),
                  "pad block max:", np.abs(o[80:, :]).max(), flush=True)


if __name__ == "__main__":
    main()
