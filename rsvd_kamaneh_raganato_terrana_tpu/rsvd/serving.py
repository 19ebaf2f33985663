"""The serving preset: the measured-best low-latency factorization
stack in one call.

Round-5 ladder at 4096^2 k=64, same session, escalated-spread protocol
(bench_results/scale_ondevice.csv):

    default pipeline (project/eigh/robust1)        0.557 ms
    finish='rowspace_utv' + cholqr1 everywhere     0.212 ms
    + int8 stage-A storage (pre-quantized)         0.175 ms
    + interior_qr='none' (flat spectra only)       0.161 ms

with reconstruction-error ratios <= 1.0016 at every rung on
truncation-dominated operands, and HBM-bound sizes HALVED by the int8
reads (8192^2 0.473 ms, 32768^2 rank-128 8.68 ms).  This module
packages that stack with its guard rails:

- the operand is quantized ONCE (`prepare_operand`) and reused across
  calls — quantizing per call re-reads f32 A and erases the HBM win;
- every factorization is checked post-hoc by
  :func:`rsvd.diagnostics.factor_health` (the serving configs have NO
  rank-deficiency fallback: cholqr1 NaNs, docs/PARITY.md contract
  table) — one 5-element fetch, off the device-side critical path;
- monitoring that needs true singular values calls
  :func:`rsvd.utv.utv_rescore` on the returned factors (the UTV
  weights track sigma only on gapped spectra).

Use the plain :func:`rsvd.driver.rsvd` (robust QR, project finish)
whenever full accuracy contracts matter more than latency.
"""

from __future__ import annotations

import warnings
from typing import Optional, Tuple

import jax

from rsvd_kamaneh_raganato_terrana_tpu.rsvd.diagnostics import factor_health
from rsvd_kamaneh_raganato_terrana_tpu.rsvd.driver import (
    Int8Stored,
    quantize_int8_rows,
    rsvd,
)

#: quantize A once for repeated serving calls (alias, re-exported)
prepare_operand = quantize_int8_rows


def rsvd_serving(
    a,
    k: int,
    p: int = 16,
    q: int = 2,
    seed: int = 0,
    interior_qr: str = "cholqr1",
    storage: str = "int8",
    on_unhealthy: str = "raise",
    health_tol: float = 1e-2,
) -> Tuple[jax.Array, jax.Array, jax.Array, Optional[dict]]:
    """Factor A with the measured-best serving stack; returns
    (U, s, V, health).

    ``a``: dense array or a pre-quantized :class:`Int8Stored` from
    :func:`prepare_operand` (always pre-quantize when serving the same
    A repeatedly).  ``storage``: 'int8' (default) | 'bf16' | 'default'
    — the stage-A read mode.  ``interior_qr``: 'cholqr1' (default) |
    'none' (flat spectra only — power_refine docstring) | any
    qr_reduced method.  ``on_unhealthy``: 'raise' | 'warn' | 'ignore'
    — what to do when :func:`factor_health` trips (NaNs from a
    rank-deficient operand, short columns, ascending weights); the
    health dict is returned either way (None when 'ignore' skips the
    check entirely).

    Contract reminders (driver docstring has the full gates): s are
    decomposition WEIGHTS (exact energy, sigma-tracking needs gapped
    spectra — `utv_rescore` recovers true sigma off-path), U is
    unit-column, V orthonormal.
    """
    if on_unhealthy not in ("raise", "warn", "ignore"):
        raise ValueError(f"unknown on_unhealthy {on_unhealthy!r}")
    operand = a
    if storage == "int8" and not isinstance(a, Int8Stored):
        operand = quantize_int8_rows(a)
    u, s, v = rsvd(
        operand, k=k, p=p, q=q, seed=seed, method="eigh",
        precision=("int8" if storage == "int8" else storage),
        reorth="half", qr_method="cholqr1", interior_qr=interior_qr,
        finish="rowspace_utv",
    )
    health = None
    if on_unhealthy != "ignore":
        health = factor_health(u, s, v, tol=health_tol)
        if not health["ok"]:
            msg = ("rsvd_serving produced unhealthy factors "
                   f"({health}): the serving stack has no "
                   "rank-deficiency fallback — use rsvd(..., "
                   "qr_method='robust') for this operand")
            if on_unhealthy == "raise":
                raise FloatingPointError(msg)
            warnings.warn(msg, stacklevel=2)
    return u, s, v, health
