"""Timing / profiling harness.

The reference instruments with std::chrono wall-clock prints around each
phase (tests/rSVD_test.cpp:60-75) plus gprof via ``make profile``
(Makefile:45-47).  The TPU equivalents here are: a `block_until_ready`-aware
timer, a phase-timer registry that exports the reference's CSV timing
protocol (rSVD_test2.cpp:58-71; results/test02/time_*.csv), and wrappers
over `jax.profiler` for XLA-level traces.
"""

from __future__ import annotations

import contextlib
import csv
import os
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax


def _sync(x):
    try:
        jax.block_until_ready(x)
    except Exception:
        pass
    return x


def timeit(fn, *args, iters: int = 1, warmup: int = 1, **kwargs):
    """Time a JAX function with compile warmup; returns (best_seconds, result)."""
    result = None
    for _ in range(max(warmup, 0)):
        result = _sync(fn(*args, **kwargs))
    best = float("inf")
    for _ in range(max(iters, 1)):
        t0 = time.perf_counter()
        result = _sync(fn(*args, **kwargs))
        best = min(best, time.perf_counter() - t0)
    return best, result


@dataclass
class PhaseTimer:
    """Accumulates named phase timings; exports the reference CSV schema."""

    phases: Dict[str, List[float]] = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                _sync(sync)
            self.phases.setdefault(name, []).append(time.perf_counter() - t0)

    def total_ms(self, name: str) -> float:
        return 1e3 * sum(self.phases.get(name, []))

    def avg_us(self, name: str) -> float:
        xs = self.phases.get(name, [])
        return 1e6 * sum(xs) / len(xs) if xs else 0.0

    def write_csv(self, path: str, extra_rows: Optional[List[dict]] = None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["phase", "total_ms", "avg_us", "count"])
            for name, xs in self.phases.items():
                w.writerow([name, f"{1e3 * sum(xs):.3f}",
                            f"{1e6 * sum(xs) / len(xs):.3f}", len(xs)])
            if extra_rows:
                w.writerow([])
                keys = list(extra_rows[0].keys())
                w.writerow(keys)
                for row in extra_rows:
                    w.writerow([row[k] for k in keys])


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/rsvd_trace"):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def matmul_gflops(m: int, n: int, k: int, seconds: float) -> float:
    return 2.0 * m * n * k / seconds / 1e9


def rsvd_flops(m: int, n: int, l: int, q: int) -> float:
    """FLOP count of the dense rSVD pipeline (sketch + q power rounds +
    B-projection + QR work), used for the GFLOP/s benchmark metrics."""
    sketch = 2.0 * m * n * l
    power = q * 2 * (2.0 * m * n * l)     # A^T Q and A Z per round
    proj = 2.0 * m * n * l                # B = Q^T A
    qr = (2 * q + 1) * 2.0 * m * l * l    # CholeskyQR-ish cost per orthonormalization
    return sketch + power + proj + qr
