"""The shared dispatch-chain timing protocol (this repo's honest clock).

Three transport hazards shape every benchmark here (details in
docs/ARCHITECTURE.md "Performance methodology"):

1. Single-shot timing through the TPU relay measures the ~30 ms
   round-trip, not compute -> time CHAINS of dispatches at two lengths
   and report the slope.
2. ``block_until_ready`` can return before remote execution completes ->
   every chain ends with a 1-element device->host fetch (execution is
   in-order per device, and the fetch RTT cancels in the slope).
3. Re-dispatching an identical (program, input) pair can be deduplicated
   by caching transports, producing impossible throughput -> the chain
   cycles >= 2 DISTINCT argument tuples.

Calibrated against benchmarks/loop_truth.py, which runs the whole chain
inside one jitted ``fori_loop`` with a data-dependent carry — a single
dispatch, so no chain-level artifact is possible.
"""

import time

import numpy as np


def chain_delta(fn, args_list, n_small=4, n_large=20, reps=3):
    """Per-dispatch seconds for ``fn(*args)`` measured by the protocol
    above.  ``args_list`` holds >= 2 distinct argument tuples cycled
    through the chain (hazard 3)."""
    import jax
    import jax.numpy as jnp

    args_list = list(args_list)
    assert len(args_list) >= 2, \
        "need >= 2 distinct argument tuples (dedup defense)"

    def force(out):
        x = out
        while isinstance(x, (tuple, list)):
            x = x[-1]
        np.asarray(jax.device_get(jnp.ravel(x)[:1]))

    def chain(n):
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = fn(*args_list[i % len(args_list)])
        force(out)
        return time.perf_counter() - t0

    chain(2)  # warm the dispatch path
    t_small = min(chain(n_small) for _ in range(reps))
    t_large = min(chain(n_large) for _ in range(reps))
    return max((t_large - t_small) / (n_large - n_small), 1e-9)


def scaled_variants(args, factor=1.0001):
    """Two-variant ``args_list`` that scales the first operand: preserves
    the spectrum shape (identical work) while defeating dedup."""
    import jax.numpy as jnp

    first = args[0]
    return [tuple(args),
            (first * jnp.asarray(factor, first.dtype),) + tuple(args[1:])]


def migrate_csv(path, fields, renames=None):
    """If an existing CSV's header differs from ``fields``, rewrite it in
    place under the new schema (renamed columns copied via ``renames``
    {new: old}, missing columns blanked) so appends never produce
    misaligned rows.  Leading ``#`` provenance-comment lines are skipped
    when locating the header and preserved on rewrite.  No-op when the
    file is absent or already current."""
    import csv
    import io
    import os

    if not os.path.exists(path):
        return
    renames = renames or {}
    with open(path, newline="") as f:
        lines = f.readlines()
    n_comments = 0
    while n_comments < len(lines) and lines[n_comments].startswith("#"):
        n_comments += 1
    rd = csv.DictReader(io.StringIO("".join(lines[n_comments:])))
    if rd.fieldnames == fields:
        return
    old = list(rd)
    with open(path, "w", newline="") as g:
        g.writelines(lines[:n_comments])
        w = csv.DictWriter(g, fieldnames=fields, extrasaction="ignore")
        w.writeheader()
        for r in old:
            w.writerow({k: r.get(k, r.get(renames.get(k, k), ""))
                        for k in fields})
