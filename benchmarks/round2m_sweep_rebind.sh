#!/bin/bash
# Clean scale-sweep re-measure with the pre-bound-callable protocol
# (scale_sweep.py now jit-binds rsvd_core per configuration, bench.py
# style, instead of paying the rsvd() wrapper's static-kwarg dispatch
# per chain iteration).  Run with a QUIET host — chain clocks are
# host-timestamped.  Compiles are cached from earlier passes.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384 \
    --ranks 64,128 --method eigh --precision default --reorth half \
    --interior-qr robust1 \
    --out bench_results/scale_sweep_production.csv \
    > /tmp/sweep_rebind_default.log 2>&1

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384 \
    --ranks 64,128 --method eigh --precision highest \
    --out bench_results/scale_sweep.csv \
    > /tmp/sweep_rebind_highest.log 2>&1

echo "rebind sweeps done"
