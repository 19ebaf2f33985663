#!/bin/bash
# Final round-2 sweep re-measure on a QUIET host (chain clocks are
# host-timestamped; any concurrent load corrupts the slope — CLAUDE.md
# timing rules).  Restores the 32768 rows dropped by the previous pass
# and replaces a contention-corrupted production row.  Compiles are
# cached from earlier passes except the 32768 pre-bound callables.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384,32768 \
    --ranks 64,128 --method eigh --precision highest \
    --out bench_results/scale_sweep.csv \
    > /tmp/sweep_final_highest.log 2>&1

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384,32768 \
    --ranks 64,128 --method eigh --precision default --reorth half \
    --interior-qr robust1 \
    --out bench_results/scale_sweep_production.csv \
    > /tmp/sweep_final_default.log 2>&1

echo "final sweeps done"
