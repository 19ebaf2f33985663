#!/bin/bash
# Re-measure the production-sweep rows that were timed while the CPU test
# suite loaded the host (chain clocks are host-timestamped; contention
# corrupts them — CLAUDE.md timing rules).  Compiles are already cached
# from the first pass, so this is measurement-only.  Writes to /tmp; the
# caller merges rows into bench_results/scale_sweep_production.csv.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

python benchmarks/scale_sweep.py --sizes 2048,4096,8192 \
    --ranks 64,128 --method eigh --precision default --reorth half \
    --interior-qr robust1 --out /tmp/redo_quiet.csv \
    > /tmp/redo_quiet.log 2>&1

echo "redo done"
