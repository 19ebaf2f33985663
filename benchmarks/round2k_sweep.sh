#!/bin/bash
# Production-config scale sweep (mixed-precision range finder): refresh
# the in-HBM headline table with the shipping configuration.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384 \
    --ranks 64,128 --method eigh --precision default --reorth half \
    --interior-qr robust1 \
    --out bench_results/scale_sweep_production.csv \
    > /tmp/sweep_default.log 2>&1

python benchmarks/scale_sweep.py --sizes 32768 \
    --ranks 128 --method eigh --precision default --reorth half \
    --interior-qr robust1 --append \
    --out bench_results/scale_sweep_production.csv \
    >> /tmp/sweep_default.log 2>&1

echo "sweep done"
