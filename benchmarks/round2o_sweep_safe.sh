#!/bin/bash
# Round-2 sweep re-measure, wedge-safe edition.  The 32768 k=64 cell's
# first-ever dispatch (cold compile + 4 GiB H2D in one shot) exceeded the
# relay transport watchdog and wedged its process for 65+ min (the sticky
# in-process fault documented for jacobi_block 4096); every other cell is
# compile-cached.  So: sweep 2048-16384 unguarded, then append the one
# 32768 cell that has compiled before (k=128) under a hard timeout —
# losing that row beats losing the session.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384 \
    --ranks 64,128 --method eigh --precision highest \
    --out bench_results/scale_sweep.csv \
    > /tmp/sweep_safe_highest.log 2>&1

python benchmarks/scale_sweep.py --sizes 2048,4096,8192,16384 \
    --ranks 64,128 --method eigh --precision default --reorth half \
    --interior-qr robust1 \
    --out bench_results/scale_sweep_production.csv \
    > /tmp/sweep_safe_default.log 2>&1

timeout 2400 python benchmarks/scale_sweep.py --sizes 32768 --ranks 128 \
    --method eigh --precision highest --append \
    --out bench_results/scale_sweep.csv \
    > /tmp/sweep_safe_32k.log 2>&1
echo "32k highest rc=$?"

echo "safe sweeps done"
