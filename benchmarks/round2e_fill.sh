#!/bin/bash
# Follow-on to round2d_calibration.sh: (a) single-dispatch fori_loop
# ground truth for the new default-precision headline config, (b) fill
# the two svd_engines cells lost to the TPU device fault at 4096
# (cond 1e3/1e6; the CSV now appends incrementally so a repeat fault
# loses nothing).  Waits for calibration to finish — never two
# default-env pythons at once.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "calibration done" /tmp/calib.log 2>/dev/null; do
    sleep 30
done

LT_K=64 LT_P=16 LT_Q=2 LT_PRECISION=default \
    python benchmarks/loop_truth.py 4096 gaussian > /tmp/loop4096_default.log 2>&1

python benchmarks/svd_engines.py --sizes 4096 --conds 1e3,1e6 \
    > /tmp/svd_engines_fill.log 2>&1

echo "fill done"
