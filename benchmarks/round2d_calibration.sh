#!/bin/bash
# Follow-on to round2c_tpu_queue.sh: single-dispatch fori_loop ground
# truth (benchmarks/loop_truth.py) for (a) the 4096^2 k=64 headline and
# (b) the disputed 16384^2 k=128 sketch row.  Waits for the running
# queue to finish first — never two default-env pythons at once.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "queue done" /tmp/queue3.log 2>/dev/null; do
    sleep 30
done

# headline calibration: same config as bench.py defaults
LT_K=64 LT_P=16 LT_Q=2 LT_PRECISION=high \
    python benchmarks/loop_truth.py 4096 gaussian > /tmp/loop4096.log 2>&1

# 16384^2 k=128: settles sketch_compare (10.7 ms) vs
# sketch_compare_validated (4.65 ms -> impossible 100 TFLOP/s)
LT_PRECISION=high \
    python benchmarks/loop_truth.py 16384 gaussian > /tmp/loop16384.log 2>&1

echo "calibration done"
