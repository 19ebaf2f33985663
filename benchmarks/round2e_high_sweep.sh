#!/bin/bash
# Third queue stage: bench-default-config (high precision, reorth=half,
# robust1 interior) scale sweep at large sizes — the committed sweep only
# covers precision=highest/full-reorth.  Waits for round2d calibration.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "calibration done" /tmp/calib.log 2>/dev/null; do
    sleep 30
done

python benchmarks/scale_sweep.py --sizes 4096,8192,16384,32768 \
    --ranks 64,128 --precision high --reorth half --interior-qr robust1 \
    --append > /tmp/sweep_high.log 2>&1

echo "high sweep done"
