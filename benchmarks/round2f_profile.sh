#!/bin/bash
# Regenerate the committed profiler artifact with the improved header +
# production-config row (tools/profile_rsvd.py), after round2e_fill.sh
# finishes.  Single TPU session — never two default-env pythons at once.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "fill done" /tmp/fill.log 2>/dev/null; do
    sleep 30
done

python tools/profile_rsvd.py > bench_results/profile_output.txt 2>&1

echo "profile done"
