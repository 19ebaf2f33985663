#!/bin/bash
# Re-run the profiler artifact on a QUIET host (the 16:37 run raced the
# CPU test suite; the chain clock is host-timestamped, and contention
# produced readings below the fori_loop ground floor).  Gated on the
# prewarm finishing — last step of the round-2 TPU chain.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "prewarm done" /tmp/prewarm_wrap.log 2>/dev/null; do
    sleep 30
done

python tools/profile_rsvd.py > bench_results/profile_output.txt 2>&1

echo "quiet profile done"
