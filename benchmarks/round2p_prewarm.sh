#!/bin/bash
# Post-relay-recovery queue: re-prewarm the driver's round-end surfaces
# (bench.py default config + entry() production config) and record one
# fresh headline reading.  Library edits this session did not touch
# bench.py's traced path (rsvd_with_omega / generate_omega unchanged),
# so remote compile caches should hit; run ONLY with a quiet host.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

timeout 1800 python __graft_entry__.py > /tmp/entry_prewarm2.log 2>&1
echo "entry rc=$?"

timeout 1800 python bench.py > /tmp/bench_r2p.json 2>/tmp/bench_r2p.log
echo "bench rc=$?"
cat /tmp/bench_r2p.json

echo "prewarm done"
