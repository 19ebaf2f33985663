#!/bin/bash
# Fill the 4096 cond>=1e3 svd_engines cells with the fast engines only
# (jacobi_block reproducibly faults the relay session at this config and
# is skipped by the bench itself).  Waits for the profiler regen.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "profile done" /tmp/profile_regen.log 2>/dev/null; do
    sleep 30
done

python benchmarks/svd_engines.py --sizes 4096 --conds 1e3,1e6 \
    --engines gram_eigh,xla_svd > /tmp/svd_engines_fill2.log 2>&1

echo "engines fill done"
