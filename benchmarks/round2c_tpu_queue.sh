#!/bin/bash
# Round-2 continuation queue (prior relaunch died with the session).
# sketch_validate already completed (bench_results/sketch_compare_validated.csv);
# re-run the phase profiles + engine table with the dedup-proof chain_time,
# then the profiler artifact and the final headline bench.
# Single TPU session — never run two default-env pythons concurrently.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

# 1. phase profiles with distinct-input chains (headline + 16384 dip)
python benchmarks/phase_profile.py > /tmp/phase4096.log 2>&1
python benchmarks/phase_profile.py 16384 16384 64 > /tmp/phase16384.log 2>&1

# 2. SVD engine table (auto thresholds; VERDICT item 5)
python benchmarks/svd_engines.py --sizes 512,1024,2048,4096 \
    > /tmp/svd_engines.log 2>&1

# 3. committed profiler evidence (reference `make profile` role)
python tools/profile_rsvd.py > bench_results/profile_output.txt 2>&1

# 4. final headline
python bench.py > /tmp/bench_final.log 2>&1
echo "queue done"
