#!/bin/bash
# Round-2 continuation queue (prior queue died mid-fused-sweep).
# Single TPU session — never run two default-env pythons concurrently.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

# 1. validated fused-vs-gaussian comparison (distinct seeds per dispatch,
#    alternating inputs <=16384) — the earn-or-kill evidence.
python benchmarks/sketch_validate.py 8192,16384,32768 \
    > /tmp/sketch_val.log 2>&1

# 2. phase profiles with the fetch-forced clocks (headline + 16384 dip)
python benchmarks/phase_profile.py > /tmp/phase4096.log 2>&1
python benchmarks/phase_profile.py 16384 16384 64 > /tmp/phase16384.log 2>&1

# 3. SVD engine table (auto thresholds; VERDICT item 5)
python benchmarks/svd_engines.py --sizes 512,1024,2048,4096 \
    > /tmp/svd_engines.log 2>&1

# 4. committed profiler evidence (reference `make profile` role)
python tools/profile_rsvd.py > bench_results/profile_output.txt 2>&1

# 5. final headline
python bench.py > /tmp/bench_final.log 2>&1
echo "queue done"
