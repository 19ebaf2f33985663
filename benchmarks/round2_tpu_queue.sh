#!/bin/bash
# Round-2 TPU measurement queue (run AFTER the streaming bench sequence;
# single TPU session — never run two default-env pythons concurrently).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

# 1. fused-vs-gaussian sketch comparison (VERDICT round-1 item 2)
python benchmarks/scale_sweep.py --sizes 8192,16384,32768 --ranks 128 \
    --precision high --reorth half --interior-qr robust1 \
    --sketch gaussian --out bench_results/sketch_compare.csv \
    > /tmp/sweep_gauss.log 2>&1
python benchmarks/scale_sweep.py --sizes 8192,16384,32768 --ranks 128 \
    --precision high --reorth half --interior-qr robust1 \
    --sketch fused --append --out bench_results/sketch_compare.csv \
    > /tmp/sweep_fused.log 2>&1

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
