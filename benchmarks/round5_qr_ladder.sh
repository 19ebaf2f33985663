#!/bin/bash
# Round-5 serving-QR ladder (VERDICT r4 item 2): fused/polar QR kernels
# vs the round-4 cholqr1 record at 4096^2 k=64, protocol v2, same session.
# Sequential: exactly ONE default-env python alive at a time (CLAUDE.md).
cd /root/repo
OUT=bench_results/round5_qr_ladder.jsonl
run() {
  echo "=== $* ===" >&2
  env "$@" timeout 2400 python bench.py >> "$OUT" 2>> "$OUT.log"
  echo "--- exit $? ---" >&2
}
# 1. round-4 record config reconfirm (same-session anchor)
run BENCH_FINISH=rowspace_utv BENCH_QR_METHOD=cholqr1 BENCH_INTERIOR_QR=cholqr1
# 2. fused single-kernel CholeskyQR everywhere (exact-parity speed test)
run BENCH_FINISH=rowspace_utv BENCH_QR_METHOD=cholqr1_fused BENCH_INTERIOR_QR=cholqr1_fused
# 3. polar interiors + fused-chol finals (deepest-cut config)
run BENCH_FINISH=rowspace_utv BENCH_QR_METHOD=cholqr1_fused BENCH_INTERIOR_QR=polar_fused
# 4. default headline with polar interiors (quality-free domain: eigh tail)
run BENCH_INTERIOR_QR=polar_fused
