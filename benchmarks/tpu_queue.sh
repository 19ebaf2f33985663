#!/bin/bash
# Sequential TPU measurement queue (benchmarks/README.md rules 1-3):
# exactly ONE default-env python alive at a time, each step under
# timeout, everything logged.  Usage:
#   benchmarks/tpu_queue.sh queue.txt          # one command per line
#   benchmarks/tpu_queue.sh -c "cmd1" -c "cmd2"
# Env: QUEUE_TIMEOUT (seconds per step, default 2400),
#      QUEUE_LOG (default bench_results/queue_<name>.log)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
TIMEOUT="${QUEUE_TIMEOUT:-2400}"

declare -a CMDS=()
if [ "${1:-}" = "-c" ]; then
  while [ "${1:-}" = "-c" ]; do CMDS+=("$2"); shift 2; done
  LOG="${QUEUE_LOG:-bench_results/queue_inline.log}"
else
  QFILE="$1"
  LOG="${QUEUE_LOG:-bench_results/queue_$(basename "$QFILE" .txt).log}"
  while IFS= read -r line; do
    case "$line" in ''|'#'*) continue;; esac
    CMDS+=("$line")
  done < "$QFILE"
fi

for cmd in "${CMDS[@]}"; do
  echo "=== $(date -u +%H:%M:%S) $cmd ===" | tee -a "$LOG" >&2
  timeout "$TIMEOUT" bash -c "$cmd" >> "$LOG" 2>&1
  rc=$?
  echo "--- exit $rc ---" | tee -a "$LOG" >&2
  # a killed/faulted step must not cascade: continue the queue (the
  # relay survives step-level timeouts; only un-timeouted giants kill it)
done
