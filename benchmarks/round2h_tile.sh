#!/bin/bash
# Tile-parallel parity measurement (report section 5.4) on TPU, after
# the engines fill.  Single TPU session — one default-env python at a
# time.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "engines fill done" /tmp/engines_fill2_wrap.log 2>/dev/null; do
    sleep 30
done

python benchmarks/tile_parallel.py > /tmp/tile_parallel.log 2>&1

echo "tile done"
