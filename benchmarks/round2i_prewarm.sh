#!/bin/bash
# End-of-round prewarm: compile-and-run the driver's entry check once on
# TPU so the remote compile cache is hot for the round-end harness run
# (cold compiles through the relay cost minutes).  Gated on the tile
# bench finishing.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:$PYTHONPATH"

while ! grep -q "tile done" /tmp/tile_wrap.log 2>/dev/null; do
    sleep 30
done

python __graft_entry__.py > /tmp/entry_prewarm.log 2>&1

echo "prewarm done"
