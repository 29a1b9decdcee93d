#!/bin/sh
# Round-4 measurement queue 1: frame-measure the built-but-off knobs
# (VERDICT r3 item 1). One process per arm; headline atrium frame.
# Usage: sh benchmarks/r4_queue1.sh > /tmp/r4q1.log 2>&1
set -x
cd /root/repo

R="--tris 250000 --rays 8.91e6 --repeats 3"

echo "=== arm: control (r3 defaults) ==="
python benchmarks/headline_ab.py $R

echo "=== arm: NO_GUARD ==="
RAYTPU_NO_GUARD=1 python benchmarks/headline_ab.py $R

echo "=== arm: COMPACT ==="
RAYTPU_COMPACT=1 python benchmarks/headline_ab.py $R

echo "=== arm: PIPE ==="
RAYTPU_STRAND_PIPE=1 python benchmarks/headline_ab.py $R

echo "=== arm: NO_GUARD+COMPACT ==="
RAYTPU_NO_GUARD=1 RAYTPU_COMPACT=1 python benchmarks/headline_ab.py $R

echo "=== arm: NO_GUARD+COMPACT+PIPE ==="
RAYTPU_NO_GUARD=1 RAYTPU_COMPACT=1 RAYTPU_STRAND_PIPE=1 \
    python benchmarks/headline_ab.py $R

echo "=== captured-wave pipe A/B (check + timing) ==="
python benchmarks/strand_ab.py --pipe --check
python benchmarks/strand_ab.py
