#!/bin/sh
# Round-4 queue 2: frame-measure the live-prefix compact wave mode and
# the pipelined strand fetch on the headline config (and re-measure the
# control on the refactored engine so the A/B base is honest).
# Usage: sh benchmarks/r4_queue2.sh > /tmp/r4q2.log 2>&1
set -x
cd /root/repo

R="--tris 250000 --rays 8.91e6 --repeats 3"

echo "=== arm: control (refactored engine, query mode) ==="
python benchmarks/headline_ab.py $R

echo "=== arm: WAVE_MODE=compact ==="
RAYTPU_WAVE_MODE=compact python benchmarks/headline_ab.py $R

echo "=== arm: WAVE_MODE=compact + PIPE ==="
RAYTPU_WAVE_MODE=compact RAYTPU_STRAND_PIPE=1 \
    python benchmarks/headline_ab.py $R

echo "=== arm: PIPE alone (query mode) ==="
RAYTPU_STRAND_PIPE=1 python benchmarks/headline_ab.py $R

echo "=== arm: NO_GUARD alone (query mode) ==="
RAYTPU_NO_GUARD=1 python benchmarks/headline_ab.py $R

echo "=== arm: query-prefix tiers alone (RAYTPU_COMPACT=1) ==="
RAYTPU_COMPACT=1 python benchmarks/headline_ab.py $R

echo "=== arm: compact + PIPE + NO_GUARD ==="
RAYTPU_WAVE_MODE=compact RAYTPU_STRAND_PIPE=1 RAYTPU_NO_GUARD=1 \
    python benchmarks/headline_ab.py $R
