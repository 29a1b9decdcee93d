#!/bin/sh
# Round-4 queue 4: frame-measure the check-every-K unroll and the fused
# wave mode on the headline config. Control = the 675 ms default combo
# (compact wave mode + pipe + no-guard are the measured defaults now).
# One process per arm, NOTHING else running (1-vCPU box).
# Usage: sh benchmarks/r4_queue4.sh > /tmp/r4q4.log 2>&1
set -x
cd /root/repo

R="--tris 250000 --rays 8.91e6 --repeats 3"

echo "=== arm: control (current defaults) ==="
python benchmarks/headline_ab.py $R

echo "=== arm: UNROLL=4 ==="
RAYTPU_STRAND_UNROLL=4 python benchmarks/headline_ab.py $R

echo "=== arm: UNROLL=8 ==="
RAYTPU_STRAND_UNROLL=8 python benchmarks/headline_ab.py $R

echo "=== arm: WAVE_MODE=fused ==="
RAYTPU_WAVE_MODE=fused python benchmarks/headline_ab.py $R

echo "=== arm: fused + UNROLL=4 ==="
RAYTPU_WAVE_MODE=fused RAYTPU_STRAND_UNROLL=4 \
    python benchmarks/headline_ab.py $R
