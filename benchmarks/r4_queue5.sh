#!/bin/sh
# Round-4 queue 5: secondary configs through bench.py ITSELF (the
# driver's harness — headline_ab's --inner 8 amortisation differs, so
# queue-3 numbers are not comparable to BENCH_rNN lines). Re-measure the
# r3 pbr dip (106.5 -> 95.4) on r4 code, then probe the two knobs that
# plausibly move small-wave configs: guard drop and forced compact mode.
# One process per arm, NOTHING else running (1-vCPU box).
# Usage: sh benchmarks/r4_queue5.sh > /tmp/r4q5.log 2>&1
set -x
cd /root/repo

echo "=== pbr control (r4 defaults) ==="
RAYTPU_BENCH_ONLY=pbr python bench.py
echo "=== pbr NO_GUARD=1 ==="
RAYTPU_BENCH_ONLY=pbr RAYTPU_NO_GUARD=1 python bench.py
echo "=== pbr forced compact ==="
RAYTPU_BENCH_ONLY=pbr RAYTPU_WAVE_MODE=compact python bench.py

echo "=== cube control ==="
RAYTPU_BENCH_ONLY="cube path" python bench.py
echo "=== cube NO_GUARD=1 ==="
RAYTPU_BENCH_ONLY="cube path" RAYTPU_NO_GUARD=1 python bench.py
echo "=== cube forced compact ==="
RAYTPU_BENCH_ONLY="cube path" RAYTPU_WAVE_MODE=compact python bench.py

echo "=== multi control (unroll-4 default) ==="
RAYTPU_BENCH_ONLY=multi python bench.py
echo "=== multi UNROLL=1 (old default) ==="
RAYTPU_BENCH_ONLY=multi RAYTPU_STRAND_UNROLL=1 python bench.py

echo "=== headline through bench.py (new fused+unroll defaults) ==="
RAYTPU_BENCH_ONLY=atrium python bench.py
