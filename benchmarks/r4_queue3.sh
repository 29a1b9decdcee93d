#!/bin/sh
# Round-4 queue 3: secondary BASELINE configs (VERDICT r3 item 4).
# pbr rides the pure packet path (88 slots, no strand tree) — the r3
# 106.5 -> 95.4 regression cannot be a strand/sort knob; re-measure on
# r4 code, then probe the packet vs brute arms. multi rides sorted
# strands: confirm the new defaults don't regress it.
# Usage: sh benchmarks/r4_queue3.sh > /tmp/r4q3.log 2>&1
set -x
cd /root/repo

echo "=== pbr control (rays: 1.25M) ==="
python benchmarks/headline_ab.py --scene pbr --rays 1.25e6 --repeats 3 --inner 8

echo "=== pbr brute intersector ==="
python benchmarks/headline_ab.py --scene pbr --rays 1.25e6 --repeats 3 --inner 8 --intersector brute

echo "=== cube control (rays: 1.51M) ==="
python benchmarks/headline_ab.py --scene cube --rays 1.51e6 --repeats 3 --inner 8

echo "=== multi control (rays: 0.83M) ==="
python benchmarks/headline_ab.py --scene multi --rays 0.83e6 --repeats 3 --inner 8

echo "=== multi compact+pipe ==="
RAYTPU_WAVE_MODE=compact RAYTPU_STRAND_PIPE=1 \
    python benchmarks/headline_ab.py --scene multi --rays 0.83e6 --repeats 3 --inner 8
