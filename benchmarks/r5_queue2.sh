#!/bin/sh
# Round-5 queue 2: frame-level arms — headline knob combos, deferred-NEE
# mixed routing re-A/B (VERDICT r5 item 4), small-wave unroll record
# (ADVICE r4), and the HBM strand wave-level A/B (stream rescue,
# VERDICT r5 item 6). One process per arm, NOTHING else running.
# Usage: sh benchmarks/r5_queue2.sh > /tmp/r5q2.log 2>&1
cd /root/repo

gate() {
  for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
    timeout 90 python benchmarks/tpu_gate.py >/dev/null 2>&1 && return 0
    echo "[gate] tunnel not ready, retry $i"
    sleep 30
  done
  echo "[gate] tunnel dead after 12 tries"
  return 1
}

arm() {
  echo "=== $* ==="
  gate || return 1
  timeout 1800 "$@" && return 0
  echo "[arm] failed/wedged, one retry: $*"
  gate || return 1
  timeout 1800 "$@"
}

set -x
H="python benchmarks/headline_ab.py --repeats 3 --rays 9338000"

# headline frame: r4-default control (the r5 clean frame number), an
# earlier-drain flush sweep (cheap best-t-shrink lever), and the
# deferred-NEE mixed routing re-A/B (VERDICT item 4)
arm $H
RAYTPU_STRAND_FLUSH=0.5 arm $H
RAYTPU_BOUNCE_BACKEND=mixed arm $H

# small-wave unroll record (ADVICE r4: unroll 4 default was only
# headline-measured): pbr + multi at unroll 1 vs 4
arm python benchmarks/headline_ab.py --scene pbr --inner 8 --repeats 3
RAYTPU_STRAND_UNROLL=1 arm python benchmarks/headline_ab.py --scene pbr \
  --inner 8 --repeats 3
arm python benchmarks/headline_ab.py --scene multi --inner 8 --repeats 3
RAYTPU_STRAND_UNROLL=1 arm python benchmarks/headline_ab.py \
  --scene multi --inner 8 --repeats 3

# (HBM strand wave-level arms measured in queue 1b: b1c 32.50 b2c 24.55
# b2s 11.49 b3c 15.14 — 1.9x resident; --check green)
