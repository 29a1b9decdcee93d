#!/bin/sh
# Round-5 queue 3: the beyond-VMEM stream scene end-to-end (VERDICT r5
# item 6 done-criterion: stream >= 3 Mrays/s, warmup < 60 s). The first
# arm pays the 2.9M-tri pack build (host, cached afterwards).
# Usage: sh benchmarks/r5_queue3.sh > /tmp/r5q3.log 2>&1
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
  timeout 2400 "$@" && return 0
  echo "[arm] failed/wedged, one retry: $*"
  gate || return 1
  timeout 2400 "$@"
}

set -x
# end-to-end stream config through bench.py (the artifact harness):
# auto-routes to the HBM strand path now
RAYTPU_BENCH_ONLY=stream arm python bench.py
# binned comparison arm (the old stream route), same harness
RAYTPU_BENCH_ONLY=stream RAYTPU_STREAM_BINNED=1 arm python bench.py
