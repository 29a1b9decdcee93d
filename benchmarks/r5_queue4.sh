#!/bin/sh
# Round-5 queue 4: flush-occupancy frontier (0.5 measured +4.7% on the
# headline: 564.5 -> 539.4 ms) — push lower + captured-wave confirm.
# Usage: sh benchmarks/r5_queue4.sh > /tmp/r5q4.log 2>&1
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
AB="python benchmarks/strand_ab.py --waves b1c b2c b2s b3c --repeats 5"

RAYTPU_STRAND_FLUSH=0.375 arm $H
RAYTPU_STRAND_FLUSH=0.25 arm $H
# wave-level decomposition of the flush winner
arm $AB --pipe --unroll 4 --flush 0.5
arm $AB --pipe --unroll 4 --flush 0.25
