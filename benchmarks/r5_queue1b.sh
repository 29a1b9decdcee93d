#!/bin/sh
# Round-5 queue 1b: dual-interleave arms (the restructure after the
# cadence knobs measured flat — docs/PROFILE_r5.md queue 1) + HBM
# strand wave cost + hardware bit-identity checks.
# Usage: sh benchmarks/r5_queue1b.sh > /tmp/r5q1b.log 2>&1
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
  timeout 1200 "$@" && return 0
  echo "[arm] failed/wedged, one retry: $*"
  gate || return 1
  timeout 1200 "$@"
}

set -x
AB="python benchmarks/strand_ab.py --waves b1c b2c b2s b3c --repeats 5"

arm $AB --pipe --unroll 1 --dual
arm $AB --pipe --unroll 4 --dual
arm $AB --pipe --unroll 8 --dual
arm $AB --pipe --unroll 4 --dual --ctl-every 2 --flush-pop 2
arm python benchmarks/strand_ab.py --waves b1c b2c b2s --repeats 2 \
    --pipe --unroll 4 --dual --check
# HBM strand (tree_any) wave-level cost on the same resident scene
arm $AB --pipe --unroll 4 --hbm --repeats 3
arm $AB --pipe --unroll 4 --hbm --dual --repeats 3
arm python benchmarks/strand_ab.py --waves b1c b2s --repeats 2 \
    --pipe --unroll 4 --hbm --check
