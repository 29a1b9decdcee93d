#!/bin/sh
# Round-5 queue 1: break the persistent kernel's control floor
# (VERDICT r5 item 1). Captured-wave arms over the new knobs:
#   --ctl-every N  flush/service decision every N body iterations
#   --flush-pop P  pop up to P queue heads per walker per flush
#   --unroll K     walk sub-steps per body (enqueue-gated, any K safe)
# Steady state needs P >~ 0.09 * K * N (measured enqueue rate ~0.09
# leaves/walker/step on atrium waves) or queues pin at QCAP and walkers
# stall. One process per arm, NOTHING else running (1-vCPU box).
# The tunnel wedges intermittently: gate() probes it (60 s timeout) and
# every arm runs under timeout + one retry.
# Usage: sh benchmarks/r5_queue1.sh > /tmp/r5q1.log 2>&1
cd /root/repo

gate() {
  for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
    timeout 60 python benchmarks/tpu_gate.py >/dev/null 2>&1 && return 0
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

arm $AB --pipe --unroll 4
arm $AB --pipe --unroll 4 --ctl-every 4 --flush-pop 2
arm $AB --pipe --unroll 8 --ctl-every 4 --flush-pop 4
arm $AB --pipe --unroll 8 --ctl-every 8 --flush-pop 8
arm $AB --pipe --unroll 16 --ctl-every 8 --flush-pop 16
arm $AB --walkers 256 --pipe --unroll 8 --ctl-every 4 --flush-pop 4
arm python benchmarks/strand_ab.py --waves b1c b2s --repeats 2 \
    --pipe --unroll 16 --ctl-every 8 --flush-pop 16 --check
