#!/bin/sh
# Round-5 queue 1: break the persistent kernel's control floor
# (VERDICT r5 item 1). Captured-wave arms over the new knobs:
#   --ctl-every N  flush/service decision every N body iterations
#   --flush-pop P  pop up to P queue heads per walker per flush
#   --unroll K     walk sub-steps per body (enqueue-gated, any K safe)
# Steady state needs P >~ 0.09 * K * N (measured enqueue rate ~0.09
# leaves/walker/step on atrium waves) or queues pin at QCAP and walkers
# stall. One process per arm, NOTHING else running (1-vCPU box).
# Usage: sh benchmarks/r5_queue1.sh > /tmp/r5q1.log 2>&1
set -x
cd /root/repo
AB="python benchmarks/strand_ab.py --waves b1c b2c b2s b3c --repeats 5"

echo "=== control: r4 default (pipe, unroll 4, ctl 1, pop 1) ==="
$AB --pipe --unroll 4 --stats
echo "=== arm A: ctl 4 (decision 1/4 bodies) ==="
$AB --pipe --unroll 4 --ctl-every 4 --flush-pop 2
echo "=== arm B: unroll 8, ctl 4, pop 4 ==="
$AB --pipe --unroll 8 --ctl-every 4 --flush-pop 4
echo "=== arm C: unroll 8, ctl 8, pop 8 ==="
$AB --pipe --unroll 8 --ctl-every 8 --flush-pop 8
echo "=== arm D: unroll 16, ctl 8, pop 16 ==="
$AB --pipe --unroll 16 --ctl-every 8 --flush-pop 16
echo "=== arm E: walkers 256, unroll 8, ctl 4, pop 4 ==="
$AB --walkers 256 --pipe --unroll 8 --ctl-every 4 --flush-pop 4
echo "=== bit-identity check on the aggressive shape ==="
python benchmarks/strand_ab.py --waves b1c b2s --repeats 2 \
    --pipe --unroll 16 --ctl-every 8 --flush-pop 16 --check
