#!/bin/sh
# Round-5 queue 1c: fetch_smem arms + HBM strand wave cost + hardware
# bit-identity checks (PROFILE_r5 queue 1c). Ran from /tmp during the
# round; committed for provenance.
cd /root/repo
gate() {
  for i in 1 2 3 4 5 6 7 8 9 10 11 12; do
    timeout 90 python benchmarks/tpu_gate.py >/dev/null 2>&1 && return 0
    echo "[gate] tunnel not ready, retry $i"; sleep 30
  done
  echo "[gate] tunnel dead after 12 tries"; return 1
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
arm $AB --pipe --unroll 4 --fsmem
arm $AB --pipe --unroll 8 --fsmem
arm $AB --pipe --unroll 4 --fsmem --dual
arm python benchmarks/strand_ab.py --waves b1c b2c --repeats 2 \
    --pipe --unroll 4 --fsmem --check
arm $AB --pipe --unroll 4 --hbm --repeats 3
arm $AB --pipe --unroll 4 --hbm --fsmem --repeats 3
arm python benchmarks/strand_ab.py --waves b1c b2s --repeats 2 \
    --pipe --unroll 4 --hbm --check
