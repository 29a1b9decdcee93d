#!/bin/bash
# Round-3 TPU measurement queue: launched by a watcher when the tunnel
# revives. Each step logs under /tmp/r3q/. Steps are ordered by value;
# later steps still run if earlier ones fail.
set -u
cd /root/repo
mkdir -p /tmp/r3q

log() { echo "[r3q $(date +%H:%M:%S)] $*" >> /tmp/r3q/queue.log; }

log "queue start"

# 0. CLI verify drive (also re-warms the compile cache)
timeout 900 python -m raytpu.cli --width 256 --height 256 --seed 1 \
  --scene /root/reference/cube.glb --chunk-size 64 --samples 8 --bounces 4 \
  --output /tmp/r3q/verify.png --camera /root/reference/camera.json \
  > /tmp/r3q/cli.log 2>&1
log "cli rc=$?"

# 1. headline A/B: payload (control) vs payload_split vs resort
timeout 1800 env RAYTPU_SORT_MODE=payload \
  python benchmarks/headline_ab.py --rays 8910216 \
  > /tmp/r3q/hl_payload.log 2>&1
log "hl payload rc=$? $(tail -1 /tmp/r3q/hl_payload.log)"
timeout 1800 env RAYTPU_SORT_MODE=payload_split \
  python benchmarks/headline_ab.py --rays 8910216 \
  > /tmp/r3q/hl_split.log 2>&1
log "hl split rc=$? $(tail -1 /tmp/r3q/hl_split.log)"
timeout 1800 env RAYTPU_WAVE_MODE=resort \
  python benchmarks/headline_ab.py --rays 8910216 \
  > /tmp/r3q/hl_resort.log 2>&1
log "hl resort rc=$? $(tail -1 /tmp/r3q/hl_resort.log)"

# 2. tile-size sweep under the default sort mode
for tr in 272 136; do
  timeout 1800 python benchmarks/headline_ab.py --rays 8910216 \
    --tile-rows $tr > /tmp/r3q/hl_tile$tr.log 2>&1
  log "hl tile$tr rc=$? $(tail -1 /tmp/r3q/hl_tile$tr.log)"
done

# 2b. strand kernel knobs: drain-tail fetch skip, walker groups
timeout 1800 env RAYTPU_STRAND_SKIP_DONE=1 \
  python benchmarks/headline_ab.py --rays 8910216 \
  > /tmp/r3q/hl_skipdone.log 2>&1
log "hl skipdone rc=$? $(tail -1 /tmp/r3q/hl_skipdone.log)"
timeout 1800 env RAYTPU_STRAND_GROUPS=32 \
  python benchmarks/headline_ab.py --rays 8910216 \
  > /tmp/r3q/hl_groups32.log 2>&1
log "hl groups32 rc=$? $(tail -1 /tmp/r3q/hl_groups32.log)"

# 2c. GEMM intersector vs strand on captured waves (the round-4 bet,
# prototyped early: kernels/gemm.py)
timeout 2400 python benchmarks/gemm_ab.py --budgets 128 256 512 \
  --waves b2c b2s > /tmp/r3q/gemm_ab.log 2>&1
log "gemm_ab rc=$? $(grep -c Mrays /tmp/r3q/gemm_ab.log) rows"

# 2d. engine-level GEMM headline (repacks with Woop tables)
for gb in 256 512; do
  timeout 2400 env RAYTPU_GEMM_BUDGET=$gb \
    python benchmarks/headline_ab.py --rays 8910216 --intersector gemm \
    > /tmp/r3q/hl_gemm$gb.log 2>&1
  log "hl gemm$gb rc=$? $(tail -1 /tmp/r3q/hl_gemm$gb.log)"
done

# 3. full bench (records all five configs with the new defaults)
timeout 3600 python bench.py > /tmp/r3q/bench.json 2> /tmp/r3q/bench.log
log "bench rc=$? $(cat /tmp/r3q/bench.json 2>/dev/null)"

# 4. compiled-kernel selftest (Mosaic paths incl. packed treelet windows)
timeout 1800 python bench.py --selftest > /tmp/r3q/selftest.log 2>&1
log "selftest rc=$?"

log "queue done"
