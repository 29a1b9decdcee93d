#!/usr/bin/env python
"""Offline sizing for the block-binned GEMM intersector (kernels/gemm.py).

The design under test: coherence-sorted 128-ray blocks compute a
per-block UNION of candidate treelets (slab test vs treelet bounds),
then a Pallas kernel runs dense Woop tests of every block ray against
every triangle of every union treelet — no routing sorts, scheduling
rides a scalar-prefetched [blocks, UMAX] id table. Dense testing does
~K x more ray-tri tests than a walk but each test is throughput VPU
work instead of the strand kernel's ~40-cycle latency-bound fetch
(docs/PROFILE_r3.md). This sim ranks treelet budgets by the only
hardware-independent quantities that matter:

  tests/ray   = mean block-union size x padded tris per treelet
  cycles/ray  ~ tests/ray x EP_OPS / VPU_OPS_PER_CYCLE  (+ selection)

and prints the implied Mrays/s next to the strand kernel's measured
rate on the same captured waves (6.8 on b2c, benchmarks/gemm_ab).

Usage:
    python benchmarks/bgemm_sim.py [--tris 250000] [--budgets 64 128 256]
        [--waves b1c b2c b2s b3c] [--blocks 128 256]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

F32_MAX = np.float32(3.40282347e38)

# cost-model constants (VPU lane-ops): Woop epilogue per (ray, tri) —
# t = -oz/dz (div ~ 4), u/v maddss (4), range+validity compares (6),
# tkey select + min/argmin passes (2x) — and the dense [R,T] selection
EP_OPS = 16.0
SEL_OPS = 22.0
VPU = 2048.0  # lane-ops/cycle (2 ALUs x 8 sublanes x 128 lanes)
CLOCK = 0.94e9


def block_unions(cand: np.ndarray, block: int) -> np.ndarray:
    """cand [R, T] bool -> per-block union sizes [ceil(R/block)]."""
    r = cand.shape[0]
    pad = (-r) % block
    if pad:
        cand = np.concatenate([cand, np.zeros((pad, cand.shape[1]), bool)])
    return cand.reshape(-1, block, cand.shape[1]).any(axis=1).sum(axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--budgets", type=int, nargs="+",
                    default=[64, 128, 256, 512])
    ap.add_argument("--waves", nargs="+",
                    default=["b1c", "b2c", "b2s", "b3c"])
    ap.add_argument("--blocks", type=int, nargs="+", default=[128, 256])
    args = ap.parse_args()

    from benchmarks.scenes import build_atrium
    from benchmarks.waves import engine_sort, load_wave
    from raytpu.accel.bvh import Bvh8Arrays
    from raytpu.accel.treelets import build_treelets
    from raytpu.scene.pack import pack_scene

    scene = build_atrium(args.tris)
    pack = pack_scene(scene, tables="all")
    node_rows = np.asarray(pack.bvh.node8_rows)
    leaf_tris = np.asarray(pack.bvh.leaf_tris)
    bvh8 = Bvh8Arrays(node_rows=node_rows, n_leaf_rows=leaf_tris.shape[0])

    waves = {}
    for name in args.waves:
        w = load_wave(name)
        ro, rd, tmax = (np.asarray(a) for a in engine_sort(
            pack, w["ro"].astype(np.float32), w["rd"].astype(np.float32),
            w["tmax"].astype(np.float32)))
        waves[name] = (ro, rd, tmax, float(w["tmin"]))

    print(f"{'budget':>6} {'T':>5} {'Kpad':>5} {'util%':>5} | wave "
          f"{'cand/ray':>9} {'p99':>4} "
          + " ".join(f"U{b:<4} tests/ray  est-Mray/s" for b in args.blocks))
    for budget in args.budgets:
        tl = build_treelets(bvh8, leaf_tris, budget_rows=budget)
        T = tl.n_treelets
        k_pad = tl.tleaves.shape[1] * 8
        # real tris: count non-degenerate slots (slot col of padding = 0
        # with zero geometry; use n_leaf_rows for a row-level proxy)
        util = float(np.sum(tl.n_leaf_rows) * 8) / float(T * k_pad) * 100.0
        bmin = np.asarray(tl.tbox_min)  # [T,3]
        bmax = np.asarray(tl.tbox_max)
        for name, (ro, rd, tmax, tmin) in waves.items():
            live = tmax > 0
            inv = 1.0 / np.where(rd == 0.0, 1e-36, rd)
            cand_rows = []
            for s0 in range(0, ro.shape[0], 65536):
                sl = slice(s0, s0 + 65536)
                o, iv, tm = ro[sl], inv[sl], tmax[sl]
                lo = np.where(iv[:, None, :] < 0, bmax[None], bmin[None])
                hi = np.where(iv[:, None, :] < 0, bmin[None], bmax[None])
                t0 = ((lo - o[:, None, :]) * iv[:, None, :]).max(-1)
                t1 = ((hi - o[:, None, :]) * iv[:, None, :]).min(-1)
                near = np.maximum(t0, tmin)
                far = np.minimum(t1, tm[:, None])
                cand_rows.append(near <= far)
            cand = np.concatenate(cand_rows)  # [R, T]
            per_ray = cand.sum(axis=1)
            cmean = per_ray[live].mean() if live.any() else 0.0
            cp99 = np.percentile(per_ray[live], 99) if live.any() else 0
            cols = []
            for b in args.blocks:
                u = block_unions(cand, b)
                nz = u[u > 0]
                tests = float(nz.sum()) * k_pad * b / max(
                    int(live.sum()), 1)
                cyc = (tests * EP_OPS + T * SEL_OPS) / VPU
                cols.append(
                    f"{nz.mean() if nz.size else 0:5.1f} {tests:9.0f} "
                    f"{CLOCK / cyc / 1e6 if cyc else 0:10.1f}"
                )
            print(f"{budget:>6} {T:>5} {k_pad:>5} {util:>5.1f} | {name:<4} "
                  f"{cmean:>9.2f} {cp99:>4.0f} " + "  ".join(cols))


if __name__ == "__main__":
    main()
