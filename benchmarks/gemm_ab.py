#!/usr/bin/env python
"""Captured-wave A/B: GEMM intersector vs the strand kernel (TPU).

Times gemm_query (kernels/gemm.py) against strand_query on the
committed engine waves, sweeping the treelet budget. Strand gets its
coherence-sorted order (its contract); gemm takes the wave RAW — its
internal pair routing replaces the engine-side sort. Also reports hit
agreement and pair-overflow counts (must be 0 for a valid config).

Usage: python benchmarks/gemm_ab.py [--tris 250000]
           [--budgets 128 256 512] [--waves b2c b2s b3c]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RAYTPU_CACHE", os.path.expanduser("~/.raytpu_jaxcache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--budgets", type=int, nargs="*", default=[128, 256])
    ap.add_argument("--waves", nargs="*", default=["b2c", "b2s"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--slab", type=int, default=65536)
    args = ap.parse_args()

    import bench
    from benchmarks.waves import engine_sort, load_wave
    from raytpu.kernels.gemm import gemm_query, gemm_tables_from_pack
    from raytpu.kernels.strand import strand_query

    _, pack = bench._cached_atrium(args.tris)
    floor = bench._rpc_floor()

    for name in args.waves:
        w = load_wave(name)
        any_hit = w["kind"] == "shadow"
        ro_r = jnp.asarray(w["ro"])
        rd_r = jnp.asarray(w["rd"])
        tmax_r = jnp.asarray(w["tmax"])
        r = ro_r.shape[0]
        live = float(jnp.mean((tmax_r >= 0).astype(jnp.float32)))

        # strand arm (sorted order, its contract)
        ro_s, rd_s, tmax_s = engine_sort(pack, ro_r, rd_r, tmax_r)
        tree, leaves = pack.bvh.strand_rows, pack.bvh.leaf_tris

        @jax.jit
        def run_strand():
            t, tri = strand_query(
                tree, leaves,
                ro_s[:, 0], ro_s[:, 1], ro_s[:, 2],
                rd_s[:, 0], rd_s[:, 1], rd_s[:, 2], tmax_s,
                tmin=w["tmin"], any_hit=any_hit,
            )
            return jnp.sum(t * 0.0) + jnp.sum(tri)

        def timeit(f):
            float(f())
            ts = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                float(f())
                ts.append(time.perf_counter() - t0)
            return max(float(np.median(ts)) - floor, 1e-9)

        dt_s = timeit(run_strand)
        print(f"| {name} | strand | {r/dt_s/1e6:8.1f} Mrays/s "
              f"| {r*live/dt_s/1e6:8.1f} live | {dt_s*1000:7.2f} ms |",
              flush=True)

        for budget in args.budgets:
            gt = gemm_tables_from_pack(pack, budget_rows=budget)

            @jax.jit
            def run_gemm():
                t, tri, ov = gemm_query(
                    gt.wo, gt.wd, gt.slot, gt.tbox_min, gt.tbox_max,
                    ro_r, rd_r, tmax_r,
                    tmin=w["tmin"], any_hit=any_hit,
                    slab_rays=args.slab,
                )
                return jnp.sum(t * 0.0) + jnp.sum(tri) + ov

            dt_g = timeit(run_gemm)
            _, _, ov = gemm_query(
                gt.wo, gt.wd, gt.slot, gt.tbox_min, gt.tbox_max,
                ro_r, rd_r, tmax_r, tmin=w["tmin"], any_hit=any_hit,
                slab_rays=args.slab,
            )
            print(f"| {name} | gemm b{budget} T={gt.n_treelets} "
                  f"K={gt.tris_per_treelet} | {r/dt_g/1e6:8.1f} Mrays/s "
                  f"| {r*live/dt_g/1e6:8.1f} live | {dt_g*1000:7.2f} ms "
                  f"| overflow {int(ov)} |", flush=True)


if __name__ == "__main__":
    main()
