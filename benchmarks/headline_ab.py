#!/usr/bin/env python
"""Time the headline atrium frame end-to-end (no trace) — the A/B tool
for engine-glue changes. Prints steady-state ms and Mrays/s. Knobs ride
env vars (e.g. RAYTPU_SORT_MODE), so run one process per arm."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RAYTPU_CACHE", os.path.expanduser("~/.raytpu_jaxcache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

import raytpu


def main():
    import argparse

    import bench
    from raytpu.engine.render import _auto_tile_rows, render_tile
    from raytpu.scene.pack import pack_camera

    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--rays", type=float, default=0.0,
                    help="known ray count (Mrays/s uses it if given)")
    ap.add_argument("--scene", default="atrium",
                    choices=["atrium", "multi", "pbr", "cube"])
    ap.add_argument("--tile-rows", type=int, default=None)
    ap.add_argument("--intersector", default=None,
                    help="override config.intersector")
    ap.add_argument("--inner", type=int, default=1,
                    help="device-side repeats per timing (small frames)")
    args = ap.parse_args()

    if args.scene == "multi":
        from raytpu.scene.pack import pack_scene

        path = os.path.join(bench.CACHE, "multi_mesh.glb")
        if not os.path.exists(path):
            bench._build_multi_mesh_glb(path)
        scene = raytpu.load_scene(path)
        pack = pack_scene(scene)
        bb = os.environ.get("RAYTPU_BOUNCE_BACKEND")
        extra = {"bounce_backend": bb} if bb else {}
        cfg = raytpu.RenderConfig(width=256, height=256, seed=1, samples=2,
                                  bounces=3, chunk_size=32,
                                  bruteforce_max_tris=64, **extra)
    elif args.scene == "pbr":
        # BASELINE config 4 (the 106.5 -> 95.4 r3 regression target)
        from raytpu.scene.pack import pack_scene

        path = os.path.join(bench.CACHE, "pbr_nee.glb")
        if not os.path.exists(path):
            bench._build_pbr_nee_glb(path)
        scene = raytpu.load_scene(path)
        pack = pack_scene(scene)
        extra = (
            {"intersector": args.intersector} if args.intersector else {}
        )
        cfg = raytpu.RenderConfig(width=256, height=256, seed=1, samples=4,
                                  bounces=4, chunk_size=32, **extra)
    elif args.scene == "cube":
        # BASELINE config 2 (cube path, flat ~85 for three rounds);
        # camera comes from the reference's camera.json override
        from raytpu.scene.pack import pack_scene

        scene = raytpu.load_scene("/root/reference/cube.glb")
        pack = pack_scene(scene)
        cam_override = raytpu.load_camera_json(
            "/root/reference/camera.json", 512, 512
        )
        cfg = raytpu.RenderConfig(width=512, height=512, seed=1, samples=4,
                                  bounces=4, chunk_size=64)
    else:
        scene, pack = bench._cached_atrium(args.tris)
        extra = {}
        if args.intersector:
            extra["intersector"] = args.intersector
        bb = os.environ.get("RAYTPU_BOUNCE_BACKEND")
        if bb:
            extra["bounce_backend"] = bb
        cfg = raytpu.RenderConfig(width=args.width, height=args.height,
                                  seed=1, samples=1, bounces=args.bounces,
                                  chunk_size=8, tile_rows=args.tile_rows,
                                  **extra)
    cam = pack_camera(
        cam_override if args.scene == "cube" else scene.camera
    )
    tile_h = _auto_tile_rows(cfg, pack.n_triangles)

    @jax.jit
    def frame(pack, cam):
        total = jnp.float32(0.0)
        for _ in range(args.inner):
            # chain iterations through y0 so XLA cannot CSE them
            bump = (total * 0.0).astype(jnp.int32)
            for y0 in range(0, cfg.height, tile_h):
                total += jnp.sum(
                    render_tile(pack, cam, jnp.int32(y0) + bump, cfg,
                                tile_h)
                )
        return total

    t0 = time.time()
    float(frame(pack, cam))
    print(f"warmup {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    best = float("inf")
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        float(frame(pack, cam))
        best = min(best, time.perf_counter() - t0)
    ms = best * 1000 / args.inner
    line = f"steady frame {ms:.1f} ms"
    if args.rays:
        line += f"  ->  {args.rays / (ms / 1000.0) / 1e6:.2f} Mrays/s"
    print(line, flush=True)


if __name__ == "__main__":
    main()
