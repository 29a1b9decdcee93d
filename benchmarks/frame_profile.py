#!/usr/bin/env python
"""Op-level breakdown of one headline atrium frame (TPU).

Captures a JAX profiler trace of the steady-state frame and prints the
top device ops grouped by kind (traversal kernels / sorts / gathers /
fusions), so engine-glue claims cite measured ms, not estimates
(VERDICT r2 item 5). Usage:

    python benchmarks/frame_profile.py [--tris 250000] [--width 1920]
        [--height 1080] [--top 40]
"""

from __future__ import annotations

import argparse
import glob
import gzip
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

import raytpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def capture(tris, width, height, bounces, outdir, scene_name="atrium",
            samples=1):
    import bench
    from raytpu.engine.render import _auto_tile_rows, render_tile
    from raytpu.scene.pack import pack_camera, pack_scene

    if scene_name == "atrium":
        scene, pack = bench._cached_atrium(tris)
        cfg = raytpu.RenderConfig(width=width, height=height, seed=1,
                                  samples=samples, bounces=bounces,
                                  chunk_size=8)
    elif scene_name == "multi":
        # BENCH config 3 exactly
        path = os.path.join(bench.CACHE, "multi_mesh.glb")
        if not os.path.exists(path):
            bench._build_multi_mesh_glb(path)
        scene = raytpu.load_scene(path)
        pack = pack_scene(scene)
        cfg = raytpu.RenderConfig(width=256, height=256, seed=1, samples=2,
                                  bounces=3, chunk_size=32,
                                  bruteforce_max_tris=64)
    else:
        raise SystemExit(f"unknown scene {scene_name}")
    cam = pack_camera(scene.camera)
    tile_h = _auto_tile_rows(cfg, pack.n_triangles)

    @jax.jit
    def frame(pack, cam):
        total = jnp.float32(0.0)
        for y0 in range(0, cfg.height, tile_h):
            total += jnp.sum(
                render_tile(pack, cam, jnp.int32(y0), cfg, tile_h)
            )
        return total

    t0 = time.time()
    float(frame(pack, cam))
    log(f"[profile] warmup {time.time() - t0:.1f}s")
    t0 = time.perf_counter()
    float(frame(pack, cam))
    wall = time.perf_counter() - t0
    log(f"[profile] steady frame {wall*1000:.1f} ms (incl. RPC)")
    with jax.profiler.trace(outdir):
        float(frame(pack, cam))
    return wall


def parse(outdir, top):
    """Read the xplane proto and aggregate device op durations."""
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(outdir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {outdir}"
    path = max(paths, key=os.path.getmtime)
    xspace = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xspace.ParseFromString(f.read())

    totals = {}
    device_total = 0.0
    for plane in xspace.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        ev_meta = plane.event_metadata
        for line in plane.lines:
            lname = line.name.lower()
            # XLA op lines carry per-op events; step/module lines would
            # double-count
            if "xla ops" not in lname and "xla op" != lname:
                continue
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                dur = ev.duration_ps / 1e9  # ms
                totals[name] = totals.get(name, 0.0) + dur
                device_total += dur
    items = sorted(totals.items(), key=lambda kv: -kv[1])

    def bucket(name):
        n = name.lower()
        if "strand" in n:
            return "strand kernel"
        if "packet" in n or "custom-call" in n:
            return "packet kernel"
        if "sort" in n:
            return "sort"
        if "slice-start" in n or "slice-done" in n:
            return "async slice (sort spill / prefetch)"
        if "copy-start" in n or "copy-done" in n or n.startswith("%copy"):
            return "async copy (memory space)"
        if "gather" in n:
            return "gather"
        if "scatter" in n:
            return "scatter"
        if "fusion" in n:
            return "fusion (elementwise)"
        if "while" in n:
            return "while overhead"
        return "other"

    groups = {}
    for name, ms in totals.items():
        b = bucket(name)
        groups[b] = groups.get(b, 0.0) + ms
    print(f"device total: {device_total:.1f} ms")
    print("\n| group | ms | % |")
    print("|---|---|---|")
    for b, ms in sorted(groups.items(), key=lambda kv: -kv[1]):
        print(f"| {b} | {ms:7.1f} | {100*ms/max(device_total,1e-9):4.1f} |")
    print(f"\ntop {top} ops:")
    print("| op | ms |")
    print("|---|---|")
    for name, ms in items[:top]:
        print(f"| {name[:90]} | {ms:7.1f} |")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--outdir", default="/tmp/raytpu_frame_trace")
    ap.add_argument("--scene", default="atrium", choices=["atrium", "multi"])
    ap.add_argument("--samples", type=int, default=1)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()
    if not args.parse_only:
        capture(args.tris, args.width, args.height, args.bounces,
                args.outdir, scene_name=args.scene, samples=args.samples)
    parse(args.outdir, args.top)


if __name__ == "__main__":
    main()
