#!/usr/bin/env python
"""Traversal profiler for the headline atrium config (VERDICT round-1 #2/#3).

Measures, on real TPU hardware, where the 1080p atrium frame time goes:

* packet_query throughput on PRIMARY rays (coherent, 32x32 blocks) vs
  BOUNCE-like rays (cosine-z scatter from first hits — the engine's real
  bounce distribution, incoherent origins) vs SHADOW-like rays;
* per-packet traversal stats (node pops / leaf-row tests) — the union-
  explosion diagnostic: pops x cost-per-pop explains the Mrays/s;
* sweeps of the coherence sort key (octant vs fine-direction-major) and
  packet size (4096 / 2048 / 1024).

Writes a markdown report to stdout (redirect to docs/PROFILE_rN.md).
Usage:  python benchmarks/profile_atrium.py [--tris 250000] [--rays 2097152]
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

import raytpu
from raytpu.engine.render import _morton, _pixel_layout, cast_rays
from raytpu.kernels.intersect_pallas import packet_query
from raytpu.scene.pack import pack_camera


def log(*a):
    print(*a, file=sys.stderr, flush=True)


_FLOOR = None


def rpc_floor():
    global _FLOOR
    if _FLOOR is None:
        @jax.jit
        def probe(x):
            return jnp.sum(x * 2.0)

        x = jnp.zeros((1024,), jnp.float32)
        float(probe(x))
        _FLOOR = min(
            _timed(lambda: float(probe(x))) for _ in range(6)
        )
        log(f"[profile] RPC floor {_FLOOR*1000:.1f} ms")
    return _FLOOR


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_query(pack, ro, rd, tmax, *, packet, any_hit=False, label=""):
    """Median device-time of one packet_query over the given rays, plus
    traversal stats. Sync by scalar fetch; subtract the RPC floor."""
    node8, leaves = pack.bvh.node8_rows, pack.bvh.leaf_tris

    @jax.jit
    def run():
        t, tri = packet_query(
            node8, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2], tmax,
            tmin=0.001, any_hit=any_hit, packet=packet,
        )
        return jnp.sum(t * 0.0) + jnp.sum(tri)

    t0 = time.time()
    float(run())  # compile
    compile_s = time.time() - t0
    times = [max(_timed(lambda: float(run())) - rpc_floor(), 1e-9)
             for _ in range(5)]
    dt = float(np.median(times))

    # stats pass (separate compile; not timed)
    _, _, stats = packet_query(
        node8, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
        rd[:, 0], rd[:, 1], rd[:, 2], tmax,
        tmin=0.001, any_hit=any_hit, packet=packet, with_stats=True,
    )
    s = np.asarray(stats)
    pops, leafs = s[:, 0], s[:, 1]
    r = ro.shape[0]
    mrays = r / dt / 1e6
    row = (
        f"| {label} | {packet} | {mrays:8.1f} | {dt*1000:7.2f} | "
        f"{pops.mean():7.0f} | {np.percentile(pops, 90):7.0f} | "
        f"{leafs.mean():6.0f} | {dt/max(pops.sum(),1)*1e9:6.0f} |"
    )
    log(f"[profile] {label} packet={packet}: {mrays:.1f} Mrays/s, "
        f"pops mean {pops.mean():.0f} p90 {np.percentile(pops,90):.0f}, "
        f"leafs mean {leafs.mean():.0f} (compile {compile_s:.0f}s)")
    return row, mrays, dt


def sort_rays(pack, ro, rd, mode):
    """Coherence sorts. Returns sorted (ro, rd)."""
    r = ro.shape[0]
    if mode == "none":
        return ro, rd
    ext = jnp.maximum(pack.scene_bmax - pack.scene_bmin, 1e-6)
    q = jnp.clip(((ro - pack.scene_bmin) / ext * 64.0).astype(jnp.int32),
                 0, 63)
    omorton = _morton((q[:, 0], q[:, 1], q[:, 2]), 6)
    octant = ((rd[:, 0] < 0).astype(jnp.int32)
              | ((rd[:, 1] < 0).astype(jnp.int32) << 1)
              | ((rd[:, 2] < 0).astype(jnp.int32) << 2))
    if mode == "octant18":  # engine's current key
        key = (octant << 18) | omorton
        keys = (key,)
    elif mode.startswith("dir"):  # fine direction-major, origin minor
        bits = int(mode[3:])
        n = (1 << bits)
        dq = jnp.clip(((rd * 0.5 + 0.5) * n).astype(jnp.int32), 0, n - 1)
        dmorton = _morton((dq[:, 0], dq[:, 1], dq[:, 2]), 6)
        keys = (dmorton, omorton)
    elif mode == "origin_major":
        key = (omorton << 3) | octant
        keys = (key,)
    else:
        raise ValueError(mode)
    cols = jax.lax.sort(
        keys + (ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2]),
        num_keys=len(keys),
    )[len(keys):]
    return (jnp.stack(cols[0:3], axis=-1), jnp.stack(cols[3:6], axis=-1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--rays", type=int, default=1 << 20)
    ap.add_argument("--packets", type=int, nargs="*",
                    default=[4096, 2048, 1024])
    args = ap.parse_args()

    import bench

    scene, pack = bench._cached_atrium(args.tris)
    cam = pack_camera(scene.camera)
    w, h = 1920, 1080
    log(f"[profile] atrium {args.tris} tris, "
        f"BVH nodes {pack.bvh.node8_rows.shape}, "
        f"leaves {pack.bvh.leaf_tris.shape}")

    # ---- primary rays: 32x32-block order over the top `rays` of the frame
    px, py, _ = _pixel_layout(w, min(args.rays // w, h), True)
    ro, rd = cast_rays(px.astype(jnp.float32) + 0.5,
                       py.astype(jnp.float32) + 0.5,
                       cam.world, cam.projection, w, h)
    n = min(args.rays, ro.shape[0])
    ro, rd = ro[:n], rd[:n]
    tmax = jnp.full((n,), 3.4e38, jnp.float32)

    rows = ["| rays | packet | Mrays/s | ms | pops/pkt | p90 | leafs | ns/pop |",
            "|---|---|---|---|---|---|---|---|"]

    row, prim_mrays, _ = time_query(pack, ro, rd, tmax, packet=4096,
                                    label="primary")
    rows.append(row)

    # ---- first-hit points -> bounce-like rays (the engine's diffuse quirk:
    # cosine hemisphere around GLOBAL z, sign-flipped by incoming dz)
    t, tri = packet_query(
        pack.bvh.node8_rows, pack.bvh.leaf_tris,
        ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        tmax, tmin=0.001, any_hit=False,
    )
    hitp = ro + rd * jnp.where(tri >= 0, t, 1.0)[:, None]
    rng = np.random.default_rng(1)
    u1 = rng.random(n).astype(np.float32)
    u2 = rng.random(n).astype(np.float32)
    rdisk = np.sqrt(u1)
    th = 2 * np.pi * u2
    dx, dy = rdisk * np.cos(th), rdisk * np.sin(th)
    dz = np.sqrt(np.maximum(1 - dx * dx - dy * dy, 0.0))
    dz = np.where(np.asarray(rd[:, 2]) < 0, -dz, dz)
    brd = jnp.asarray(np.stack([dx, dy, dz], -1))
    bro = hitp
    alive = tri >= 0
    btmax = jnp.where(alive, 3.4e38, -jnp.inf)
    log(f"[profile] bounce set: {float(jnp.mean(alive))*100:.0f}% lanes alive")

    for mode in ("none", "octant18", "origin_major", "dir6"):
        sro, srd = sort_rays(pack, bro, brd, mode)
        # dead lanes were folded in already via btmax=-inf on unsorted;
        # after sort we lose the pairing, so time all-alive worst case
        for packet in args.packets:
            row, _, _ = time_query(
                pack, sro, srd, tmax, packet=packet,
                label=f"bounce/{mode}")
            rows.append(row)

    # ---- shadow-like rays: hit points -> the first light
    lpos = pack.light_table[0, 0:3]
    to_l = lpos[None, :] - hitp
    dist = jnp.sqrt(jnp.sum(to_l * to_l, axis=-1))
    sdir = to_l / dist[:, None]
    srow, _, _ = time_query(pack, hitp, sdir, dist, packet=4096,
                            any_hit=True, label="shadow(any)")
    rows.append(srow)

    print("# Atrium traversal profile\n")
    print(f"- scene: {args.tris} tris, rays per set: {n}")
    print(f"- device: {jax.devices()[0]}\n")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
