#!/usr/bin/env python
"""Captured-wave fixtures: REAL engine ray waves for traversal A/Bs.

Round 2's costliest lesson (docs/PROFILE_r2.md "a benchmarking trap"):
synthetic ray sets inverted two kernel A/B verdicts because the engine's
real deep-bounce waves (enclosed scene, ~50% dead lanes, hits nearby)
reward early best-t shrink far more than resampled single-bounce sets do.
This module institutionalises the fix:

* ``capture``: renders one REAL tile of the headline atrium frame with the
  engine's own ``_trace_paths`` in eager mode, recording every intersector
  call's exact inputs (origins, directions, per-lane tmax with the -inf
  dead-lane encoding, tmin). The full capture is cached locally
  (.bench_cache/); a compact f16 band of each key wave is written to
  ``benchmarks/waves/`` and committed, so every kernel claim can cite a
  fixed fixture.
* ``load_wave``: returns a wave (preferring the full local capture,
  falling back to the committed fixture) for A/B scripts.
* ``stats``: runs the resident packet kernel over a captured wave at a
  sweep of packet sizes, reporting Mrays/s and traversal-union counters
  (node pops / leaf tests) — the U(packet) curve that sizes per-packet
  redundancy.

Committed waves (atrium 250k tris, 1920x1080, seed 1, tile 0 = rows
0..545, sample 0): b1c/b2c/b3c = bounce 1/2/3 continuation (closest-hit)
waves, b2s = bounce 2 NEE shadow wave. Rays are stored UNSORTED (engine
order); A/Bs apply the sort under test.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RAYTPU_CACHE", os.path.expanduser("~/.raytpu_jaxcache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

WAVES_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "waves")
FULL_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".bench_cache", "waves_atrium250k_full.npz",
)
COMMIT_WAVES = ("b1c", "b2c", "b3c", "b2s")
COMMIT_RAYS = 262144  # contiguous band committed per wave (f16)


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


class _Recorder:
    """Wraps (closest, any_hit) intersectors; records every call's inputs
    as numpy before passing through."""

    def __init__(self, closest, any_hit):
        self._closest = closest
        self._any = any_hit
        self.calls = []  # (kind, ro, rd, tmin, tmax)

    def closest(self, ro, rd, tmin, tmax):
        self.calls.append(
            ("closest", np.asarray(ro), np.asarray(rd), float(tmin),
             np.asarray(jnp.broadcast_to(tmax, (ro.shape[0],))))
        )
        return self._closest(ro, rd, tmin, tmax)

    def any_hit(self, ro, rd, tmin, tmax):
        self.calls.append(
            ("shadow", np.asarray(ro), np.asarray(rd), float(tmin),
             np.asarray(jnp.broadcast_to(tmax, (ro.shape[0],))))
        )
        return self._any(ro, rd, tmin, tmax)


def capture(tris: int = 250_000, width: int = 1920, height: int = 1080,
            bounces: int = 4, seed: int = 1):
    """Capture one tile's waves from the real engine trace; returns
    {name: dict(ro, rd, tmax, tmin, kind, bounce)}."""
    import bench
    from raytpu import RenderConfig
    from raytpu.engine.render import (
        _auto_tile_rows, _choose_intersectors, _in_chunk_grid,
        _pixel_layout, _trace_paths, cast_rays,
    )
    from raytpu.kernels import rng as rngk
    from raytpu.scene.pack import pack_camera

    scene, pack = bench._cached_atrium(tris)
    cam = pack_camera(scene.camera)
    cfg = RenderConfig(width=width, height=height, seed=seed, samples=1,
                       bounces=bounces, chunk_size=8)
    tile_h = _auto_tile_rows(cfg, pack.n_triangles)
    (closest, any_hit), packet_mode, _, _, _ = _choose_intersectors(
        pack, cfg
    )
    assert packet_mode, "wave capture expects the packet path"
    rec = _Recorder(closest, any_hit)

    px, py, _ = _pixel_layout(width, tile_h, packet_mode)
    in_grid = _in_chunk_grid(px, py, width, height, cfg.chunk_size)
    rng0 = rngk.seed_pixels(px, py, width, cfg.chunk_size, seed)
    rng, jx = rngk.rand(rng0)
    rng, jy = rngk.rand(rng)
    ro, rd = cast_rays(
        px.astype(jnp.float32) + jx, py.astype(jnp.float32) + jy,
        cam.world, cam.projection, width, height,
    )
    _log(f"[waves] tracing tile 0 ({ro.shape[0]} rays, eager, "
         f"{bounces} bounces)...")
    # sort_bounced=False: results are bit-identical (order-only change),
    # and the recorder then sees the engine's PRE-sort wave — A/Bs apply
    # the sort key under test themselves
    _trace_paths(pack, rec.closest, rec.any_hit, ro, rd, rng, bounces,
                 mask=in_grid, sort_bounced=False, eager=True)

    waves = {}
    counts = {"closest": 0, "shadow": 0}
    for kind, wro, wrd, wtmin, wtmax in rec.calls:
        b = counts[kind]
        counts[kind] += 1
        name = f"b{b}{'c' if kind == 'closest' else 's'}"
        waves[name] = dict(
            ro=wro, rd=wrd, tmax=wtmax, tmin=np.float32(wtmin),
            kind=kind, bounce=np.int32(b),
        )
        alive = float((wtmax >= 0).mean())
        _log(f"[waves] {name}: {wro.shape[0]} rays, {alive*100:.0f}% live")
    return waves


def save_capture(waves):
    os.makedirs(os.path.dirname(FULL_CACHE), exist_ok=True)
    flat = {}
    for name, w in waves.items():
        for k, v in w.items():
            if k in ("kind",):
                continue
            flat[f"{name}_{k}"] = v
    flat["names"] = np.array(sorted(waves.keys()))
    np.savez_compressed(FULL_CACHE, **flat)
    _log(f"[waves] full capture -> {FULL_CACHE} "
         f"({os.path.getsize(FULL_CACHE)/1e6:.1f} MB)")

    os.makedirs(WAVES_DIR, exist_ok=True)
    for name in COMMIT_WAVES:
        w = waves[name]
        r = w["ro"].shape[0]
        lo = max((r - COMMIT_RAYS) // 2, 0)
        sl = slice(lo, lo + min(COMMIT_RAYS, r))
        # f16 band: zero dead-lane payloads (their values are unread) and
        # map the F32_MAX open bound to +inf so the cast cannot overflow
        # into garbage
        tmax = w["tmax"][sl].astype(np.float32).copy()
        dead = tmax < 0
        tmax[dead] = -np.inf
        tmax[tmax >= 1e38] = np.inf
        ro = w["ro"][sl].astype(np.float32).copy()
        rd = w["rd"][sl].astype(np.float32).copy()
        ro[dead] = 0.0
        rd[dead] = 1.0
        path = os.path.join(WAVES_DIR, f"atrium250k_{name}.npz")
        np.savez_compressed(
            path,
            ro=ro.astype(np.float16),
            rd=rd.astype(np.float16),
            tmax=tmax.astype(np.float16),
            tmin=w["tmin"], bounce=w["bounce"],
            kind=np.array(w["kind"]),
            full_rays=np.int64(r), band_start=np.int64(lo),
        )
        _log(f"[waves] committed fixture {path} "
             f"({os.path.getsize(path)/1e6:.1f} MB)")


def load_wave(name: str, prefer_full: bool = True):
    """-> dict(ro, rd, tmax [f32 numpy], tmin float, kind str). Prefers
    the local full capture; falls back to the committed f16 band."""
    if prefer_full and os.path.exists(FULL_CACHE):
        z = np.load(FULL_CACHE, allow_pickle=False)
        if f"{name}_ro" in z:
            return dict(
                ro=z[f"{name}_ro"], rd=z[f"{name}_rd"],
                tmax=z[f"{name}_tmax"], tmin=float(z[f"{name}_tmin"]),
                kind="shadow" if name.endswith("s") else "closest",
            )
    path = os.path.join(WAVES_DIR, f"atrium250k_{name}.npz")
    z = np.load(path, allow_pickle=False)
    return dict(
        ro=z["ro"].astype(np.float32), rd=z["rd"].astype(np.float32),
        tmax=z["tmax"].astype(np.float32), tmin=float(z["tmin"]),
        kind=str(z["kind"]),
    )


def engine_sort(pack, ro, rd, tmax, extra=()):
    """Apply the engine's octant18 coherence sort (dead lanes last);
    returns sorted (ro, rd, tmax, *extra)."""
    from raytpu.engine.render import _ray_sort_key

    ro = jnp.asarray(ro)
    rd = jnp.asarray(rd)
    tmax = jnp.asarray(tmax)
    key = _ray_sort_key(pack, ro, rd, tmax >= 0)
    cols = jax.lax.sort(
        (key, ro[:, 0], ro[:, 1], ro[:, 2],
         rd[:, 0], rd[:, 1], rd[:, 2], tmax)
        + tuple(jnp.asarray(e) for e in extra),
        num_keys=1,
    )[1:]
    out = (jnp.stack(cols[0:3], -1), jnp.stack(cols[3:6], -1), cols[6])
    return out + tuple(cols[7:])


def _stats_main(args):
    import time

    import bench
    from raytpu.kernels.intersect_pallas import packet_query

    _, pack = bench._cached_atrium(args.tris)
    node8, leaves = pack.bvh.node8_rows, pack.bvh.leaf_tris
    print("| wave | packet | Mrays/s | live Mrays/s | ms | pops/pkt | "
          "leafs/pkt | pops total | leafs total |")
    print("|---|---|---|---|---|---|---|---|---|")
    for name in args.waves:
        w = load_wave(name)
        any_hit = w["kind"] == "shadow"
        ro, rd, tmax = engine_sort(pack, w["ro"], w["rd"], w["tmax"])
        r = ro.shape[0]
        live = float(np.mean(np.asarray(tmax) >= 0))
        for packet in args.packets:
            @jax.jit
            def run():
                t, tri = packet_query(
                    node8, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                    rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                    tmin=w["tmin"], any_hit=any_hit, packet=packet,
                )
                return jnp.sum(t * 0.0) + jnp.sum(tri)

            float(run())
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(run())
                times.append(time.perf_counter() - t0)
            dt = float(np.median(times)) - bench._rpc_floor()
            dt = max(dt, 1e-9)
            _, _, stats = packet_query(
                node8, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                tmin=w["tmin"], any_hit=any_hit, packet=packet,
                with_stats=True,
            )
            s = np.asarray(stats)
            pops, leafs = s[:, 0], s[:, 1]
            print(f"| {name} | {packet} | {r/dt/1e6:8.1f} | "
                  f"{r*live/dt/1e6:8.1f} | {dt*1000:7.2f} | "
                  f"{pops.mean():7.0f} | {leafs.mean():7.0f} | "
                  f"{pops.sum():9d} | {leafs.sum():9d} |", flush=True)


def _time_fn(run, repeats=5):
    import time

    import bench

    float(run())  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run())
        times.append(time.perf_counter() - t0)
    return max(float(np.median(times)) - bench._rpc_floor(), 1e-9)


def _ab_main(args):
    """Strand kernel vs resident packet kernel on captured waves: time +
    checksum agreement (tri sums must match bit-exactly)."""
    import bench
    from raytpu.accel.strandtree import strand_tree_from_packed
    from raytpu.kernels.intersect_pallas import packet_query
    from raytpu.kernels.strand import strand_query

    _, pack = bench._cached_atrium(args.tris)
    node8, leaves = pack.bvh.node8_rows, pack.bvh.leaf_tris
    _log("[ab] building strand tree...")
    import time as _t
    t0 = _t.time()
    stree = jnp.asarray(strand_tree_from_packed(np.asarray(pack.bvh.nodes)).rows)
    _log(f"[ab] strand tree {stree.shape} in {_t.time()-t0:.1f}s")
    print("| wave | kernel | Mrays/s | ms | agree | steps/blk | "
          "leafp/blk |")
    print("|---|---|---|---|---|---|---|")
    for name in args.waves:
        w = load_wave(name)
        any_hit = w["kind"] == "shadow"
        ro, rd, tmax = engine_sort(pack, w["ro"], w["rd"], w["tmax"])
        r = ro.shape[0]

        @jax.jit
        def run_packet():
            t, tri = packet_query(
                node8, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                tmin=w["tmin"], any_hit=any_hit,
            )
            return jnp.sum(jnp.abs(t) * 0.0) + jnp.sum(tri)

        @jax.jit
        def run_strand():
            t, tri = strand_query(
                stree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                tmin=w["tmin"], any_hit=any_hit,
            )
            return jnp.sum(jnp.abs(t) * 0.0) + jnp.sum(tri)

        dt_p = _time_fn(run_packet)

        def timed_strand(g):
            @jax.jit
            def run_g():
                t, tri = strand_query(
                    stree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                    rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                    tmin=w["tmin"], any_hit=any_hit, groups=g,
                )
                return jnp.sum(jnp.abs(t) * 0.0) + jnp.sum(tri)

            return _time_fn(run_g)

        for g in args.groups[:-1]:
            dt_g = timed_strand(g)
            print(f"| {name} | strand-g{g} | {r/dt_g/1e6:8.1f} | "
                  f"{dt_g*1000:7.2f} | | | |", flush=True)
        dt_s = timed_strand(args.groups[-1])

        for arm in args.persistent:
            W, K = int(arm[0]), int(arm[1])
            FO = float(arm[2]) if len(arm) > 2 else 0.75
            from raytpu.kernels.strand_persistent import (
                strand_query_persistent,
            )

            @jax.jit
            def run_p():
                t, tri = strand_query_persistent(
                    stree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                    rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                    tmin=w["tmin"], any_hit=any_hit, walkers=W,
                    service_k=K, flush_occ=FO,
                )
                return jnp.sum(jnp.abs(t) * 0.0) + jnp.sum(tri)

            dt_pp = _time_fn(run_p)
            # agreement vs the block-scheduled strand kernel (bit bar)
            _, tri_s0 = strand_query(
                stree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                tmin=w["tmin"], any_hit=any_hit,
            )
            _, tri_pp = strand_query_persistent(
                stree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                tmin=w["tmin"], any_hit=any_hit, walkers=W, service_k=K,
            )
            tpp, ts0 = np.asarray(tri_pp), np.asarray(tri_s0)
            if any_hit:
                # shadow semantics: ANY blocker is acceptable; the
                # persistent refill order may surface a different one
                ag = bool(((tpp >= 0) == (ts0 >= 0)).all())
            else:
                ag = bool((tpp == ts0).all())
            print(f"| {name} | persist-w{W}k{K} | {r/dt_pp/1e6:8.1f} | "
                  f"{dt_pp*1000:7.2f} | {ag} | | |", flush=True)
        # agreement: full tri arrays (any-hit compares blocked sets)
        _, tri_p = packet_query(
            node8, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2], tmax,
            tmin=w["tmin"], any_hit=any_hit,
        )
        _, tri_s, stats = strand_query(
            stree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2], tmax,
            tmin=w["tmin"], any_hit=any_hit, with_stats=True,
        )
        tp, ts = np.asarray(tri_p), np.asarray(tri_s)
        if any_hit:
            agree = bool(((tp >= 0) == (ts >= 0)).all())
        else:
            # SBVH duplication: two walks over DIFFERENT tree topologies
            # (BVH8 vs binary strand) can commit different slots of the
            # same triangle — compare the committed slots' triangle DATA
            # (duplicated slots carry bit-identical rows), not the slot
            lv = np.asarray(leaves).reshape(-1, 10)[:, :9]
            hit = tp >= 0
            agree = bool(((tp >= 0) == (ts >= 0)).all()) and bool(
                (lv[tp[hit]] == lv[ts[hit]]).all()
            )
        s = np.asarray(stats)
        print(f"| {name} | packet | {r/dt_p/1e6:8.1f} | {dt_p*1000:7.2f} "
              f"| | | |", flush=True)
        print(f"| {name} | strand | {r/dt_s/1e6:8.1f} | {dt_s*1000:7.2f} "
              f"| {agree} | {s[:, 0].mean():6.0f} | {s[:, 1].mean():6.0f} |",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    cap = sub.add_parser("capture")
    cap.add_argument("--tris", type=int, default=250_000)
    st = sub.add_parser("stats")
    st.add_argument("--tris", type=int, default=250_000)
    st.add_argument("--waves", nargs="*", default=["b1c", "b2c", "b3c", "b2s"])
    st.add_argument("--packets", type=int, nargs="*",
                    default=[4096, 2048, 1024, 512, 256, 128])
    ab = sub.add_parser("ab")
    ab.add_argument("--tris", type=int, default=250_000)
    ab.add_argument("--groups", type=int, nargs="*", default=[4])
    ab.add_argument("--persistent", type=lambda s: tuple(
        float(x) for x in s.split(",")), nargs="*", default=[],
        metavar="W,K[,FO]",
        help="persistent-kernel arms (walkers,service_k[,flush_occ])")
    ab.add_argument("--waves", nargs="*",
                    default=["b0c", "b1c", "b2c", "b3c", "b0s", "b2s"])
    args = ap.parse_args()
    if args.cmd == "capture":
        save_capture(capture(tris=args.tris))
    elif args.cmd == "stats":
        _stats_main(args)
    elif args.cmd == "ab":
        _ab_main(args)


if __name__ == "__main__":
    main()
