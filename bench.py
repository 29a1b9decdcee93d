#!/usr/bin/env python
"""Benchmark harness. Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N}

Headline metric (BASELINE.json north star): Mrays/sec/chip at 1080p on a
Sponza-class scene (config 5), vs_baseline = value / 200. Secondary configs
(cube primary / cube path-traced) are printed to stderr for tracking.

Ray counting uses the reference's cost model (1 primary + 2 per bounce
iteration entered, SURVEY.md §3.4) measured exactly by the engine's
instrumented trace loop — not a theoretical upper bound.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# persistent compile cache: TPU compiles through the tunnel are slow
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RAYTPU_CACHE", os.path.expanduser("~/.raytpu_jaxcache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import raytpu
from raytpu.engine.render import count_rays, render_frame, render_tile
from raytpu.scene.pack import pack_camera, pack_scene

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".bench_cache")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _cached_atrium(target_tris: int):
    """Pack the procedural Sponza-class scene, caching the (slow, host-side)
    BVH build between runs."""
    import pickle

    os.makedirs(CACHE, exist_ok=True)
    schema = 10  # bump when ScenePack layout or the scene changes
    # (v10: stream packs keep strand_rows + leaf_tris for the HBM strand
    # route; v9: BvhPack.ribbon_rows; v8: tri_p0/e1/e2 became tri_row
    # views + stream-scene table gating; v7: BvhPack.strand_rows)
    key = os.path.join(CACHE, f"atrium_{target_tris}_v{schema}.pkl")
    from benchmarks.scenes import build_atrium

    scene = build_atrium(target_tris)
    if os.path.exists(key):
        with open(key, "rb") as f:
            host_pack = pickle.load(f)
    else:
        t0 = time.time()
        host_pack = _host_pack_arrays(scene)
        log(f"[bench] atrium BVH build: {time.time() - t0:.1f}s")
        with open(key, "wb") as f:
            pickle.dump(host_pack, f)
    return scene, _device_pack(host_pack)


def _host_pack_arrays(scene):
    # as_numpy: pure host pack, no XLA:CPU round trip (the driver box's
    # degraded XLA:CPU fallback made this 27.1 s in r4 vs ~4.5 s real)
    return pack_scene(scene, as_numpy=True)


def _device_pack(host_pack):
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(np.asarray(x)), host_pack
    )


_FLOOR = None


def _rpc_floor():
    """The tunnel charges a fixed RPC latency per host-side scalar fetch;
    measure it once so render timings report device time."""
    global _FLOOR
    if _FLOOR is None:
        import jax.numpy as jnp

        @jax.jit
        def probe(x):
            return jnp.sum(x * 2.0)

        x = jnp.zeros((1024,), jnp.float32)
        float(probe(x))
        ts = [0.0] * 6
        for i in range(6):
            t0 = time.perf_counter()
            float(probe(x))
            ts[i] = time.perf_counter() - t0
        _FLOOR = min(ts)
        log(f"[bench] RPC floor: {_FLOOR*1000:.1f} ms")
    return _FLOOR


def _count_fingerprint(pack, cfg) -> str:
    """Short hash of (RenderConfig, scene content) for the ray-count
    cache filename. The scene part hashes cheap geometry invariants
    (triangle count + coordinate sums) — enough to catch any edit to the
    benchmark scenes without pulling full arrays off-device."""
    import hashlib

    h = hashlib.sha1()
    h.update(repr(cfg).encode())
    h.update(str(pack.n_triangles).encode())
    for arr in (pack.tri_p0, pack.tri_e1, pack.light_table):
        h.update(np.asarray(arr, np.float64).sum(axis=0).tobytes())
    return h.hexdigest()[:12]


def bench_config(name, pack, cam, cfg, repeats=3):
    """Render repeatedly on-device (scalar-checksum sync, RPC floor
    subtracted, inner repeats for sub-floor frames); returns (0, 0)
    without rendering when RAYTPU_BENCH_ONLY is set and not a substring
    of ``name`` (dev filter; the driver always runs the full suite);
    (Mrays/s, ms/frame)."""
    only = os.environ.get("RAYTPU_BENCH_ONLY")
    if only and only not in name:
        log(f"[bench] {name}: skipped (RAYTPU_BENCH_ONLY={only})")
        return 0.0, 0.0
    import jax.numpy as jnp
    from raytpu.engine.render import _auto_tile_rows, render_tile

    floor = _rpc_floor()
    tile_h = _auto_tile_rows(cfg, pack.n_triangles)

    def make_device_frame(inner):
        # pack/cam enter as jit ARGUMENTS: captured device arrays would be
        # serialised into the compile request as literals (hundreds of MB
        # for treelet tables) and can exceed the remote-compile size limit
        @jax.jit
        def device_frame(pack, cam):
            total = jnp.float32(0.0)
            for _ in range(inner):
                # chain iterations through y0 so XLA cannot CSE them
                bump = (total * 0.0).astype(jnp.int32)
                for y0 in range(0, cfg.height, tile_h):
                    tile = render_tile(pack, cam, jnp.int32(y0) + bump,
                                       cfg, tile_h)
                    total = total + jnp.sum(tile)
            return total

        return lambda: device_frame(pack, cam)

    frame1 = make_device_frame(1)
    t0 = time.time()
    checksum = float(frame1())
    log(f"[bench] {name}: warmup {time.time()-t0:.1f}s "
        f"(checksum {checksum:.1f})")
    # exact ray counts are deterministic per (scene, config): cache them,
    # keyed by a hash of the config AND a scene fingerprint so changing
    # bounces/chunk_size/scene content without renaming the config can
    # never reuse a stale count (the headline metric's numerator)
    os.makedirs(CACHE, exist_ok=True)
    count_key = os.path.join(
        CACHE,
        f"rays_{name.replace(' ', '_').replace('/', '_')}"
        f"_{_count_fingerprint(pack, cfg)}.txt",
    )
    if os.path.exists(count_key) and not os.environ.get(
        "RAYTPU_BENCH_VERIFY"
    ):
        rays = int(open(count_key).read())
        log(f"[bench] {name}: ray count {rays/1e6:.2f}M (cached)")
    else:
        t0 = time.time()
        rays = count_rays(pack, cam, cfg)
        if os.path.exists(count_key):
            cached = int(open(count_key).read())
            assert cached == rays, (
                f"stale ray-count cache for {name}: {cached} != {rays}"
            )
        open(count_key, "w").write(str(rays))
        log(f"[bench] {name}: ray count {rays/1e6:.2f}M "
            f"({time.time()-t0:.1f}s)")

    t0 = time.perf_counter()
    float(frame1())
    rough = max(time.perf_counter() - t0 - floor, 1e-4)
    inner = int(np.clip(np.ceil(0.25 / rough), 1, 256))
    fn = make_device_frame(inner) if inner > 1 else frame1
    float(fn())  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn())
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - floor, 1e-9) / inner
    mrays = rays / dt / 1e6
    log(f"[bench] {name}: {rays/1e6:.2f} Mrays in {dt*1000:.2f} ms "
        f"(x{inner}) -> {mrays:.1f} Mrays/s")
    return mrays, dt * 1000.0


def _build_multi_mesh_glb(path):
    """BASELINE config 3 fixture: a multi-mesh GLB (instanced boxes over a
    floor) rendered through the real loader + BVH path."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.tools.glb_writer import GlbBuilder, box, quad

    b = GlbBuilder()
    floor_m = b.add_material(color=(0.6, 0.6, 0.6, 1))
    mats = [
        b.add_material(color=(0.8, 0.3, 0.3, 1)),
        b.add_material(color=(0.3, 0.8, 0.3, 1), metallic=1.0),
        b.add_material(color=(0.3, 0.3, 0.9, 1), ior=1.5),
    ]
    pos, nrm, uv, idx = quad(size=20.0)
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, floor_m, np.uint16)]),
               translation=[0, 0, -8])
    bp, bn, bu, bi = box()
    meshes = [b.add_mesh([(bp, bn, bu, bi, m, np.uint32)]) for m in mats]
    import itertools
    for i, (x, y) in enumerate(itertools.product(range(-4, 5), range(-3, 4))):
        b.add_node(mesh=meshes[i % 3], translation=[x * 2.5, y * 2.5, 0.0],
                   scale=[0.8, 0.8, 0.8])
    b.add_node(light=b.add_light(intensity=60.0), translation=[0, 6, 10])
    b.add_node(light=b.add_light(color=(1.0, 0.8, 0.6), intensity=40.0),
               translation=[-6, -6, 10])
    b.add_node(camera=b.add_camera(1.0, 0.8), translation=[0, 0, 18])
    b.write(path)


def _build_pbr_nee_glb(path):
    """BASELINE config 4 fixture: PBR metallic-roughness materials +
    emissive panels, exercising all four material branches and NEE."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.tools.glb_writer import GlbBuilder, box, quad

    b = GlbBuilder()
    diffuse = b.add_material(color=(0.7, 0.7, 0.7, 1), ior=1.1)
    metal = b.add_material(color=(0.9, 0.8, 0.6, 1), metallic=1.0)
    glass = b.add_material(color=(0.9, 0.9, 1.0, 1), ior=1.5)
    glow = b.add_material(color=(1.0, 0.5, 0.2, 1), emission=6.0)
    pos, nrm, uv, idx = quad(size=10.0)
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, diffuse, np.uint16)]),
               translation=[0, 0, -4])
    bp, bn, bu, bi = box()
    for m, x in ((metal, -3.0), (glass, 0.0), (diffuse, 3.0)):
        b.add_node(mesh=b.add_mesh([(bp, bn, bu, bi, m, np.uint32)]),
                   translation=[x, 0, -1.5])
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, glow, np.uint16)]),
               matrix=[0.2, 0, 0, 0, 0, 0.2, 0, 0, 0, 0, 0.2, 0, 0, 4, 0, 1])
    b.add_node(light=b.add_light(intensity=50.0), translation=[0, 5, 8])
    b.add_node(camera=b.add_camera(1.0, 0.8), translation=[0, 0, 12])
    b.write(path)


def selftest() -> int:
    """Compiled-kernel (Mosaic) smoke test: the intersector paths must
    agree on real TPU hardware, where the CPU test suite only ever runs
    them interpreted (tests/conftest.py pins the CPU backend). Asserts,
    on a >4096-slot scene and a deterministic incoherent ray set:

    * brute / XLA-threaded / packet / strand closest hits commit the
      same TRIANGLE (compared by leaf-row data — SBVH duplication makes
      slot ids path-dependent) at the same t (<=1e-6 rel: XLA fuses each
      path's Moller-Trumbore differently);
    * any-hit blocked sets are identical.

    Exit codes: 0 = pass, 42 = no TPU (callers skip), 1 = mismatch.
    """
    import jax.numpy as jnp

    try:
        platform = jax.devices()[0].platform.lower()
        # liveness probe: a wedged tunnel can pass devices() and then
        # raise Unavailable/FailedPrecondition at the first computation
        float(jnp.zeros((), jnp.float32) + 1.0)
    except Exception as e:  # backend init failed (tunnel down/wedged)
        log(f"[selftest] TPU backend unavailable ({e!r}): skip")
        return 42
    if "tpu" not in platform and "axon" not in platform:
        log("[selftest] no TPU backend (platform={}): skip".format(platform))
        return 42
    from benchmarks.scenes import build_atrium
    from raytpu.kernels.intersect import make_intersectors
    from raytpu.kernels.intersect_pallas import make_packet_intersectors
    from raytpu.kernels.strand import make_strand_intersectors

    scene = build_atrium(6000)
    pack = pack_scene(scene)
    assert pack.n_triangles > 4096 and pack.bvh.strand_rows is not None

    rng = np.random.default_rng(7)
    n = 16384
    ro = (rng.random((n, 3), np.float32) - 0.5) * 14
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    octant = (rd[:, 0] < 0) + 2 * (rd[:, 1] < 0) + 4 * (rd[:, 2] < 0)
    idx = np.argsort(octant, kind="stable")  # strand-kernel invariant
    ro, rd = jnp.asarray(ro[idx]), jnp.asarray(rd[idx])
    tmax = jnp.full((n,), 3.40282347e38, jnp.float32)
    stmax = jnp.full((n,), 4.0, jnp.float32)

    paths = {
        "brute": make_intersectors(pack, which="brute"),
        "bvh": make_intersectors(pack, which="bvh"),
        "packet": make_packet_intersectors(pack),
        "strand": make_strand_intersectors(pack),
    }
    lv = np.asarray(pack.bvh.leaf_tris).reshape(-1, 10)[:, :9]
    ok = True
    base = None
    for name, (closest, any_fn) in paths.items():
        # tmin rides as a Python float: the Pallas factories bake it and
        # verify the per-call value at trace time (a traced tmin would
        # raise — by design, VERDICT r3 item 6)
        hit = jax.jit(
            lambda ro, rd, tmax, c=closest: c(ro, rd, 0.001, tmax)
        )(ro, rd, tmax)
        blocked = np.asarray(
            jax.jit(
                lambda ro, rd, tmax, a=any_fn: a(ro, rd, 0.0, tmax)
            )(ro, rd, stmax)
        )
        t = np.asarray(hit.t)
        tri = np.asarray(hit.tri)
        if base is None:
            base = (t, tri, blocked)
            log(f"[selftest] {name}: {int((tri >= 0).sum())} hits, "
                f"{int(blocked.sum())} blocked (reference)")
            continue
        bt, btri, bblocked = base
        h = tri >= 0
        same_hits = bool((h == (btri >= 0)).all())
        same_tri = same_hits and bool((lv[tri[h]] == lv[btri[h]]).all())
        same_t = same_hits and bool(
            np.allclose(t[h], bt[h], rtol=1e-6, atol=0.0)
        )
        same_blk = bool((blocked == bblocked).all())
        log(f"[selftest] {name}: tri={same_tri} t={same_t} "
            f"blocked={same_blk}")
        ok = ok and same_tri and same_t and same_blk
    log(f"[selftest] {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def main():
    if "--selftest" in sys.argv:
        sys.exit(selftest())
    quick = "--quick" in sys.argv

    secondary = {}

    cube = raytpu.load_scene("/root/reference/cube.glb")
    cube_cam = raytpu.load_camera_json("/root/reference/camera.json", 512, 512)
    cube_pack = pack_scene(cube)
    cube_campk = pack_camera(cube_cam)

    # config 1: primary rays, flat shading, 512x512
    cfg1 = raytpu.RenderConfig(width=512, height=512, seed=1, samples=1,
                               bounces=1, chunk_size=64, mode="flat")
    # config 2: diffuse path tracing, 4 bounces
    cfg2 = raytpu.RenderConfig(width=512, height=512, seed=1, samples=4,
                               bounces=4, chunk_size=64)
    secondary["cube_flat"], _ = bench_config("cube flat 512x512x1",
                                             cube_pack, cube_campk, cfg1)
    secondary["cube"], _ = bench_config("cube path 512x512x4spp",
                                        cube_pack, cube_campk, cfg2)

    # config 3: multi-mesh glTF scene through the BVH path
    os.makedirs(CACHE, exist_ok=True)
    multi_path = os.path.join(CACHE, "multi_mesh.glb")
    if not os.path.exists(multi_path):
        _build_multi_mesh_glb(multi_path)
    multi = raytpu.load_scene(multi_path)
    cfg3 = raytpu.RenderConfig(width=256, height=256, seed=1, samples=2,
                               bounces=3, chunk_size=32,
                               bruteforce_max_tris=64)
    secondary["multi"], _ = bench_config(
        "multi-mesh 256x256x2spp", pack_scene(multi),
        pack_camera(multi.camera), cfg3)

    # config 4: PBR materials + emissive + NEE
    pbr_path = os.path.join(CACHE, "pbr_nee.glb")
    if not os.path.exists(pbr_path):
        _build_pbr_nee_glb(pbr_path)
    pbr = raytpu.load_scene(pbr_path)
    cfg4 = raytpu.RenderConfig(width=256, height=256, seed=1, samples=4,
                               bounces=4, chunk_size=32)
    secondary["pbr"], _ = bench_config("pbr+nee 256x256x4spp",
                                       pack_scene(pbr),
                                       pack_camera(pbr.camera), cfg4)

    # config 5 (headline): Sponza-class 1080p wavefront path tracing
    tris = 20_000 if quick else 250_000
    scene, pack = _cached_atrium(tris)
    campk = pack_camera(scene.camera)
    w, h = (640, 360) if quick else (1920, 1080)
    cfg5 = raytpu.RenderConfig(width=w, height=h, seed=1, samples=1,
                               bounces=4, chunk_size=8)
    mrays, ms = bench_config(f"atrium({tris}) {w}x{h}", pack, campk, cfg5,
                             repeats=2)

    # config 6 (guardrail, embedded in the artifact JSON): the
    # beyond-VMEM stream scene — the scaling story matching the
    # reference's "scales to whatever memory holds"
    # (/root/reference/src/state.rs:1145-1246). Auto-routes to the HBM
    # strand path (r5: 0.3 -> 3.5 Mrays/s vs the binned treelet route,
    # which RAYTPU_STREAM_BINNED=1 restores for A/Bs). The packet
    # kernel's resident tables are dropped at pack time (tables='auto'),
    # so this line rots loudly if the streamed path ever regresses.
    # Skippable for fast local runs with RAYTPU_BENCH_NO_STREAM=1.
    if not quick and not os.environ.get("RAYTPU_BENCH_NO_STREAM"):
        tris6 = 2_900_000
        scene6, pack6 = _cached_atrium(tris6)
        assert pack6.bvh.node8_rows is None, "stream pack kept resident tables"
        assert pack6.bvh.strand_rows is not None, (
            "stream pack lost the HBM strand tree"
        )
        cfg6 = raytpu.RenderConfig(width=640, height=360, seed=1,
                                   samples=1, bounces=4, chunk_size=8,
                                   # A/B: the old binned treelet route
                                   # vs the default HBM strand route
                                   intersector=(
                                       "binned"
                                       if os.environ.get(
                                           "RAYTPU_STREAM_BINNED")
                                       else "auto"
                                   ))
        secondary["stream"], _ = bench_config(
            f"stream({tris6}) 640x360", pack6,
            pack_camera(scene6.camera), cfg6, repeats=2)

    # re-print the secondaries LAST so the driver's tail capture keeps
    # them (VERDICT r4 item 5: the early stderr lines were truncated out
    # of BENCH_r04.json), and embed them in the parsed JSON object so
    # regression gates stay checkable from the artifact alone.
    secondary = {k: round(v, 2) for k, v in secondary.items()}
    log(f"[bench] secondary Mrays/s: {json.dumps(secondary)}")
    print(json.dumps({
        "metric": "Mrays/sec/chip, Sponza-class atrium 1080p, 4 bounces",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 200.0, 4),
        "secondary": secondary,
    }))


if __name__ == "__main__":
    main()
