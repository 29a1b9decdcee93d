"""Treelet decomposition + binned wavefront traversal (kernels/binned.py).

The binned path must return what the brute-force sweep returns
(lowest-slot tie semantics) for mixed closest/shadow/dead ray sets, and
the engine's binned bounce backend must render the same frame as the XLA
threaded path — both up to the CPU interpret-mode ulp caveat documented
in tests/imgdiff.py."""

from types import SimpleNamespace

import numpy as np
import pytest
import jax.numpy as jnp

from raytpu.accel.bvh import LEAF_SIZE, build_bvh
from raytpu.accel.treelets import build_treelets, validate_treelets
from raytpu.kernels.binned import make_binned_query
from raytpu.kernels.intersect import (
    F32_MAX,
    intersect_any_bruteforce,
    intersect_bruteforce,
)

from .imgdiff import assert_images_equiv, cached_atrium_pack
from .test_intersect import _build_bvh_pack, _random_soup


def _soup_treelets(n_tris, seed, budget_rows):
    rng = np.random.default_rng(seed)
    a, b, c = _random_soup(n_tris, rng)
    p0, e1, e2 = a, b - a, c - a
    bvh, bvh8 = build_bvh(p0, e1, e2)
    _, bpack, rp0, re1, re2 = _build_bvh_pack(p0, e1, e2)
    tl = build_treelets(
        bvh8, np.asarray(bpack.leaf_tris), budget_rows=budget_rows
    )
    return rng, bvh8, tl, rp0, re1, re2


def test_treelet_structure_partitions_tree():
    rng, bvh8, tl, *_ = _soup_treelets(3000, seed=7, budget_rows=32)
    assert tl.n_treelets > 4  # the small budget forces a real frontier
    validate_treelets(tl, bvh8)


def test_treelet_single_treelet_when_budget_huge():
    rng, bvh8, tl, *_ = _soup_treelets(100, seed=3, budget_rows=10_000)
    assert tl.n_treelets == 1
    validate_treelets(tl, bvh8)


@pytest.mark.slow
def test_binned_query_matches_bruteforce_interpret():
    rng, bvh8, tl, rp0, re1, re2 = _soup_treelets(
        2000, seed=11, budget_rows=48
    )
    pack = SimpleNamespace(
        tl_nodes=jnp.asarray(tl.tnodes),
        tl_leaves=jnp.asarray(tl.tleaves),
        tl_bmin=jnp.asarray(tl.tbox_min),
        tl_bmax=jnp.asarray(tl.tbox_max),
    )
    query = make_binned_query(pack, interpret=True, packet=128)

    n = 512  # half closest, half shadow, a few dead lanes of each
    h = n // 2
    ro = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    sdist = rng.uniform(1, 20, h).astype(np.float32)
    tmax = np.full(n, float(F32_MAX), np.float32)
    tmax[h:] = sdist
    tmax[5] = -np.inf
    tmax[h + 9] = -np.inf
    smask = np.zeros(n, np.float32)
    smask[h:] = 1.0

    t, tri = query(
        ro, rd, jnp.asarray(tmax), jnp.asarray(smask),
        tmin=0.001, shadow_tmin=0.0,
    )
    t, tri = np.asarray(t), np.asarray(tri)

    brute = intersect_bruteforce(
        ro[:h], rd[:h], rp0, re1, re2, 0.001, F32_MAX, chunk=8
    )
    live_c = tmax[:h] >= 0
    bt = np.asarray(brute.t)
    btri = np.asarray(brute.tri)
    # CPU interpret-mode caveat: Pallas kernels fuse into the surrounding
    # XLA program, and XLA's rounding of the fused Moller-Trumbore chain is
    # program-shape-dependent — the same (ray, triangle) pair can come out
    # one ulp apart in two different programs (verified: the RESIDENT
    # kernel also flips when the batch shape changes). Real Mosaic-compiled
    # kernels on TPU are bit-stable (the engine equality tests pin that).
    # CPU bar: t within 1 ulp; winners exact except at sub-ulp near-ties.
    np.testing.assert_allclose(
        t[:h][live_c], bt[live_c], rtol=3e-7, atol=0
    )
    tri_match = tri[:h] == btri
    near_tie = np.abs(t[:h] - bt) <= 3e-7 * np.abs(bt)
    assert (tri_match | near_tie)[live_c].all()
    assert tri_match[live_c].mean() > 0.95
    assert (tri[:h][~live_c] == -1).all()

    blocked = intersect_any_bruteforce(
        ro[h:], rd[h:], rp0, re1, re2, 0.0, jnp.asarray(tmax[h:]),
        chunk=8,
    )
    live_s = tmax[h:] >= 0
    np.testing.assert_array_equal(
        (tri[h:] >= 0)[live_s], np.asarray(blocked)[live_s]
    )
    assert (tri[h:][~live_s] == -1).all()


@pytest.mark.slow
def test_binned_engine_matches_threaded():
    # fast-tier binned-engine coverage lives in
    # test_stream_pack_drops_resident_tables_and_renders_binned
    import raytpu
    from benchmarks.scenes import build_atrium
    from raytpu.engine.render import render_frame
    from raytpu.scene.pack import pack_camera, pack_scene

    scene, pack = cached_atrium_pack(5000)
    assert pack.tl_nodes is not None  # auto treelets above 4096 tris
    cam = pack_camera(scene.camera)
    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    binned = render_frame(
        pack, cam,
        raytpu.RenderConfig(**kw, intersector="packet",
                            bounce_backend="binned"),
    )
    assert_images_equiv(ref, binned)


def test_stream_pack_drops_resident_tables_and_renders_binned():
    """tables='stream' packs drop the packet kernel's resident tables
    (the beyond-VMEM memory diet, VERDICT r2 item 9) but keep the strand
    tree + leaf rows for the HBM strand route (tree_any); the binned
    intersector still matches the full pack's threaded walk."""
    import raytpu
    from benchmarks.scenes import build_atrium
    from raytpu.engine.render import render_frame
    from raytpu.scene.pack import pack_camera, pack_scene

    scene, full = cached_atrium_pack(5000)
    stream = pack_scene(scene, tables="stream")
    assert stream.bvh.node8_rows is None
    assert stream.bvh.ribbon_rows is None
    assert stream.bvh.leaf_tris is not None  # HBM strand route
    assert stream.bvh.strand_rows is not None
    assert stream.tl_nodes is not None
    cam = pack_camera(scene.camera)
    kw = dict(width=32, height=24, seed=3, samples=1, bounces=2,
              chunk_size=8)
    ref = render_frame(full, cam,
                       raytpu.RenderConfig(**kw, intersector="bvh"))
    binned = render_frame(
        stream, cam, raytpu.RenderConfig(**kw, intersector="binned")
    )
    assert_images_equiv(ref, binned)


@pytest.mark.slow
def test_stream_pack_renders_hbm_strand(monkeypatch):
    """The beyond-VMEM default route: stream pack + intersector='strand'
    with RAYTPU_STRAND_HBM=1 (tree_any forced on the small tables) must
    match the full pack's threaded walk. This is the engine path the
    'auto' intersector picks on TPU for scenes past the packet kernel's
    VMEM budget (render._choose_intersectors)."""
    import raytpu
    from raytpu.engine.render import render_frame
    from raytpu.scene.pack import pack_camera, pack_scene

    monkeypatch.setenv("RAYTPU_STRAND_HBM", "1")
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")
    scene, full = cached_atrium_pack(5000)
    stream = pack_scene(scene, tables="stream")
    cam = pack_camera(scene.camera)
    kw = dict(width=32, height=24, seed=3, samples=1, bounces=2,
              chunk_size=8)
    ref = render_frame(full, cam,
                       raytpu.RenderConfig(**kw, intersector="bvh"))
    got = render_frame(
        stream, cam, raytpu.RenderConfig(**kw, intersector="strand")
    )
    assert_images_equiv(ref, got)
