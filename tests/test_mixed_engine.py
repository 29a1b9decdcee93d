"""Engine parity for the packet path's bounce-wave routing.

Fast tier: test_small_scene_strand_routing_matches_legacy is the one
unmarked representative (interpreted-Pallas double renders at 5000
tris cost minutes each on the forced-CPU backend — VERDICT r4 item
7); the full matrix runs under -m slow.

On scenes past the bounce-sort threshold (>4096 slots) the engine sorts
bounce waves for coherence and — when the pack carries a strand tree —
routes them to the strand kernel, keeping the packet kernel for
primary/first-shadow waves (engine/render.py::_trace_paths bounce_pair).
The frame must match the plain XLA threaded-BVH render exactly: per-lane
RNG sequences and radiance addition order are preserved (SURVEY.md §7
parity bar); on CPU the comparison allows the interpret-mode ulp flips
described in tests/imgdiff.py.

(The round-2 resident deferred-NEE "mixed" backend this file used to
cover was retired as a measured end-to-end loss — docs/PROFILE_r2.md.)
"""

import pytest

import raytpu
from benchmarks.scenes import build_atrium
from raytpu.engine.render import render_frame
from raytpu.scene.pack import pack_camera, pack_scene

from .imgdiff import assert_images_equiv, cached_atrium_pack


@pytest.mark.slow
def test_strand_bounce_routing_matches_legacy():
    scene, pack = cached_atrium_pack(5000)
    cam = pack_camera(scene.camera)
    assert pack.n_triangles > 4096  # sort_bounced triggers
    assert pack.bvh.strand_rows is not None  # strand routing engages

    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    # packet path: sorted bounce waves ride the strand kernel
    sorted_q = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    assert_images_equiv(ref, sorted_q)


@pytest.mark.slow
def test_segmented_sort_matches_legacy(monkeypatch):
    """RAYTPU_SORT_MODE=seg sorts the wave in independent segments so
    each sort's working set stays on XLA's VMEM sort path (the full-wave
    sort spills past ~10 operands x 1M rows, docs/PROFILE_r3.md). A tiny
    segment length forces multiple segments AND tail padding; the frame
    must still match the plain XLA walk bit-for-bit (per-ray math never
    depends on wave order; unsort restores exact positions)."""
    monkeypatch.setenv("RAYTPU_SORT_MODE", "seg")
    monkeypatch.setenv("RAYTPU_SORT_SEG", "512")
    scene, pack = cached_atrium_pack(5000)
    cam = pack_camera(scene.camera)
    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    sorted_q = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    assert_images_equiv(ref, sorted_q)


@pytest.mark.slow
def test_persistent_strand_engine_matches_legacy(monkeypatch):
    """RAYTPU_STRAND_PERSISTENT=1 routes sorted bounce waves to the
    persistent-refill kernel (kernels/strand_persistent.py); frames must
    match the plain XLA walk exactly (tiny walker pool forces refills)."""
    monkeypatch.setenv("RAYTPU_STRAND_PERSISTENT", "1")
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")
    scene, pack = cached_atrium_pack(5000)
    cam = pack_camera(scene.camera)
    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    sorted_q = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    assert_images_equiv(ref, sorted_q)


@pytest.mark.slow
def test_compact_wave_mode_matches_legacy(monkeypatch):
    """RAYTPU_WAVE_MODE=compact runs the whole bounce pipeline (closest
    query, tri_row gather, shading, RNG, NEE shadow query) on the live
    prefix of the coherence-sorted wave, unsorting radiance deltas +
    path state back per bounce. Per-lane math, masked RNG replay and
    radiance add order are unchanged (emissive/NEE terms are per-lane
    disjoint), so the frame must match the plain XLA walk exactly. A
    tiny divisor list forces multiple prefix tiers to execute across the
    frame's bounces."""
    monkeypatch.setenv("RAYTPU_WAVE_MODE", "compact")
    monkeypatch.setenv("RAYTPU_COMPACT_DIV", "8,2")
    # tiny walker pool: interpret-mode persistent kernels trace/run fast
    # AND refills are forced mid-wave (same trick as the persistent test)
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")
    scene, pack = cached_atrium_pack(5000)
    cam = pack_camera(scene.camera)
    kw = dict(width=64, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    compact = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    assert_images_equiv(ref, compact)


@pytest.mark.slow
def test_fused_wave_mode_matches_legacy(monkeypatch):
    """RAYTPU_WAVE_MODE=fused keeps the wave in coherence-sorted order
    ACROSS bounces (compact without the per-bounce unsort): each bounce
    sorts only the previous work-tier window via lax.switch, runs the
    pipeline at the live prefix, and one 5-operand unsort at path exit
    restores pixel order. Per-lane math is order/width-independent and
    (key, pxi) is a unique 2-level sort key, so the frame must match the
    plain XLA walk exactly. Tiny divisors + walker pool force multiple
    windows, tiers and refills to execute."""
    monkeypatch.setenv("RAYTPU_WAVE_MODE", "fused")
    monkeypatch.setenv("RAYTPU_COMPACT_DIV", "8,2")
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")
    scene, pack = cached_atrium_pack(5000)
    cam = pack_camera(scene.camera)
    kw = dict(width=64, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    fused = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    assert_images_equiv(ref, fused)


def test_small_scene_strand_routing_matches_legacy(monkeypatch):
    """The round-3 threshold drop (4096 -> 256 slots, PROFILE_r3.md
    finding 3) put small BVH scenes on sorted strand bounces too; the
    780-slot range must still match the plain XLA walk exactly.
    A tiny walker pool keeps the interpret-mode persistent kernel fast
    (this is the module's fast-tier representative) AND forces mid-wave
    refills."""
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")
    scene, pack = cached_atrium_pack(600)
    cam = pack_camera(scene.camera)
    assert 256 < pack.n_triangles <= 4096  # the newly-routed range
    assert pack.bvh.strand_rows is not None

    kw = dict(width=32, height=24, seed=5, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    sorted_q = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    assert_images_equiv(ref, sorted_q)


@pytest.mark.slow
def test_mixed_persistent_engine_matches_legacy(monkeypatch):
    """bounce_backend='mixed': bounce b's NEE shadow wave rides bounce
    b+1's continuation launch on the persistent strand kernel with
    per-lane any-hit flags (strand_query_persistent mixed=True). The
    deferred radiance additions happen in the reference's per-lane order
    (a bounce's NEE lands before the next bounce's emissive term), so
    the frame must match the plain XLA walk exactly. Tiny walker pool
    forces refills mid-wave."""
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")
    scene, pack = cached_atrium_pack(5000)
    cam = pack_camera(scene.camera)
    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    mixed = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet",
                                       bounce_backend="mixed")
    )
    assert_images_equiv(ref, mixed)
