"""Engine parity for the mixed / deferred-NEE packet path.

The packet path on large scenes defers each bounce's NEE shadow query into
the next bounce's mixed traversal (engine/render.py::_trace_paths with
mixed_fn) and runs the capped two-round traversal. Per-lane RNG sequences
and radiance addition order are preserved exactly (SURVEY.md §7 parity
bar); on CPU the comparison allows the interpret-mode ulp flips described
in tests/imgdiff.py."""

import numpy as np

import raytpu
from benchmarks.scenes import build_atrium
from raytpu.engine.render import render_frame
from raytpu.scene.pack import pack_camera, pack_scene

from .imgdiff import assert_images_equiv


def test_mixed_deferred_nee_matches_legacy():
    scene = build_atrium(5000)
    pack = pack_scene(scene)
    cam = pack_camera(scene.camera)
    assert pack.n_triangles > 4096  # sort_bounced + mixed path triggers

    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    # default packet path (sorted separate queries)
    sorted_q = render_frame(
        pack, cam, raytpu.RenderConfig(**kw, intersector="packet")
    )
    # mixed deferred-NEE backend: capped two rounds
    capped = render_frame(
        pack, cam,
        raytpu.RenderConfig(**kw, intersector="packet",
                            bounce_backend="mixed"),
    )
    # capping disabled exercises the single-round branch
    uncapped = render_frame(
        pack, cam,
        raytpu.RenderConfig(**kw, intersector="packet",
                            bounce_backend="mixed", bounce_cap_frac=0.0),
    )
    assert_images_equiv(capped, uncapped)
    assert_images_equiv(ref, sorted_q)
    assert_images_equiv(ref, capped)
