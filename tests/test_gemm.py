"""GEMM intersector correctness (kernels/gemm.py).

This path is deliberately NOT bit-identical to the Moller-Trumbore
engines (Woop transform + MXU accumulation order), so assertions are
tolerance-based — the parity bar that matters is the driver's
SSIM >= 0.99 at seed tolerance (BASELINE.json), not bit equality.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.kernels.gemm import gemm_query, gemm_tables_from_pack
from raytpu.kernels.intersect import intersect_bruteforce

from .imgdiff import cached_atrium_pack


@pytest.fixture(scope="module")
def gemm_setup():
    _, pack = cached_atrium_pack(3000)
    gt = gemm_tables_from_pack(pack, budget_rows=256)
    rng = np.random.default_rng(7)
    R = 2048
    lo = np.asarray(pack.scene_bmin)
    hi = np.asarray(pack.scene_bmax)
    ro = jnp.asarray(rng.uniform(lo, hi, (R, 3)).astype(np.float32))
    d = rng.normal(size=(R, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return pack, gt, ro, jnp.asarray(d)


def test_gemm_closest_matches_brute(gemm_setup):
    pack, gt, ro, rd = gemm_setup
    R = ro.shape[0]
    tmax = jnp.full((R,), 3.4e38, jnp.float32)
    t_g, tri_g, ov = gemm_query(
        gt.wo, gt.wd, gt.slot, gt.tbox_min, gt.tbox_max,
        ro, rd, tmax, tmin=0.001, slab_rays=2048,
    )
    assert int(ov) == 0
    hit_b = intersect_bruteforce(
        ro, rd, pack.tri_p0, pack.tri_e1, pack.tri_e2,
        jnp.float32(0.001), tmax,
    )
    t_g, tri_g = np.asarray(t_g), np.asarray(tri_g)
    t_b, tri_b = np.asarray(hit_b.t), np.asarray(hit_b.tri)
    # hit/miss sets may differ only at grazing rays (ulp-level t);
    # demand near-total agreement and tight t error on common hits
    agree = ((tri_g >= 0) == (tri_b >= 0)).mean()
    assert agree >= 0.999, agree
    both = (tri_g >= 0) & (tri_b >= 0)
    rel = np.abs(t_g[both] - t_b[both]) / np.maximum(t_b[both], 1e-6)
    assert np.percentile(rel, 99) < 1e-4, np.percentile(rel, 99)
    # committed triangles agree wherever the t winner is unambiguous
    same = (tri_g[both] == tri_b[both]).mean()
    assert same >= 0.995, same


def test_gemm_any_hit_matches_brute(gemm_setup):
    pack, gt, ro, rd = gemm_setup
    from raytpu.kernels.intersect import intersect_any_bruteforce

    R = ro.shape[0]
    # finite shadow-style range
    tmax = jnp.full((R,), 2.5, jnp.float32)
    _, tri_g, ov = gemm_query(
        gt.wo, gt.wd, gt.slot, gt.tbox_min, gt.tbox_max,
        ro, rd, tmax, tmin=0.0, any_hit=True, slab_rays=2048,
    )
    assert int(ov) == 0
    blocked_b = np.asarray(intersect_any_bruteforce(
        ro, rd, pack.tri_p0, pack.tri_e1, pack.tri_e2,
        jnp.float32(0.0), tmax,
    ))
    blocked_g = np.asarray(tri_g) >= 0
    assert (blocked_g == blocked_b).mean() >= 0.999


def test_gemm_engine_render_close_to_bvh():
    """Full engine render through intersector='gemm' vs the threaded
    walk. Ulp-level t differences can re-route individual paths, so the
    bar is structural (SSIM) rather than pixel-exact — the driver's
    criterion is SSIM >= 0.99 at seed tolerance."""
    import raytpu
    from raytpu.engine.render import render_frame
    from raytpu.io.metrics import ssim
    from raytpu.scene.pack import pack_camera

    from benchmarks.scenes import build_atrium
    from raytpu.scene.pack import pack_scene

    scene = build_atrium(3000)
    pack = pack_scene(scene, gemm="always")
    cam = pack_camera(scene.camera)
    kw = dict(width=48, height=32, seed=3, samples=1, bounces=3,
              chunk_size=8)
    ref = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                      intersector="bvh"))
    gemm = render_frame(pack, cam, raytpu.RenderConfig(**kw,
                                                       intersector="gemm"))
    s = ssim(np.asarray(ref)[..., :3], np.asarray(gemm)[..., :3],
             data_range=1.0)
    assert s >= 0.99, s
