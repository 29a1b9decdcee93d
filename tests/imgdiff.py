"""Cross-engine image comparison for CPU (interpret-mode) tests.

Two renders of the same scene through different intersector backends are
*semantically* identical, but bit-equality across whole frames is not a
stable CPU bar: Pallas interpret-mode kernels fuse into the surrounding
XLA program, and XLA's rounding of the fused Moller-Trumbore chain is
program-shape dependent — the same (ray, triangle) pair can come out one
ulp apart in two different programs (adding an unused array to the scene
pytree is enough to reshuffle it). A 1-ulp hit-t flip can divergently
re-route a whole light path, so a handful of pixels may differ outright.

The stable bar: the overwhelming majority of pixels bit-equal, the frame
structurally identical. Mosaic-compiled kernels on real TPU hardware do
not have this variance (bench checksums are bit-equal across backends).
"""

import numpy as np


def assert_images_equiv(a, b, max_frac_diff: float = 0.02,
                        min_ssim: float = 0.99):
    from raytpu.io.metrics import ssim

    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape
    diff = np.any(a != b, axis=-1)
    frac = float(diff.mean())
    assert frac <= max_frac_diff, (
        f"{frac:.4f} of pixels differ (> {max_frac_diff})"
    )
    s = ssim(a[..., :3], b[..., :3], data_range=1.0)
    assert s >= min_ssim, f"ssim {s:.5f} < {min_ssim}"


import functools


@functools.lru_cache(maxsize=None)
def cached_atrium_pack(tris: int):
    """(scene, pack) for the procedural atrium, shared across test
    modules within one pytest process — the SBVH + strand-tree build is
    ~10s per call and several engine-parity tests use the same scene."""
    from benchmarks.scenes import build_atrium
    from raytpu.scene.pack import pack_scene

    scene = build_atrium(tris)
    return scene, pack_scene(scene)
