"""Golden rendering tests: the JAX engine vs the scalar numpy oracle on the
reference's own fixture (cube.glb + camera.json). The oracle replays
src/shader.wgsl's exact semantics, so these are the de-facto parity tests
(SURVEY.md §4). A small set of pixels may flip across implementations where
shadow rays sit one ulp off a surface (FMA contraction differences); the
thresholds below pin that flip rate down hard."""

import numpy as np
import pytest

import raytpu
from raytpu.io.metrics import psnr, ssim
from raytpu.io.png import quantize_rgba32f
from raytpu.oracle.reference import OracleRenderer


@pytest.fixture(scope="module")
def oracle(cube_scene, cube_camera):
    return OracleRenderer(cube_scene, cube_camera)


def _compare(frame, ref, min_exact=0.85, max_flips=0.03, min_ssim=0.98):
    d = np.abs(frame - ref).max(axis=-1)
    exact = float(np.mean(d == 0))
    flips = float(np.mean(d > 1e-3))
    s = ssim(quantize_rgba32f(frame), quantize_rgba32f(ref))
    assert exact >= min_exact, f"bit-exact fraction {exact}"
    assert flips <= max_flips, f"branch-flip fraction {flips}"
    assert s >= min_ssim, f"SSIM {s}"


def test_primary_only(cube_scene, cube_camera, oracle):
    cfg = raytpu.RenderConfig(width=64, height=64, seed=1, samples=1,
                              bounces=1, chunk_size=32)
    frame = np.asarray(raytpu.render(cube_scene, cube_camera, cfg))
    ref = oracle.render(64, 64, 1, 1, 1, 32)
    _compare(frame, ref)


def test_path_traced_multi_sample(cube_scene, cube_camera, oracle):
    cfg = raytpu.RenderConfig(width=64, height=64, seed=7, samples=4,
                              bounces=4, chunk_size=32)
    frame = np.asarray(raytpu.render(cube_scene, cube_camera, cfg))
    ref = oracle.render(64, 64, 7, 4, 4, 32)
    _compare(frame, ref)
    assert psnr(quantize_rgba32f(frame), quantize_rgba32f(ref)) > 35.0


@pytest.mark.slow
def test_path_traced_128_bar(cube_scene, cube_camera, oracle):
    """The BASELINE.json parity bar (SSIM >= 0.99) at 128x128 — the highest
    resolution the scalar oracle affords in CI."""
    cfg = raytpu.RenderConfig(width=128, height=128, seed=5, samples=2,
                              bounces=4, chunk_size=32)
    frame = np.asarray(raytpu.render(cube_scene, cube_camera, cfg))
    ref = oracle.render(128, 128, 5, 2, 4, 32)
    _compare(frame, ref, min_ssim=0.99)
    assert psnr(quantize_rgba32f(frame), quantize_rgba32f(ref)) > 35.0


def test_seed_changes_image(cube_scene, cube_camera):
    cfg1 = raytpu.RenderConfig(width=32, height=32, seed=1, samples=1,
                               bounces=4, chunk_size=16)
    cfg2 = raytpu.RenderConfig(width=32, height=32, seed=2, samples=1,
                               bounces=4, chunk_size=16)
    f1 = np.asarray(raytpu.render(cube_scene, cube_camera, cfg1))
    f2 = np.asarray(raytpu.render(cube_scene, cube_camera, cfg2))
    assert np.abs(f1 - f2).max() > 0


def test_chunk_size_changes_rng_tiling(cube_scene, cube_camera):
    """chunk_size only affects RNG seeding (src/shader.wgsl:398-404), so the
    image changes but its statistics stay put."""
    cfg1 = raytpu.RenderConfig(width=32, height=32, seed=1, samples=2,
                               bounces=2, chunk_size=16)
    cfg2 = raytpu.RenderConfig(width=32, height=32, seed=1, samples=2,
                               bounces=2, chunk_size=32)
    f1 = np.asarray(raytpu.render(cube_scene, cube_camera, cfg1))
    f2 = np.asarray(raytpu.render(cube_scene, cube_camera, cfg2))
    assert np.abs(f1 - f2).max() > 0
    assert abs(f1.mean() - f2.mean()) < 0.02


def test_non_divisible_sizes_truncate_x_but_not_y(cube_scene, cube_camera,
                                                  oracle):
    """The reference's over-dispatching chunk loop (is_finished,
    src/state.rs:330-334) combined with the shader's pixel.y > height guard
    (src/shader.wgsl:406-408) means partial bottom ROWS render while partial
    right COLUMNS stay black: the x axis truncates to whole chunks, the y
    axis only to the frame."""
    cfg = raytpu.RenderConfig(width=50, height=40, seed=1, samples=1,
                              bounces=1, chunk_size=16)
    frame = np.asarray(raytpu.render(cube_scene, cube_camera, cfg))
    assert (frame[:, 48:] == 0).all()  # 50//16*16 = 48: x truncated
    ref = oracle.render(50, 40, 1, 1, 1, 16)
    d = np.abs(frame - ref).max(axis=-1)
    assert float(np.mean(d > 1e-3)) <= 0.03

    # the extreme case: height (12) < chunk_size (16). The old
    # full-chunks-only reading renders NOTHING here; the reference's
    # over-dispatch + y>height guard renders every row.
    from raytpu.scene.pack import pack_camera, pack_scene

    cam12 = raytpu.load_camera_json("/root/reference/camera.json", 48, 12)
    cfg12 = raytpu.RenderConfig(width=48, height=12, seed=1, samples=1,
                                bounces=1, chunk_size=16)
    f12 = np.asarray(
        raytpu.render_frame(pack_scene(cube_scene), pack_camera(cam12),
                            cfg12)
    )
    assert (f12.max(axis=-1) > 0).any()  # rows < chunk_size DO render
    ref12 = OracleRenderer(cube_scene, cam12).render(48, 12, 1, 1, 1, 16)
    d12 = np.abs(f12 - ref12).max(axis=-1)
    assert float(np.mean(d12 > 1e-3)) <= 0.03


def test_flat_mode(cube_scene, cube_camera):
    cfg = raytpu.RenderConfig(width=32, height=32, seed=1, samples=1,
                              bounces=1, chunk_size=16, mode="flat")
    frame = np.asarray(raytpu.render(cube_scene, cube_camera, cfg))
    # cube base color is 0.8 grey; hits show it, misses are black
    hit_mask = frame[..., 0] > 0
    assert hit_mask.any() and not hit_mask.all()
    np.testing.assert_allclose(
        frame[hit_mask][:, :3], 0.8, atol=1e-5
    )


def test_tile_rows_do_not_change_image(cube_scene, cube_camera):
    base = raytpu.RenderConfig(width=32, height=32, seed=3, samples=2,
                               bounces=3, chunk_size=16)
    tiled = raytpu.RenderConfig(width=32, height=32, seed=3, samples=2,
                                bounces=3, chunk_size=16, tile_rows=5)
    f1 = np.asarray(raytpu.render(cube_scene, cube_camera, base))
    f2 = np.asarray(raytpu.render(cube_scene, cube_camera, tiled))
    np.testing.assert_array_equal(f1, f2)


def test_png_quantization_matches_rust_saturating_cast(tmp_path):
    frame = np.zeros((1, 4, 4), np.float32)
    frame[0, 0] = [0.5, 1.5, -0.25, 1.0]  # mid / over / under
    frame[0, 1] = [np.nan, np.inf, -np.inf, 0.0]
    frame[0, 2] = [1.0, 0.999999, 1.0 / 255.0, 0.0]
    q = quantize_rgba32f(frame)
    np.testing.assert_array_equal(q[0, 0], [127, 255, 0])
    np.testing.assert_array_equal(q[0, 1], [0, 255, 0])
    np.testing.assert_array_equal(q[0, 2], [255, 254, 1])
    raytpu.write_png(str(tmp_path / "t.png"), frame)
    from PIL import Image

    back = np.asarray(Image.open(tmp_path / "t.png"))
    np.testing.assert_array_equal(back, q)
