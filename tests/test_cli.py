"""End-to-end CLI tests (flag surface parity with src/main.rs:30-52)."""

import numpy as np
import pytest
from PIL import Image

from raytpu.cli import main


def test_headless_render_writes_png(tmp_path):
    out = tmp_path / "out.png"
    rc = main([
        "--width", "32", "--height", "32", "--seed", "1",
        "--scene", "/root/reference/cube.glb",
        "--chunk-size", "16", "--samples", "1", "--bounces", "2",
        "--output", str(out),
        "--camera", "/root/reference/camera.json",
    ])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3)
    assert img.max() > 0


def test_gltf_camera_fallback(tmp_path):
    out = tmp_path / "out.png"
    rc = main([
        "--width", "32", "--height", "32", "--seed", "1",
        "--scene", "/root/reference/cube.glb",
        "--chunk-size", "16", "--samples", "1", "--bounces", "1",
        "--output", str(out),
    ])
    assert rc == 0
    assert out.exists()


def test_missing_scene_errors(tmp_path, capsys):
    rc = main([
        "--width", "32", "--height", "32", "--seed", "1",
        "--scene", str(tmp_path / "missing.glb"),
        "--chunk-size", "16", "--samples", "1", "--bounces", "1",
    ])
    assert rc == 1
    assert "failed to load scene file" in capsys.readouterr().err


def test_scene_without_camera_errors(tmp_path, capsys):
    import numpy as np
    from tests.tools.glb_writer import GlbBuilder, quad

    b = GlbBuilder()
    m = b.add_material()
    pos, nrm, uv, idx = quad()
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, m, np.uint16)]))
    p = tmp_path / "nocam.glb"
    b.write(str(p))
    rc = main([
        "--width", "16", "--height", "16", "--seed", "1",
        "--scene", str(p), "--chunk-size", "8", "--samples", "1",
        "--bounces", "1",
    ])
    assert rc == 1
    assert "failed to load camera from scene" in capsys.readouterr().err


def test_checkpoint_resume_identical(tmp_path, cube_scene):
    out1 = tmp_path / "a.png"
    out2 = tmp_path / "b.png"
    ckpt = tmp_path / "ck.npz"
    args = [
        "--width", "32", "--height", "32", "--seed", "2",
        "--scene", "/root/reference/cube.glb",
        "--chunk-size", "16", "--samples", "1", "--bounces", "2",
        "--camera", "/root/reference/camera.json",
    ]
    assert main(args + ["--output", str(out1)]) == 0
    # run with checkpointing; then "resume" from the finished checkpoint
    assert main(args + ["--output", str(out2), "--checkpoint",
                        str(ckpt)]) == 0
    a = np.asarray(Image.open(out1))
    b = np.asarray(Image.open(out2))
    np.testing.assert_array_equal(a, b)
    assert ckpt.exists()


def test_checkpoint_partial_resume(tmp_path, cube_scene, cube_camera):
    import raytpu
    from raytpu.engine.progressive import render_with_checkpoint
    from raytpu.scene.pack import pack_camera, pack_scene

    pack = pack_scene(cube_scene)
    cam = pack_camera(cube_camera)
    cfg = raytpu.RenderConfig(width=32, height=32, seed=3, samples=1,
                              bounces=2, chunk_size=16, tile_rows=8)
    full = np.asarray(raytpu.render_frame(pack, cam, cfg))

    ckpt = str(tmp_path / "p.npz")
    # simulate an interrupted run: render only the first two tiles
    partial = np.zeros((32, 32, 4), np.float32)
    from raytpu.engine.render import render_frame_tiles

    tiles = render_frame_tiles(pack, cam, cfg)
    for i, (y0, rows, tile) in enumerate(tiles):
        partial[y0:y0 + rows] = tile
        if i == 1:
            break
    from raytpu.engine.progressive import _ckpt_key

    np.savez(ckpt, frame=partial, next_y0=np.int64(16),
             key=_ckpt_key(pack, cam, cfg))

    resumed = render_with_checkpoint(pack, cam, cfg, ckpt)
    np.testing.assert_array_equal(resumed, full)


def test_checkpoint_config_change_restarts(tmp_path, cube_scene,
                                           cube_camera):
    """Resuming with a different config (here: bounces) must re-render from
    scratch, never stitch stale rows into the new frame."""
    import raytpu
    from raytpu.engine.progressive import render_with_checkpoint
    from raytpu.scene.pack import pack_camera, pack_scene

    pack = pack_scene(cube_scene)
    cam = pack_camera(cube_camera)
    cfg1 = raytpu.RenderConfig(width=32, height=32, seed=3, samples=1,
                               bounces=1, chunk_size=16, tile_rows=8)
    cfg2 = raytpu.RenderConfig(width=32, height=32, seed=3, samples=1,
                               bounces=3, chunk_size=16, tile_rows=8)
    ckpt = str(tmp_path / "c.npz")
    render_with_checkpoint(pack, cam, cfg1, ckpt)  # full bounces=1 ckpt
    resumed = render_with_checkpoint(pack, cam, cfg2, ckpt)
    full2 = np.asarray(raytpu.render_frame(pack, cam, cfg2))
    np.testing.assert_array_equal(resumed, full2)

    # legacy checkpoints without a key are also rejected
    np.savez(ckpt, frame=np.zeros((32, 32, 4), np.float32),
             next_y0=np.int64(32), seed=np.int64(3))
    resumed = render_with_checkpoint(pack, cam, cfg2, ckpt)
    np.testing.assert_array_equal(resumed, full2)


def test_devices_flag_shards_across_mesh(tmp_path):
    out = tmp_path / "sharded.png"
    rc = main([
        "--width", "32", "--height", "32", "--seed", "1",
        "--scene", "/root/reference/cube.glb",
        "--chunk-size", "16", "--samples", "1", "--bounces", "2",
        "--camera", "/root/reference/camera.json",
        "--output", str(out), "--devices", "4",
    ])
    assert rc == 0
    img = np.asarray(Image.open(out))
    assert img.shape == (32, 32, 3) and img.max() > 0


def test_profile_flag_dumps_trace(tmp_path):
    prof = tmp_path / "trace"
    rc = main([
        "--width", "16", "--height", "16", "--seed", "1",
        "--scene", "/root/reference/cube.glb",
        "--chunk-size", "8", "--samples", "1", "--bounces", "1",
        "--camera", "/root/reference/camera.json",
        "--profile", str(prof),
    ])
    assert rc == 0
    # the profiler writes plugins/profile/<ts>/*.trace.json.gz etc.
    assert any(prof.rglob("*")), "no trace files written"
