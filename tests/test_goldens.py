"""Checked-in golden images: any silent change to the render output fails
CI bit-for-bit. The reference repo has no goldens (SURVEY.md §4) — these pin
raytpu's own output, generated on the forced-CPU backend this suite runs on
(tests/conftest.py), where XLA compilation is deterministic.

Regenerate (after an INTENDED image change, with justification in the
commit message):  RAYTPU_UPDATE_GOLDENS=1 python -m pytest tests/test_goldens.py
"""

import os

import numpy as np
import pytest
from PIL import Image

from raytpu.cli import main

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
UPDATE = os.environ.get("RAYTPU_UPDATE_GOLDENS") == "1"


def _check_golden(tmp_path, name, args):
    out = tmp_path / f"{name}.png"
    assert main(args + ["--output", str(out)]) == 0
    golden = os.path.join(GOLDEN_DIR, f"{name}.png")
    if UPDATE or not os.path.exists(golden):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        import shutil

        shutil.copy(out, golden)
        pytest.skip(f"golden {name} (re)generated — commit it")
    got = np.asarray(Image.open(out))
    want = np.asarray(Image.open(golden))
    assert got.shape == want.shape
    ndiff = int((got != want).any(axis=-1).sum())
    assert ndiff == 0, (
        f"{name}: {ndiff} pixels differ from the checked-in golden "
        f"({golden}); if the change is intended, regenerate with "
        "RAYTPU_UPDATE_GOLDENS=1"
    )


def test_golden_cube_camera_json(tmp_path):
    """cube.glb + camera.json — the reference's own demo invocation."""
    _check_golden(tmp_path, "cube_cam64_s2b2", [
        "--width", "64", "--height", "64", "--seed", "2",
        "--scene", "/root/reference/cube.glb",
        "--camera", "/root/reference/camera.json",
        "--chunk-size", "16", "--samples", "2", "--bounces", "2",
    ])


def test_golden_cube_gltf_camera(tmp_path):
    """cube.glb using its embedded glTF camera (no --camera override)."""
    _check_golden(tmp_path, "cube_gltf64_s1b4", [
        "--width", "64", "--height", "64", "--seed", "1",
        "--scene", "/root/reference/cube.glb",
        "--chunk-size", "16", "--samples", "1", "--bounces", "4",
    ])


def test_golden_multi_mesh(tmp_path):
    """Multi-mesh, multi-material scene (BVH path + NEE + emissive)."""
    from tests.tools.glb_writer import GlbBuilder, box, quad

    b = GlbBuilder()
    red = b.add_material(color=(0.8, 0.2, 0.2, 1.0))
    grey = b.add_material(color=(0.7, 0.7, 0.7, 1.0))
    glow = b.add_material(color=(1.0, 0.9, 0.6, 1.0), emission=4.0)
    bpos, bnrm, buv, bidx = box(1.0)
    qpos, qnrm, quv, qidx = quad(6.0, z=-1.0)
    lpos, lnrm, luv, lidx = box(0.3)
    cube = b.add_mesh([(bpos, bnrm, buv, bidx, red, np.uint16)])
    floor = b.add_mesh([(qpos, qnrm, quv, qidx, grey, np.uint16)])
    lamp = b.add_mesh([(lpos, lnrm, luv, lidx, glow, np.uint16)])
    b.add_node(mesh=cube)
    b.add_node(mesh=floor, rotation=(-0.7071068, 0.0, 0.0, 0.7071068))
    b.add_node(mesh=lamp, translation=(1.5, 1.5, -1.0))
    b.add_node(light=b.add_light(color=(1.0, 1.0, 1.0), intensity=50.0),
               translation=(0.0, 3.0, -3.0))
    b.add_node(camera=b.add_camera(aspect=1.0, yfov=0.6),
               translation=(0.0, 0.5, 6.0))
    scene_path = tmp_path / "multi.glb"
    b.write(str(scene_path))
    _check_golden(tmp_path, "multi_mesh64_s2b3", [
        "--width", "64", "--height", "64", "--seed", "3",
        "--scene", str(scene_path),
        "--chunk-size", "16", "--samples", "2", "--bounces", "3",
    ])
