"""Image parity on the PRODUCTION code path (VERDICT r3 item 5).

The golden/oracle image tests elsewhere pin the brute/XLA route on
cube-class scenes; the production 1080p path is different code: waves
above the sort threshold ride coherence sorts into the persistent strand
kernel (and live-prefix compaction in WAVE_MODE=compact). This module
puts the BASELINE.json image criterion (SSIM >= 0.99 at seed tolerance)
directly on that route, on a writer-generated "gallery" scene big enough
to engage it (~2.6k triangle slots > RAYTPU_SORT_MIN_TRIS) with textures,
glass, metal, emissive panels and two lights — every material branch the
megakernel dispatches (src/shader.wgsl:349-374).

A checked-in golden PNG additionally pins the sorted/strand/persistent
output bit-for-bit on the forced-CPU backend: any permutation or
tie-break change in the production path fails loudly.
"""

import functools
import os

import numpy as np
import pytest

import raytpu
from raytpu.engine.render import render_frame
from raytpu.io.metrics import psnr, ssim
from raytpu.io.png import quantize_rgba32f
from raytpu.oracle.reference import OracleRenderer
from raytpu.scene.pack import pack_camera, pack_scene

from .imgdiff import assert_images_equiv

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def _grid_mesh(nx: int, nz: int, size: float):
    """Subdivided XZ floor grid: 2*nx*nz triangles with UVs spanning the
    texture once."""
    xs = np.linspace(-size / 2, size / 2, nx + 1, dtype=np.float32)
    zs = np.linspace(-size / 2, size / 2, nz + 1, dtype=np.float32)
    gx, gz = np.meshgrid(xs, zs)
    pos = np.stack(
        [gx, np.zeros_like(gx), gz], axis=-1
    ).reshape(-1, 3).astype(np.float32)
    nrm = np.tile(np.array([0, 1, 0], np.float32), (pos.shape[0], 1))
    u, v = np.meshgrid(
        np.linspace(0, 1, nx + 1, dtype=np.float32),
        np.linspace(0, 1, nz + 1, dtype=np.float32),
    )
    uv = np.stack([u, v], axis=-1).reshape(-1, 2).astype(np.float32)
    idx = []
    for j in range(nz):
        for i in range(nx):
            a = j * (nx + 1) + i
            b = a + 1
            c = a + (nx + 1)
            d = c + 1
            idx += [a, c, b, b, c, d]
    return pos, nrm, uv, np.asarray(idx, np.uint32)


@functools.lru_cache(maxsize=1)
def _gallery():
    """(scene, pack, camera): the production-path fixture scene."""
    from tests.tools.glb_writer import GlbBuilder, box, quad

    b = GlbBuilder()
    # checkerboard texture for the floor
    tex = np.zeros((8, 8, 4), np.uint8)
    tex[..., 3] = 255
    for y in range(8):
        for x in range(8):
            c = 220 if (x + y) % 2 == 0 else 60
            tex[y, x, :3] = (c, c - 10 if c > 10 else 0, c)
    t = b.add_texture_rgba(tex)
    floor_m = b.add_material(color=(1, 1, 1, 1), texture=t)
    metal = b.add_material(color=(0.9, 0.8, 0.5, 1), metallic=1.0)
    glass = b.add_material(color=(0.85, 0.9, 1.0, 1), ior=1.5)
    diffuse = b.add_material(color=(0.7, 0.3, 0.3, 1))
    glow = b.add_material(color=(1.0, 0.7, 0.3, 1), emission=5.0)

    # ~2.6k triangles: above the 256-slot sort threshold, below the
    # 4096-slot treelet threshold — the resident strand route
    pos, nrm, uv, idx = _grid_mesh(36, 36, 16.0)
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, floor_m, np.uint32)]),
               translation=[0, -2, 0])
    bp, bn, bu, bi = box()
    b.add_node(mesh=b.add_mesh([(bp, bn, bu, bi, metal, np.uint32)]),
               translation=[-2.5, -1, 0])
    b.add_node(mesh=b.add_mesh([(bp, bn, bu, bi, glass, np.uint32)]),
               translation=[0, -1, 1.5])
    b.add_node(mesh=b.add_mesh([(bp, bn, bu, bi, diffuse, np.uint32)]),
               translation=[2.5, -1, 0])
    qp, qn, qu, qi = quad(size=2.0)
    b.add_node(mesh=b.add_mesh([(qp, qn, qu, qi, glow, np.uint16)]),
               translation=[0, 2.5, -2])
    b.add_node(light=b.add_light(intensity=40.0), translation=[4, 5, 6])
    b.add_node(light=b.add_light(color=(0.4, 0.6, 1.0), intensity=25.0),
               translation=[-5, 4, 3])
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".glb", delete=False) as f:
        path = f.name
    b.write(path)
    scene = raytpu.load_scene(path)
    os.remove(path)
    cam = raytpu.camera_from_lookat([0, 2.5, 9], [0, -0.5, 0], 0.7,
                                    48, 32)
    return scene, pack_scene(scene), cam


CFG = dict(width=48, height=32, seed=11, samples=2, bounces=4,
           chunk_size=16)


@pytest.fixture(autouse=True)
def _small_walkers(monkeypatch):
    # interpret-mode persistent kernels trace/run fast with a tiny pool,
    # and refills are forced mid-wave
    monkeypatch.setenv("RAYTPU_STRAND_WALKERS", "8")
    monkeypatch.setenv("RAYTPU_STRAND_SERVICE_K", "2")


def _production_frame(**extra):
    scene, pack, cam = _gallery()
    assert pack.n_triangles > 256, "scene must engage the sorted route"
    assert pack.bvh.strand_rows is not None
    cfg = raytpu.RenderConfig(**CFG, intersector="packet", **extra)
    return render_frame(pack, pack_camera(cam), cfg)


@functools.lru_cache(maxsize=1)
def _oracle_frame():
    scene, _, cam = _gallery()
    return OracleRenderer(scene, cam).render(
        CFG["width"], CFG["height"], CFG["seed"], CFG["samples"],
        CFG["bounces"], CFG["chunk_size"],
    )


@pytest.mark.slow
def test_production_route_matches_oracle():
    """Sorted waves -> persistent strand kernel vs the scalar WGSL-replay
    oracle: the BASELINE.json bar (SSIM >= 0.99) plus the branch-flip
    bound, on the route the 1080p headline actually runs."""
    frame = _production_frame()
    ref = _oracle_frame()
    d = np.abs(frame - ref).max(axis=-1)
    flips = float(np.mean(d > 1e-3))
    s = ssim(quantize_rgba32f(frame), quantize_rgba32f(ref))
    assert flips <= 0.03, f"branch-flip fraction {flips}"
    assert s >= 0.99, f"SSIM {s}"
    assert psnr(quantize_rgba32f(frame), quantize_rgba32f(ref)) > 30.0


@pytest.mark.slow
def test_compact_mode_matches_oracle(monkeypatch):
    """The live-prefix compact pipeline through the same bar, and
    bit-equivalence (ulp-flip tolerance, tests/imgdiff.py) against the
    query-mode production frame."""
    base = _production_frame()
    monkeypatch.setenv("RAYTPU_WAVE_MODE", "compact")
    frame = _production_frame()
    ref = _oracle_frame()
    d = np.abs(frame - ref).max(axis=-1)
    assert float(np.mean(d > 1e-3)) <= 0.03
    assert ssim(quantize_rgba32f(frame), quantize_rgba32f(ref)) >= 0.99
    assert_images_equiv(base, frame)


def test_production_golden(tmp_path):
    """Bit-exact golden for the sorted/strand/persistent route on the
    forced-CPU backend. Regenerate after an INTENDED image change:
    RAYTPU_UPDATE_GOLDENS=1 python -m pytest tests/test_production_parity.py
    """
    from PIL import Image

    from raytpu.io.png import write_png

    frame = _production_frame()
    out = str(tmp_path / "gallery.png")
    write_png(out, frame)
    golden = os.path.join(GOLDEN_DIR, "gallery_prod48_s2b4.png")
    if os.environ.get("RAYTPU_UPDATE_GOLDENS") == "1" or not os.path.exists(
        golden
    ):
        import shutil

        shutil.copy(out, golden)
        pytest.skip("golden regenerated — commit it")
    got = np.asarray(Image.open(out))
    want = np.asarray(Image.open(golden))
    ndiff = int((got != want).any(axis=-1).sum())
    assert ndiff == 0, (
        f"{ndiff} pixels differ from the production-path golden; if "
        "intended, regenerate with RAYTPU_UPDATE_GOLDENS=1"
    )
