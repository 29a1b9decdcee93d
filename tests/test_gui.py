"""GUI backend: headless fallback must render the exact frame, and the
tk presentation path's PPM encoding must be well-formed. (An actual
window cannot appear in CI — tk.Tk() raising without a display is the
tested contract for backend selection.)"""

import os

import numpy as np
import pytest

import raytpu
from raytpu.gui import _frame_to_ppm, _try_tk, run_gui
from raytpu.scene.pack import pack_camera, pack_scene


def test_ppm_encoding_roundtrip():
    rgba = np.arange(2 * 3 * 4, dtype=np.uint8).reshape(2, 3, 4)
    ppm = _frame_to_ppm(rgba)
    assert ppm.startswith(b"P6 3 2 255 ")
    body = ppm[len(b"P6 3 2 255 "):]
    assert len(body) == 2 * 3 * 3
    np.testing.assert_array_equal(
        np.frombuffer(body, np.uint8).reshape(2, 3, 3), rgba[:, :, :3]
    )


@pytest.mark.skipif(
    bool(os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")),
    reason="a display server would open a real window; the headless "
    "fallback contract only holds without one",
)
def test_headless_gui_renders_exact_frame(cube_scene, cube_camera):
    pack = pack_scene(cube_scene)
    cam = pack_camera(cube_camera)
    config = raytpu.RenderConfig(width=32, height=32, seed=1, samples=1,
                                 bounces=2, chunk_size=16)
    # no display in CI: tk must decline, run_gui must fall back and still
    # produce the render_frame result bit-for-bit
    assert _try_tk(32, 32) is None
    via_gui = run_gui(pack, cam, config)
    direct = np.asarray(raytpu.render_frame(pack, cam, config))
    np.testing.assert_array_equal(via_gui, direct)
