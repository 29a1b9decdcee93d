"""Camera math parity (src/main.rs:376-421 and src/shader.wgsl:299-310)."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

import raytpu
from raytpu.engine.render import cast_rays
from raytpu.scene.pack import pack_camera


def test_lookat_matrix_reference_values():
    # camera.json: origin (0,0,-20), at origin, up +Y
    w = raytpu.look_at([0, 0, -20], [0, 0, 0], [0, 1, 0])
    # forward f=(0,0,1): s=f x up=(-1,0,0), u=(0,1,0); translation column
    # (-s.eye, -u.eye, f.eye) = (0,0,-20)
    np.testing.assert_allclose(
        w,
        [[-1, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, -20], [0, 0, 0, 1]],
        atol=1e-6,
    )


def test_perspective_matrix_nalgebra_convention():
    p = raytpu.perspective_matrix(2.0, 0.5, 0.1, 100.0)
    f = 1.0 / np.tan(0.25)
    assert p[0, 0] == pytest.approx(f / 2.0)
    assert p[1, 1] == pytest.approx(f)
    assert p[3, 2] == -1.0
    assert p[2, 2] == pytest.approx(-(100.0 + 0.1) / (100.0 - 0.1))
    assert p[2, 3] == pytest.approx(-2.0 * 100.0 * 0.1 / (100.0 - 0.1))


def test_camera_json_near_far_reversed(tmp_path):
    """The reference constructs Perspective(aspect, fov, 100.0, 0.001) —
    near/far deliberately reversed — then inverts (src/main.rs:402-415)."""
    path = tmp_path / "camera.json"
    path.write_text(json.dumps({"origin": [0, 0, -20], "at": [0, 0, 0],
                                "fov": 0.3}))
    cam = raytpu.load_camera_json(str(path), 512, 512)
    p = raytpu.perspective_matrix(1.0, 0.3, 100.0, 0.001)
    np.testing.assert_allclose(cam.projection @ p, np.eye(4), atol=2e-4)


def test_center_ray_points_at_cube(cube_camera):
    cam = pack_camera(cube_camera)
    ro, rd = cast_rays(
        jnp.asarray([32.0]), jnp.asarray([32.0]), cam.world, cam.projection,
        64, 64,
    )
    ro, rd = np.asarray(ro)[0], np.asarray(rd)[0]
    np.testing.assert_allclose(ro, [0, 0, -20], atol=1e-6)
    # center ray must fly toward +z (the cube sits at the origin)
    assert rd[2] > 0.99
    np.testing.assert_allclose(np.linalg.norm(rd), 1.0, rtol=1e-6)


def test_gltf_camera_ray_hits_origin(cube_scene):
    """cube.glb's own camera looks at the cube from (7.36, 4.96, 6.93)."""
    cam = pack_camera(cube_scene.camera)
    ro, rd = cast_rays(
        jnp.asarray([32.0]), jnp.asarray([32.0]), cam.world, cam.projection,
        64, 64,
    )
    ro, rd = np.asarray(ro)[0], np.asarray(rd)[0]
    np.testing.assert_allclose(
        ro, [7.358891487121582, 4.958309173583984, 6.925790786743164],
        rtol=1e-6,
    )
    # the closest point on the center ray to the origin is near the origin
    tstar = -np.dot(ro, rd)
    assert tstar > 0
    assert np.linalg.norm(ro + tstar * rd) < 1.0
