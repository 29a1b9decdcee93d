"""glTF loader tests against the reference's cube.glb plus writer-generated
fixtures covering every loader path (src/scene/gltf.rs parity)."""

import numpy as np
import pytest

import raytpu
from raytpu.scene.gltf import node_local_matrix
from tests.tools.glb_writer import GlbBuilder, box, quad


def test_cube_glb_counts(cube_scene):
    s = cube_scene
    assert s.vertex_pos.shape == (24, 3)
    assert s.indices.shape == (36,)
    assert s.mesh_primitive_start.tolist() == [0]
    assert s.mesh_primitive_count.tolist() == [1]
    assert s.n_objects == 1
    assert s.n_lights == 1
    assert s.mat_metallic.shape == (1,)
    assert s.camera is not None


def test_cube_glb_material_defaults(cube_scene):
    s = cube_scene
    # cube.glb: metallic 0, roughness .5, base color .8; no KHR extensions
    assert s.mat_metallic[0] == 0.0
    assert s.mat_roughness[0] == pytest.approx(0.5)
    assert s.mat_emission[0] == 0.0  # unwrap_or(0.0), src/scene/gltf.rs:255
    assert s.mat_ior[0] == 0.0  # unwrap_or(0.0), src/scene/gltf.rs:256
    assert s.mat_has_texture[0] == 0
    np.testing.assert_allclose(s.mat_color[0][:3], 0.8, atol=1e-6)


def test_cube_glb_object_identity_transform(cube_scene):
    np.testing.assert_allclose(
        cube_scene.object_transform[0], np.eye(4), atol=0
    )


def test_cube_glb_light(cube_scene):
    s = cube_scene
    # light color has w=0 (src/scene/gltf.rs:358); power never used by the
    # shader but still loaded (intensity from KHR_lights_punctual)
    np.testing.assert_allclose(s.light_color[0], [1, 1, 1, 0])
    assert s.light_power[0] == pytest.approx(54351.41306588226)
    np.testing.assert_allclose(
        s.light_transform[0][:3, 3],
        [4.076245307922363, 5.903861999511719, -1.0054539442062378],
        rtol=1e-6,
    )


def test_cube_glb_camera_projection_is_inverse_perspective(cube_scene):
    cam = cube_scene.camera
    p = raytpu.perspective_matrix(
        1.7777777777777777, 0.39959652046304894, 0.10000000149011612, 100.0
    )
    np.testing.assert_allclose(
        cam.projection @ p, np.eye(4), atol=1e-5
    )


def test_trs_matrix_composition():
    node = {
        "translation": [1.0, 2.0, 3.0],
        "rotation": [0.0, 0.7071068, 0.0, 0.7071068],  # 90 deg about Y
        "scale": [2.0, 2.0, 2.0],
    }
    m = node_local_matrix(node)
    # point (1,0,0) -> scale (2,0,0) -> rotate (0,0,-2) -> translate (1,2,1)
    v = m @ np.array([1, 0, 0, 1], np.float32)
    np.testing.assert_allclose(v[:3], [1, 2, 1], atol=1e-5)


def test_matrix_node_column_major():
    # glTF "matrix" is column-major: translation lives at indices 12..14
    node = {"matrix": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 5, 6, 7, 1]}
    m = node_local_matrix(node)
    np.testing.assert_allclose(m[:3, 3], [5, 6, 7])


def test_writer_roundtrip_multi_mesh(tmp_path):
    b = GlbBuilder()
    m0 = b.add_material(color=(1, 0, 0, 1))
    m1 = b.add_material(color=(0, 1, 0, 1), metallic=1.0)
    pos, nrm, uv, idx = quad()
    mesh0 = b.add_mesh([(pos, nrm, uv, idx, m0, np.uint16)])
    bpos, bnrm, buv, bidx = box()
    mesh1 = b.add_mesh([(bpos, bnrm, buv, bidx, m1, np.uint32)])
    b.add_node(mesh=mesh0, translation=[0, 0, -2])
    b.add_node(mesh=mesh1, translation=[3, 0, 0], scale=[2, 2, 2])
    b.add_node(light=b.add_light(intensity=50.0), translation=[0, 5, 0])
    path = tmp_path / "two.glb"
    b.write(str(path))

    s = raytpu.load_scene(str(path))
    assert s.n_objects == 2
    assert s.mesh_primitive_start.tolist() == [0, 1]
    assert s.vertex_pos.shape == (28, 3)
    assert s.indices.shape == (42,)
    # u16 indices were widened to u32 (src/scene/gltf.rs:181 into_u32)
    assert s.indices.dtype == np.uint32
    # indices stay primitive-relative
    assert s.indices.max() < 24
    assert s.prim_vertex_start.tolist() == [0, 4]
    assert s.prim_index_start.tolist() == [0, 6]
    np.testing.assert_allclose(s.object_transform[1][:3, 3], [3, 0, 0])
    np.testing.assert_allclose(s.object_transform[1][0, 0], 2.0)


def test_writer_roundtrip_extensions_and_texture(tmp_path):
    b = GlbBuilder()
    tex_pixels = (np.arange(4 * 4 * 4, dtype=np.uint32) % 256).astype(
        np.uint8
    ).reshape(4, 4, 4)
    t = b.add_texture_rgba(tex_pixels)
    m = b.add_material(color=(1, 1, 1, 1), emission=5.0, ior=1.45, texture=t)
    pos, nrm, uv, idx = quad()
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, m, np.uint16)]))
    path = tmp_path / "tex.glb"
    b.write(str(path))

    s = raytpu.load_scene(str(path))
    assert s.mat_emission[0] == pytest.approx(5.0)
    assert s.mat_ior[0] == pytest.approx(1.45)
    assert s.mat_has_texture[0] == 1
    assert len(s.textures) == 1
    np.testing.assert_array_equal(s.textures[0], tex_pixels)


def test_missing_uv_defaults_to_zero(tmp_path):
    b = GlbBuilder()
    m = b.add_material()
    pos, nrm, _, idx = quad()
    b.add_node(mesh=b.add_mesh([(pos, nrm, None, idx, m, np.uint16)]))
    path = tmp_path / "nouv.glb"
    b.write(str(path))
    s = raytpu.load_scene(str(path))
    np.testing.assert_array_equal(s.vertex_uv, 0.0)


def test_unknown_extension_rejected(tmp_path):
    path = tmp_path / "x.txt"
    path.write_text("nope")
    with pytest.raises(raytpu.GltfError, match="recognize"):
        raytpu.load_scene(str(path))


def test_gltf_plus_bin_roundtrip(tmp_path):
    """.gltf + sibling .bin path (src/main.rs:148-188)."""
    b = GlbBuilder()
    m = b.add_material(color=(0.1, 0.2, 0.3, 1))
    pos, nrm, uv, idx = quad()
    b.add_node(mesh=b.add_mesh([(pos, nrm, uv, idx, m, np.uint16)]))
    path = tmp_path / "scene.gltf"
    b.write_gltf(str(path))
    assert (tmp_path / "scene.bin").exists()
    s = raytpu.load_scene(str(path))
    assert s.vertex_pos.shape == (4, 3)
    np.testing.assert_allclose(s.mat_color[0][:3], [0.1, 0.2, 0.3])
