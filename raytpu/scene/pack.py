"""Lower host SceneData to the device ScenePack.

TPU-first lowering decisions (vs. the reference's GPU layout):

* **World-space triangle flattening.** The reference's hardware TLAS holds
  one instance per mesh-bearing node with a 3x4 transform and traversal
  transforms rays per instance (src/state.rs:1201-1206). On TPU the
  equivalent dense layout is to bake each instance's triangles into world
  space once at pack time: identical memory behaviour (the reference also
  duplicates geometry per instance — one BLAS per node, SURVEY.md §2.2) and
  it removes all per-ray transform work from the hot loop.
* **Pre-resolved intersection records.** The shader's 5-level gather chain
  object -> mesh -> primitive -> indices -> vertices (src/shader.wgsl:259-293)
  is collapsed to per-triangle (vertex indices, material, object) so the
  shade kernel does exactly three vertex gathers + one material gather.
* **BVH leaf ordering.** Triangles are stored in BVH leaf order with
  ``leaf_size`` alignment and degenerate padding, so a leaf visit is one
  contiguous, maskless gather.
* **Texture atlas.** The reference binds a runtime array of textures
  (binding 11, src/state.rs:907-916); XLA wants one array, so textures pad
  into [n, maxH, maxW, 4] with a (w, h) size table (binding 8's
  TextureDesc).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..accel.bvh import LEAF_SIZE, build_bvh
from ..types import BvhPack, CameraPack, ScenePack
from .camera import CameraData
from .gltf import SceneData


def flatten_world_triangles(scene: SceneData):
    """Instantiate every (object, primitive, triangle) into world space.

    Returns SoA numpy arrays (p0, e1, e2, vi[3], material, object)."""
    p0s, e1s, e2s, vis, mats, objs = [], [], [], [], [], []
    for o in range(scene.n_objects):
        m = int(scene.object_mesh[o])
        transform = scene.object_transform[o].astype(np.float64)
        start = int(scene.mesh_primitive_start[m])
        count = int(scene.mesh_primitive_count[m])
        for p in range(start, start + count):
            vstart = int(scene.prim_vertex_start[p])
            istart = int(scene.prim_index_start[p])
            icount = int(scene.prim_index_count[p])
            idx = scene.indices[istart : istart + icount].astype(np.int64)
            # indices are primitive-relative; add vertex_start back on
            # (src/shader.wgsl:276-278)
            vidx = (idx + vstart).reshape(-1, 3)
            pos = scene.vertex_pos[vidx.reshape(-1)].reshape(-1, 3, 3)
            # full affine transform (the TLAS instance transform applies
            # translation too; only the *shading* hit point drops it)
            world = pos.astype(np.float64) @ transform[:3, :3].T + transform[:3, 3]
            world = world.astype(np.float32)
            v0 = world[:, 0]
            p0s.append(v0)
            e1s.append(world[:, 1] - v0)
            e2s.append(world[:, 2] - v0)
            vis.append(vidx.astype(np.int32))
            n_tris = vidx.shape[0]
            mats.append(
                np.full(n_tris, int(scene.prim_material[p]), np.int32)
            )
            objs.append(np.full(n_tris, o, np.int32))

    if not p0s:
        z3 = np.zeros((0, 3), np.float32)
        return z3, z3, z3, np.zeros((0, 3), np.int32), np.zeros(0, np.int32), (
            np.zeros(0, np.int32)
        )
    return (
        np.concatenate(p0s),
        np.concatenate(e1s),
        np.concatenate(e2s),
        np.concatenate(vis),
        np.concatenate(mats),
        np.concatenate(objs),
    )


def _pad_textures(textures) -> tuple[np.ndarray, np.ndarray]:
    """Stack decoded RGBA8 textures into a padded normalized-f32 atlas.
    Empty scenes get the reference's 1x1 dummy (src/state.rs:613-620)."""
    if not textures:
        textures = [np.zeros((1, 1, 4), np.uint8)]
    max_h = max(t.shape[0] for t in textures)
    max_w = max(t.shape[1] for t in textures)
    atlas = np.zeros((len(textures), max_h, max_w, 4), np.float32)
    sizes = np.zeros((len(textures), 2), np.int32)
    for i, t in enumerate(textures):
        atlas[i, : t.shape[0], : t.shape[1]] = t.astype(np.float32) / 255.0
        sizes[i] = (t.shape[1], t.shape[0])  # (width, height)
    return atlas, sizes


def pack_scene(scene: SceneData, leaf_size: int = LEAF_SIZE) -> ScenePack:
    """Build the device ScenePack (including the software BVH)."""
    p0, e1, e2, vi, mat, obj = flatten_world_triangles(scene)

    bvh = build_bvh(p0, e1, e2, leaf_size=leaf_size)

    # reorder triangles into BVH leaf order; -1 entries become degenerate
    # padding triangles (e1 = e2 = 0 can never be hit; see kernels.intersect).
    # Pad the slot count so the brute-force sweep's fixed triangle chunk
    # (512) always divides the array.
    order = bvh.tri_order
    pad_to = 8 if order.shape[0] <= 512 else 512
    n_slots = max(int(order.shape[0]), pad_to)
    n_slots = -(-n_slots // pad_to) * pad_to

    def scatter(arr, fill=0.0):
        out_shape = (n_slots,) + arr.shape[1:]
        out = np.full(out_shape, fill, arr.dtype)
        valid = order >= 0
        out[: order.shape[0]][valid] = arr[order[valid]]
        return out

    tri_p0 = scatter(p0)
    tri_e1 = scatter(e1)
    tri_e2 = scatter(e2)
    tri_vi = scatter(vi)
    tri_material = scatter(mat)
    tri_object = scatter(obj)

    # remap BVH leaf_first: already indices into the reordered array ✔
    # (tri_order positions ARE the new triangle slots)

    # lights: position = translation column of the node transform
    # (light.transform * (0,0,0,1), src/shader.wgsl:175)
    n_lights = scene.n_lights
    if n_lights > 0:
        light_pos = scene.light_transform[:, :3, 3].astype(np.float32)
        light_color = scene.light_color.astype(np.float32)
    else:
        # pad with one black light so gathers are safe; the rand() that
        # selects the light is still consumed (src/shader.wgsl:168-172)
        light_pos = np.zeros((1, 3), np.float32)
        light_color = np.zeros((1, 4), np.float32)

    atlas, sizes = _pad_textures(scene.textures)

    n_mats = scene.mat_metallic.shape[0]
    if n_mats == 0:
        # safe gather target; a scene with geometry always has materials
        mat_pad = dict(
            metallic=np.zeros(1, np.float32),
            roughness=np.zeros(1, np.float32),
            emission=np.zeros(1, np.float32),
            ior=np.zeros(1, np.float32),
            texture=np.zeros(1, np.int64),
            has_texture=np.zeros(1, np.int64),
            color=np.zeros((1, 4), np.float32),
        )
    else:
        mat_pad = dict(
            metallic=scene.mat_metallic,
            roughness=scene.mat_roughness,
            emission=scene.mat_emission,
            ior=scene.mat_ior,
            texture=scene.mat_texture,
            has_texture=scene.mat_has_texture,
            color=scene.mat_color,
        )

    n_verts = scene.vertex_pos.shape[0]
    if n_verts == 0:
        vpos = np.zeros((1, 3), np.float32)
        vnorm = np.zeros((1, 3), np.float32)
        vuv = np.zeros((1, 2), np.float32)
    else:
        vpos, vnorm, vuv = scene.vertex_pos, scene.vertex_normal, scene.vertex_uv

    if scene.n_objects == 0:
        obj_linear = np.eye(3, dtype=np.float32)[None]
    else:
        obj_linear = scene.object_transform[:, :3, :3].astype(np.float32)

    return ScenePack(
        tri_p0=jnp.asarray(tri_p0),
        tri_e1=jnp.asarray(tri_e1),
        tri_e2=jnp.asarray(tri_e2),
        tri_vi=jnp.asarray(tri_vi, jnp.int32),
        tri_material=jnp.asarray(tri_material, jnp.int32),
        tri_object=jnp.asarray(tri_object, jnp.int32),
        vertex_pos=jnp.asarray(vpos, jnp.float32),
        vertex_normal=jnp.asarray(vnorm, jnp.float32),
        vertex_uv=jnp.asarray(vuv, jnp.float32),
        object_linear=jnp.asarray(obj_linear),
        mat_metallic=jnp.asarray(mat_pad["metallic"], jnp.float32),
        mat_roughness=jnp.asarray(mat_pad["roughness"], jnp.float32),
        mat_emission=jnp.asarray(mat_pad["emission"], jnp.float32),
        mat_ior=jnp.asarray(mat_pad["ior"], jnp.float32),
        mat_texture=jnp.asarray(mat_pad["texture"], jnp.int32),
        mat_has_texture=jnp.asarray(mat_pad["has_texture"], jnp.int32),
        mat_color=jnp.asarray(mat_pad["color"], jnp.float32),
        light_pos=jnp.asarray(light_pos),
        light_color=jnp.asarray(light_color),
        n_lights_f=jnp.float32(n_lights),
        tex_atlas=jnp.asarray(atlas),
        tex_size=jnp.asarray(sizes, jnp.int32),
        bvh=BvhPack(
            bmin=jnp.asarray(bvh.bmin),
            bmax=jnp.asarray(bvh.bmax),
            miss=jnp.asarray(bvh.miss, jnp.int32),
            leaf_first=jnp.asarray(bvh.leaf_first, jnp.int32),
            leaf_count=jnp.asarray(bvh.leaf_count, jnp.int32),
        ),
    )


def pack_camera(camera: CameraData) -> CameraPack:
    return CameraPack(
        world=jnp.asarray(camera.world, jnp.float32),
        projection=jnp.asarray(camera.projection, jnp.float32),
    )
