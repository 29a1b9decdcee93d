"""Lower host SceneData to the device ScenePack.

TPU-first lowering decisions (vs. the reference's GPU layout):

* **World-space triangle flattening.** The reference's hardware TLAS holds
  one instance per mesh-bearing node and traversal transforms rays per
  instance (src/state.rs:1201-1206). On TPU the equivalent dense layout is
  to bake each instance's triangles into world space once at pack time:
  identical memory behaviour (the reference also duplicates geometry per
  instance — one BLAS per node, SURVEY.md §2.2) and it removes per-ray
  transforms from the hot loop.
* **One-wide-row-per-lookup tables.** TPU row-gather cost is flat in row
  width (measured up to 128 f32), so every datum a kernel step needs is
  packed into a single gathered row; see raytpu.types docstring.
* **BVH leaf ordering.** Triangles are stored in BVH leaf order with
  ``leaf_size`` alignment and degenerate padding, so a leaf visit is one
  contiguous row fetch.
* **Texture atlas.** The reference binds a runtime array of textures
  (binding 11, src/state.rs:907-916); XLA wants one array, so textures pad
  into [n, maxH, maxW, 4] with a (w, h) size table.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..accel.bvh import LEAF_SIZE, build_bvh
from ..types import BvhPack, CameraPack, ScenePack
from .camera import CameraData
from .gltf import SceneData


def _default_backend_is_tpu() -> bool:
    try:
        import jax

        plat = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return "tpu" in plat or "axon" in plat


def _sort_min_tris() -> int:
    """Triangle-slot threshold above which bounce waves are coherence-
    sorted and the strand tree is built (render.py sort_bounced). One
    env knob so pack_scene and the engine always agree. Default 256:
    strand bounce routing measured 28.1 -> 20.0 ms on the 780-tri
    multi-mesh frame (docs/PROFILE_r3.md finding 3), and scenes at or
    below 256 slots ride the brute/XLA paths anyway."""
    import os

    return int(os.environ.get("RAYTPU_SORT_MIN_TRIS", "256"))


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
    """Flatten decoded RGBA8 textures into one normalized-f32 texel buffer
    [sum(w*h), 4] plus per-texture (width, height, offset) descriptors —
    each texture at its native footprint, like the reference's per-texture
    GPU bindings (src/state.rs:907-916). Empty scenes get the reference's
    1x1 dummy (src/state.rs:613-620)."""
    if not textures:
        textures = [np.zeros((1, 1, 4), np.uint8)]
    desc = np.zeros((len(textures), 3), np.int32)
    chunks = []
    offset = 0
    for i, t in enumerate(textures):
        h, w = t.shape[0], t.shape[1]
        desc[i] = (w, h, offset)
        chunks.append((t.astype(np.float32) / 255.0).reshape(h * w, 4))
        offset += h * w
    return np.concatenate(chunks, axis=0), desc


def _bitcast_i32_to_f32(x: np.ndarray) -> np.ndarray:
    return x.astype(np.int32).view(np.float32)


def pack_scene(
    scene: SceneData, leaf_size: int = LEAF_SIZE, treelets: str = "auto",
    tables: str = "auto", as_numpy: bool = False,
) -> ScenePack:
    """Build the device ScenePack (including the software BVH).

    ``treelets``: "auto" builds the binned-path treelet tables for scenes
    past the bounce-sort threshold, "always"/"never" force it.
    ``tables``: "auto" drops the resident-kernel tables (BVH8 rows, leaf
    rows, strand tree) for beyond-VMEM TPU scenes that can only ride the
    binned path; "stream" forces the drop; "all" keeps everything.
    ``as_numpy`` keeps every table a host numpy array (no jax involved):
    the host-side pack/pickle path — bench caching, offline builds —
    skips the XLA:CPU round trip entirely (the driver box's degraded
    XLA:CPU fallback made the r4 "atrium BVH build" line cost 27.1 s
    against ~4.5 s of actual pack work). Numpy packs feed jit as
    operands just as well; jnp.asarray happens implicitly at dispatch."""
    p0, e1, e2, vi, mat, obj = flatten_world_triangles(scene)

    bvh, bvh8 = build_bvh(p0, e1, e2, leaf_size=leaf_size)

    # the packet kernel's SMEM stack must provably hold the deepest
    # traversal (<= BVH8_WIDTH pushes per level); reject pathological trees
    # here rather than corrupt (or clamp-drop subtrees) at trace time
    from ..accel.bvh import bvh8_depth
    from ..kernels.intersect_pallas import STACK_DEPTH

    depth = bvh8_depth(bvh8.node_rows)
    if 8 * depth + 8 > STACK_DEPTH:
        raise ValueError(
            f"BVH8 depth {depth} exceeds the packet kernel stack bound "
            f"(needs {8 * depth + 8} slots, STACK_DEPTH={STACK_DEPTH})"
        )

    # reorder triangles into BVH leaf order; -1 entries become degenerate
    # padding triangles (e1 = e2 = 0 can never be hit). Pad the slot count
    # so the brute-force sweep's fixed chunk (512) always divides it.
    order = bvh.tri_order
    pad_to = 8 if order.shape[0] <= 512 else 512
    n_slots = max(int(order.shape[0]), pad_to)
    n_slots = -(-n_slots // pad_to) * pad_to
    assert n_slots % leaf_size == 0

    def scatter(arr, fill=0.0):
        out = np.full((n_slots,) + arr.shape[1:], fill, arr.dtype)
        valid = order >= 0
        out[: order.shape[0]][valid] = arr[order[valid]]
        return out

    tri_p0 = scatter(p0)
    tri_e1 = scatter(e1)
    tri_e2 = scatter(e2)
    tri_vi = scatter(vi)
    tri_material = scatter(mat)
    tri_object = scatter(obj)

    # --- fused shade row: one gather per hit (see raytpu.types) ---
    # col layout: 0:9 world p0/e1/e2; 9:18 object-space corner positions;
    # 18:27 corner normals; 27:33 corner uvs; 33:42 object 3x3 linear;
    # 42 metallic, 43 emission, 44 ior, 45 texture id (bitcast),
    # 46 has_texture (bitcast); 47:51 material colour rgba
    t_cnt = n_slots
    tri_row = np.zeros((t_cnt, 64), np.float32)
    tri_row[:, 0:3] = tri_p0
    tri_row[:, 3:6] = tri_e1
    tri_row[:, 6:9] = tri_e2
    vp = scene.vertex_pos if scene.vertex_pos.size else np.zeros((1, 3), np.float32)
    vn = (
        scene.vertex_normal if scene.vertex_normal.size
        else np.zeros((1, 3), np.float32)
    )
    vt = scene.vertex_uv if scene.vertex_uv.size else np.zeros((1, 2), np.float32)
    for k in range(3):
        ids = tri_vi[:, k]
        tri_row[:, 9 + 3 * k : 12 + 3 * k] = vp[ids]
        tri_row[:, 18 + 3 * k : 21 + 3 * k] = vn[ids]
        tri_row[:, 27 + 2 * k : 29 + 2 * k] = vt[ids]
    if scene.n_objects:
        lin9 = scene.object_transform[:, :3, :3].reshape(-1, 9)
        tri_row[:, 33:42] = lin9[np.clip(tri_object, 0, scene.n_objects - 1)]
    else:
        tri_row[:, [33, 37, 41]] = 1.0
    if scene.mat_metallic.shape[0]:
        mid = np.clip(tri_material, 0, scene.mat_metallic.shape[0] - 1)
        tri_row[:, 42] = scene.mat_metallic[mid]
        tri_row[:, 43] = scene.mat_emission[mid]
        tri_row[:, 44] = scene.mat_ior[mid]
        tri_row[:, 45] = _bitcast_i32_to_f32(scene.mat_texture[mid])
        tri_row[:, 46] = _bitcast_i32_to_f32(scene.mat_has_texture[mid])
        tri_row[:, 47:51] = scene.mat_color[mid]

    # BVH fused node rows + leaf rows
    n_nodes = bvh.n_nodes
    nodes = np.zeros((n_nodes, 8), np.float32)
    nodes[:, 0:3] = bvh.bmin
    nodes[:, 3:6] = bvh.bmax
    nodes[:, 6] = _bitcast_i32_to_f32(bvh.miss)
    leaf_row = np.where(bvh.leaf_first >= 0, bvh.leaf_first // leaf_size, -1)
    nodes[:, 7] = _bitcast_i32_to_f32(leaf_row.astype(np.int32))

    n_leaf_rows = t_cnt // leaf_size
    leaf_tris = np.zeros((n_leaf_rows, 10 * leaf_size), np.float32)
    per_tri = np.concatenate(
        [tri_p0, tri_e1, tri_e2, np.zeros((t_cnt, 1), np.float32)], axis=1
    )  # [T,10]
    leaf_tris[:] = per_tri.reshape(n_leaf_rows, leaf_size * 10)

    # --- objects / materials / lights ---
    if scene.n_objects == 0:
        obj_linear = np.zeros((1, 16), np.float32)
        obj_linear[0, [0, 4, 8]] = 1.0
    else:
        obj_linear = np.zeros((scene.n_objects, 16), np.float32)
        obj_linear[:, :9] = scene.object_transform[:, :3, :3].reshape(-1, 9)

    n_mats = max(scene.mat_metallic.shape[0], 1)
    mat_table = np.zeros((n_mats, 16), np.float32)
    if scene.mat_metallic.shape[0]:
        mat_table[:, 0] = scene.mat_metallic
        mat_table[:, 1] = scene.mat_roughness
        mat_table[:, 2] = scene.mat_emission
        mat_table[:, 3] = scene.mat_ior
        mat_table[:, 4] = _bitcast_i32_to_f32(scene.mat_texture)
        mat_table[:, 5] = _bitcast_i32_to_f32(scene.mat_has_texture)
        mat_table[:, 8:12] = scene.mat_color

    n_lights = scene.n_lights
    light_table = np.zeros((max(n_lights, 1), 8), np.float32)
    if n_lights > 0:
        # position = translation column of the node transform
        # (light.transform * (0,0,0,1), src/shader.wgsl:175)
        light_table[:, 0:3] = scene.light_transform[:, :3, 3]
        light_table[:, 4:8] = scene.light_color

    atlas, sizes = _pad_textures(scene.textures)

    # treelet tables for the binned wavefront path: only useful past the
    # engine's sorted-bounce threshold (render.py: n_triangles > 4096)
    tl = None
    if treelets == "always" or (treelets == "auto" and n_slots > 4096):
        from ..accel.treelets import build_treelets

        tl = build_treelets(bvh8, leaf_tris)

    # beyond-VMEM ("stream") scenes render through the binned treelet
    # path only — their resident-kernel tables (BVH8 rows, packed leaf
    # rows, strand tree) would be dead HBM weight. tables="auto" drops
    # them when the scene is treelet-backed, exceeds the packet kernel's
    # VMEM budget AND the default backend is a TPU (CPU keeps every
    # path: the XLA threaded walk needs the leaf rows there);
    # "stream" forces the drop (tests), "all" keeps everything.
    n8_bytes = bvh8.node_rows.shape[0] * 128 * 4
    leaf_bytes = leaf_tris.shape[0] * 128 * 4
    stream = tables == "stream" or (
        tables == "auto"
        and tl is not None
        and n8_bytes + leaf_bytes > 100 * 1024 * 1024
        and _default_backend_is_tpu()
    )

    # octant-threaded strand layout: the bounce-wave traversal kernel
    # (kernels/strand.py). Built for every scene past the bounce-sort
    # threshold: resident scenes load it into VMEM; beyond-VMEM (stream)
    # scenes keep it in HBM and the persistent kernel fetches rows via
    # overlapped async copies (strand_persistent tree_any — same
    # traversal, bit-identical, measured far above the binned route).
    strand_rows = None
    ribbon_rows = None
    strand_bytes = -(-bvh.n_nodes // 2) * 128 * 4
    fits_vmem = strand_bytes + leaf_bytes <= 100 * 1024 * 1024
    if n_slots > _sort_min_tris() and (fits_vmem or stream):
        from ..accel.strandtree import build_ribbon_tree, build_strand_tree

        strand_rows = build_strand_tree(bvh).rows
        # same node budget in a different numbering (the kernel loads one
        # layout, so the VMEM check above covers both); stream packs skip
        # it — the HBM route walks the strand layout only
        if fits_vmem and not stream:
            ribbon_rows = build_ribbon_tree(bvh).rows

    conv = np.ascontiguousarray if as_numpy else jnp.asarray
    fscalar = np.float32 if as_numpy else jnp.float32
    return ScenePack(
        tri_row=conv(tri_row),
        object_linear=conv(obj_linear),
        mat_table=conv(mat_table),
        light_table=conv(light_table),
        n_lights_f=fscalar(n_lights),
        scene_bmin=conv(bvh.bmin[0]),
        scene_bmax=conv(bvh.bmax[0]),
        tex_atlas=conv(atlas),
        tex_size=conv(np.asarray(sizes, np.int32)),
        bvh=BvhPack(
            nodes=conv(nodes),
            node8_rows=None if stream else conv(bvh8.node_rows),
            # stream scenes keep the leaf rows when a strand tree exists:
            # the HBM strand route fetches them per flush (tree_any)
            leaf_tris=(
                None if stream and strand_rows is None
                else conv(leaf_tris)
            ),
            strand_rows=(
                None if strand_rows is None else conv(strand_rows)
            ),
            ribbon_rows=(
                None if ribbon_rows is None else conv(ribbon_rows)
            ),
        ),
        has_textures=len(scene.textures) > 0,
        scene_diag=_quantize_sig(
            float(np.linalg.norm(bvh.bmax[0] - bvh.bmin[0]))
        ),
        tl_nodes=None if tl is None else conv(tl.tnodes),
        tl_leaves=None if tl is None else conv(tl.tleaves),
        tl_bmin=None if tl is None else conv(tl.tbox_min),
        tl_bmax=None if tl is None else conv(tl.tbox_max),
    )


def _quantize_sig(x: float, digits: int = 2) -> float:
    """Round to ``digits`` significant figures. scene_diag is a STATIC
    ScenePack field (part of every jit cache key), so two same-shape
    scenes with slightly different geometry must not recompile the whole
    renderer — the bounce-cap derived from it tolerates coarse precision."""
    if x == 0.0 or not np.isfinite(x):
        return float(x)
    scale = 10.0 ** (digits - 1 - int(np.floor(np.log10(abs(x)))))
    return float(np.round(x * scale) / scale)


def pack_camera(camera: CameraData) -> CameraPack:
    return CameraPack(
        world=jnp.asarray(camera.world, jnp.float32),
        projection=jnp.asarray(camera.projection, jnp.float32),
    )
