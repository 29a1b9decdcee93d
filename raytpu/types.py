"""Core value types: render configuration and the device scene pack.

``ScenePack`` is the TPU-resident equivalent of the reference's 13-binding
GPU bind group (src/state.rs:786-1039), laid out for the TPU memory system:
every per-hit lookup is **one wide row gather** (row-gather cost on TPU is
flat in row width up to ~128 floats, so tables pack all the data a kernel
step needs into a single row):

* ``tri_row``   [T, 64]  EVERYTHING the shade phase needs for one hit in a
                         single gather: world p0/e1/e2 (barycentric
                         recompute), object-space corner pos/normal/uv,
                         the triangle's material parameters and colour,
                         and the object's 3x3 linear transform — replacing
                         the shader's 5-level gather chain
                         (src/shader.wgsl:259-293) plus its material and
                         object fetches
* ``mat_table`` [M, 16]  metallic/roughness/emission/ior/texture ids + rgba
                         (kept for inspection/tools; shading reads tri_row)
* ``light_table``[L, 8]  position + color
* ``bvh.nodes`` [N, 8]   bmin, bmax, miss link, leaf row (bitcast int32)
* ``bvh.leaf_tris`` [Nl, 80]  8 triangles x (p0,e1,e2,pad) world space
                         (LEAF_SIZE = 8, accel/bvh.py)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import jax


@dataclass(frozen=True)
class RenderConfig:
    """Static render parameters; mirrors the reference CLI flag surface
    (src/main.rs:30-52). Hashable: used as a static jit argument."""

    width: int
    height: int
    seed: int
    samples: int
    bounces: int
    chunk_size: int
    # raytpu extensions (not in the reference):
    mode: str = "path"  # "path" | "flat" — flat = primary-ray base colour
    tile_rows: Optional[int] = None  # rows per render tile; None = auto
    bruteforce_max_tris: int = 2048  # scenes at/below this skip the BVH
    # "auto" | "brute" | "bvh" | "packet" | "strand" | "binned"
    intersector: str = "auto"
    # how the packet path traverses bounce-wave queries:
    #   "sorted" — coherence-sorted continuation + shadow queries, routed
    #              to the strand kernel when the pack carries a strand
    #              tree (kernels/strand.py)
    #   "mixed"  — deferred NEE on the persistent strand kernel: bounce
    #              b's shadow wave and bounce b+1's continuation wave
    #              share ONE coherence sort and ONE kernel launch with
    #              per-lane any-hit flags (strand_query_persistent
    #              mixed=True) — halves per-bounce sorts and launches
    #   "binned" — deferred-NEE rays are binned by treelet and walk only
    #              their treelet's streamed window (kernels/binned.py) —
    #              the beyond-VMEM route, forced automatically there
    # (a round-2 "mixed" resident arm on the PACKET kernel — capped
    # two-round form — measured slower end-to-end and was retired,
    # record: docs/PROFILE_r2.md; today's "mixed" is the round-3
    # persistent-kernel form)
    bounce_backend: str = "sorted"


def _pytree_dataclass(meta_fields=()):
    def wrap(cls):
        names = [f.name for f in cls.__dataclass_fields__.values()]
        data = [n for n in names if n not in meta_fields]
        jax.tree_util.register_dataclass(
            cls, data_fields=data, meta_fields=list(meta_fields)
        )
        return cls

    return wrap


@_pytree_dataclass()
@dataclass(frozen=True)
class BvhPack:
    """Both BVH device layouts (see raytpu.accel.bvh).

    ``nodes``: threaded binary layout, [N, 8] f32 — bmin(3), bmax(3),
    col 6 = bitcast int32 miss link (-1 terminates), col 7 = bitcast int32
    leaf row (-1 for interior). Used by the XLA while_loop path.
    ``node8_rows``: 8-wide layout, [N8, 128] f32 — child k at columns
    [16k, 16k+16): bmin, bmax, bitcast link (interior child index, or
    ~leaf_row). Used by the Pallas packet kernel.
    ``leaf_tris``: shared leaf rows, [Nl, 8*10] f32 — 8 triangles x
    (p0, e1, e2, pad); global triangle slot of leaf row j, lane k is
    8*j + k."""

    nodes: Any  # [N, 8] f32
    node8_rows: Any  # [N8, 128] f32
    leaf_tris: Any  # [Nl, 80] f32
    # octant-threaded layout for the strand kernel (accel/strandtree.py):
    # two nodes per 128-lane row, 8 (hit, miss) link pairs per node — one
    # near-first DFS threading per ray-direction octant. None when the
    # scene is under the bounce-sort threshold or past the VMEM budget.
    strand_rows: Any = None  # [ceil(N/2), 128] f32
    # ribbon layout (accel/strandtree.py RibbonTree): per-octant pre-order
    # renumbered threading, 16 nodes of one octant per row — hit-chains
    # advance inside a fetched row without a new scalar fetch
    # (rows_per_oct = shape[0] // 8). Built whenever strand_rows is.
    ribbon_rows: Any = None  # [8 * ceil(N/16), 128] f32


@_pytree_dataclass(meta_fields=("has_textures", "scene_diag"))
@dataclass(frozen=True)
class ScenePack:
    """Device-resident scene. All shapes are static; counts derive from
    shapes. Triangles are stored in BVH leaf order, padded with degenerate
    triangles (e1 = e2 = 0 never intersect) so kernels need no masks."""

    # fused per-triangle shade row (see module docstring); columns 0:9
    # are world-space p0/e1/e2 — the brute-force sweep reads them through
    # the tri_p0/tri_e1/tri_e2 property VIEWS below (one stored copy;
    # XLA fuses the slices into consumers)
    tri_row: Any  # [T,64] f32
    # per-object linear transform rows (w=0 quirk needs only the 3x3 part,
    # src/shader.wgsl:345)
    object_linear: Any  # [O,16] f32 (3x3 row-major + pad)
    # materials: metallic, roughness, emission, ior, bitcast(texture),
    # bitcast(has_texture), color rgba, pad -> 16 cols
    mat_table: Any  # [M,16] f32
    # lights: position(3), pad, color(4) (position = transform @ origin,
    # src/shader.wgsl:175,189); padded to >= 1 with a black light
    light_table: Any  # [L,8] f32
    n_lights_f: Any  # [] f32 — f32(UNIFORMS.lights) incl. 0-light scenes
    # textures: flat texel buffer, normalized like Rgba8Unorm reads; each
    # texture at native size (memory = sum of w*h, not n * max footprint)
    tex_atlas: Any  # [N_texels, 4] f32
    tex_size: Any  # [Tx, 3] i32 (width, height, flat offset)
    # world bounds (BVH root box) — ray-sorting keys quantise against these
    scene_bmin: Any  # [3] f32
    scene_bmax: Any  # [3] f32
    # software acceleration structure
    bvh: BvhPack
    # static: False when the scene has no textures at all, which lets the
    # renderer skip sampling entirely (the reference binds a dummy 1x1
    # texture in that case, src/state.rs:613-620)
    has_textures: bool = False
    # static: host-side length of the scene bounding-box diagonal; the
    # engine derives the (compile-time) bounce traversal cap from it
    scene_diag: float = 0.0
    # treelet tables for the binned wavefront path (accel/treelets.py,
    # kernels/binned.py); None when packed without treelets (small scenes)
    tl_nodes: Any = None  # [T, Sn, 128] f32
    tl_leaves: Any = None  # [T, Sl, 128] f32 (col 10k+9 = bitcast slot)
    tl_bmin: Any = None  # [T, 3] f32
    tl_bmax: Any = None  # [T, 3] f32

    @property
    def tri_p0(self):
        return self.tri_row[:, 0:3]

    @property
    def tri_e1(self):
        return self.tri_row[:, 3:6]

    @property
    def tri_e2(self):
        return self.tri_row[:, 6:9]

    @property
    def n_triangles(self) -> int:
        return int(self.tri_row.shape[0])

    @property
    def n_materials(self) -> int:
        return int(self.mat_table.shape[0])

    @property
    def n_objects(self) -> int:
        return int(self.object_linear.shape[0])

    @property
    def n_lights(self) -> int:
        return int(self.light_table.shape[0])


@_pytree_dataclass()
@dataclass(frozen=True)
class CameraPack:
    """Device camera: the two matrices of the reference's Uniforms
    (src/state.rs:22-24)."""

    world: Any  # [4,4] f32 ("view" in the shader)
    projection: Any  # [4,4] f32 (inverse perspective)
