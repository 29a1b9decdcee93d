"""Core value types: render configuration and the device scene pack.

``ScenePack`` is the TPU-resident equivalent of the reference's 13-binding
GPU bind group (src/state.rs:786-1039): the same logical tables lowered to
SoA ``jnp`` arrays, plus the software BVH that replaces the hardware
TLAS/BLAS, plus pre-flattened world-space triangles that replace per-instance
ray transforms (TPU-first layout; see raytpu/scene/pack.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
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


def _pytree_dataclass(cls):
    """Register a dataclass whose fields are all array leaves."""
    fields = [f.name for f in cls.__dataclass_fields__.values()]
    jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])
    return cls


@_pytree_dataclass
@dataclass(frozen=True)
class BvhPack:
    """Device copy of accel.bvh.BvhArrays (threaded stackless layout)."""

    bmin: Any  # [N,3] f32
    bmax: Any  # [N,3] f32
    miss: Any  # [N] i32
    leaf_first: Any  # [N] i32
    leaf_count: Any  # [N] i32


@_pytree_dataclass
@dataclass(frozen=True)
class ScenePack:
    """Device-resident scene. All shapes are static; counts are derived from
    shapes so the pack can flow through jit without retracing surprises.

    Triangle arrays are ordered by the BVH's leaf order (or identity when the
    scene is brute-force-sized) and padded with degenerate triangles
    (e1 = e2 = 0 never intersect), so kernels need no validity masks."""

    # world-space triangle geometry (v0 / edge1 / edge2)
    tri_p0: Any  # [T,3] f32
    tri_e1: Any  # [T,3] f32
    tri_e2: Any  # [T,3] f32
    # per-triangle shading metadata (reference decodes these through the
    # object->mesh->primitive->index chain, src/shader.wgsl:259-293; we
    # pre-resolve the chain at pack time)
    tri_vi: Any  # [T,3] i32 global vertex indices
    tri_material: Any  # [T] i32
    tri_object: Any  # [T] i32
    # vertex tables (object space, exactly the reference vertex buffer)
    vertex_pos: Any  # [V,3] f32
    vertex_normal: Any  # [V,3] f32
    vertex_uv: Any  # [V,2] f32
    # per-object linear part of the instance transform; the reference's hit
    # point uses w=0 (translation dropped, src/shader.wgsl:345), so only the
    # 3x3 block is ever needed on device.
    object_linear: Any  # [O,3,3] f32
    # material SoA (src/scene/mod.rs:16-25)
    mat_metallic: Any  # [M] f32
    mat_roughness: Any  # [M] f32
    mat_emission: Any  # [M] f32
    mat_ior: Any  # [M] f32
    mat_texture: Any  # [M] i32
    mat_has_texture: Any  # [M] i32
    mat_color: Any  # [M,4] f32
    # lights: position = transform @ (0,0,0,1) pre-resolved
    # (src/shader.wgsl:175,189); padded to >=1 with a black light.
    light_pos: Any  # [L,3] f32
    light_color: Any  # [L,4] f32
    n_lights_f: Any  # [] f32 — f32(UNIFORMS.lights) incl. 0-light scenes
    # textures: padded atlas, normalized to [0,1] f32 like Rgba8Unorm reads
    tex_atlas: Any  # [Tx, maxH, maxW, 4] f32
    tex_size: Any  # [Tx, 2] i32 (width, height)
    # software acceleration structure
    bvh: BvhPack

    @property
    def n_triangles(self) -> int:
        return int(self.tri_p0.shape[0])

    @property
    def n_lights(self) -> int:
        return int(self.light_pos.shape[0])


@_pytree_dataclass
@dataclass(frozen=True)
class CameraPack:
    """Device camera: the two matrices of the reference's Uniforms
    (src/state.rs:22-24)."""

    world: Any  # [4,4] f32 ("view" in the shader)
    projection: Any  # [4,4] f32 (inverse perspective)
