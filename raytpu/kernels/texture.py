"""Bilinear texture sampling from the flat texel buffer.

Reproduces WGSL ``textureSampleLevel(TEXTURES[i], SAMPLER, uv, 0.0)``
(src/shader.wgsl:350) with the reference's sampler state: linear min/mag
filtering and the wgpu default ClampToEdge address mode
(src/state.rs:699-704). Textures are Rgba8Unorm, so texels were normalised
to [0,1] at pack time and filtering happens in f32, exactly like the GPU.

Storage is one flat [total_texels, 4] buffer with per-texture
(width, height, offset) descriptors — each texture at its native size,
like the reference's per-texture GPU bindings (src/state.rs:907-916).
(A padded [n, maxH, maxW, 4] cube would square badly with mixed sizes: one
4K texture would inflate every texture to a 4K footprint; the gathers here
cost the same either way.)"""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(
    atlas: jnp.ndarray,  # [N_texels, 4] f32 (all textures, row-major each)
    desc: jnp.ndarray,  # [T, 3] i32 (width, height, flat offset)
    tex_id: jnp.ndarray,  # [R] i32
    uv: jnp.ndarray,  # [R, 2] f32
) -> jnp.ndarray:
    """Returns [R,4] f32 samples."""
    d = desc[tex_id]  # [R,3]
    wi = d[:, 0]
    hi = d[:, 1]
    off = d[:, 2]
    w = wi.astype(jnp.float32)
    h = hi.astype(jnp.float32)
    # texel-space coordinates; GPU convention puts texel centres at +0.5
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0

    def clamp(v, hi_excl):
        return jnp.clip(v.astype(jnp.int32), 0, hi_excl - 1)

    ix0 = clamp(x0, wi)
    ix1 = clamp(x0 + 1, wi)
    iy0 = clamp(y0, hi)
    iy1 = clamp(y0 + 1, hi)

    t00 = atlas[off + iy0 * wi + ix0]
    t10 = atlas[off + iy0 * wi + ix1]
    t01 = atlas[off + iy1 * wi + ix0]
    t11 = atlas[off + iy1 * wi + ix1]
    fx = fx[:, None]
    fy = fy[:, None]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy
