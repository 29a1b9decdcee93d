"""Bilinear texture sampling from the padded atlas.

Reproduces WGSL ``textureSampleLevel(TEXTURES[i], SAMPLER, uv, 0.0)``
(src/shader.wgsl:350) with the reference's sampler state: linear min/mag
filtering and the wgpu default ClampToEdge address mode
(src/state.rs:699-704). Textures are Rgba8Unorm, so texels were normalised
to [0,1] at pack time and filtering happens in f32, exactly like the GPU."""

from __future__ import annotations

import jax.numpy as jnp


def sample_bilinear(
    atlas: jnp.ndarray,  # [T, maxH, maxW, 4] f32
    sizes: jnp.ndarray,  # [T, 2] i32 (width, height)
    tex_id: jnp.ndarray,  # [R] i32
    uv: jnp.ndarray,  # [R, 2] f32
) -> jnp.ndarray:
    """Returns [R,4] f32 samples."""
    wh = sizes[tex_id].astype(jnp.float32)  # [R,2]
    w = wh[:, 0]
    h = wh[:, 1]
    # texel-space coordinates; GPU convention puts texel centres at +0.5
    x = uv[:, 0] * w - 0.5
    y = uv[:, 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    wi = sizes[tex_id][:, 0]
    hi = sizes[tex_id][:, 1]

    def clamp(v, hi_excl):
        return jnp.clip(v.astype(jnp.int32), 0, hi_excl - 1)

    ix0 = clamp(x0, wi)
    ix1 = clamp(x0 + 1, wi)
    iy0 = clamp(y0, hi)
    iy1 = clamp(y0 + 1, hi)

    t00 = atlas[tex_id, iy0, ix0]
    t10 = atlas[tex_id, iy0, ix1]
    t01 = atlas[tex_id, iy1, ix0]
    t11 = atlas[tex_id, iy1, ix1]
    fx = fx[:, None]
    fy = fy[:, None]
    top = t00 * (1.0 - fx) + t10 * fx
    bot = t01 * (1.0 - fx) + t11 * fx
    return top * (1.0 - fy) + bot * fy
