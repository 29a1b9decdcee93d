"""Reference-exact random number generator, vectorised.

The reference shader carries one u32 of RNG state per thread
(src/shader.wgsl:45) seeded per pixel per chunk (src/shader.wgsl:398) and
draws floats with a Murmur3-style multiply-rotate hash
(src/shader.wgsl:137-149):

    hash(k): k *= 0xcc9e2d51; k = rotl(k, 15); k *= 0x1b873593
    rand():  RNG = hash(RNG); return bitcast<f32>(0x3f800000 | (RNG >> 9)) - 1

Because the number of rand() calls per sample is data-dependent (material
branches), image parity at matched seed requires replaying the exact call
sequence. We do that with per-ray u32 state updated under masks: a lane that
would not have executed rand() in the reference keeps its previous state.
This gives bit-identical random sequences to the WGSL kernel, which is what
lets golden tests assert near-bit-exact images rather than loose SSIM.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_C1 = jnp.uint32(0xCC9E2D51)
_C2 = jnp.uint32(0x1B873593)
_ONE_BITS = jnp.uint32(0x3F800000)


def hash_u32(k: jnp.ndarray) -> jnp.ndarray:
    """One Murmur3 mixing round (src/shader.wgsl:137-143)."""
    k = (k * _C1).astype(jnp.uint32)
    k = (k << 15) | (k >> 17)
    return (k * _C2).astype(jnp.uint32)


def u32_to_unit_float(bits: jnp.ndarray) -> jnp.ndarray:
    """bitcast(0x3f800000 | (bits >> 9)) - 1.0 in [0, 1)
    (src/shader.wgsl:146-149)."""
    mantissa = _ONE_BITS | (bits >> 9)
    return lax.bitcast_convert_type(mantissa, jnp.float32) - 1.0


def rand(state: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Advance every lane's state and return (new_state, value)."""
    new = hash_u32(state)
    return new, u32_to_unit_float(new)


def rand_masked(
    state: jnp.ndarray, mask: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rand() only where ``mask``: lanes outside keep their state (their
    returned value is unspecified and must be consumed under the mask)."""
    new = hash_u32(state)
    return jnp.where(mask, new, state), u32_to_unit_float(new)


def seed_pixels(
    px: jnp.ndarray,
    py: jnp.ndarray,
    width: int,
    chunk_size: int,
    seed: int,
) -> jnp.ndarray:
    """Per-pixel initial RNG state.

    The reference seeds each thread as
    ``(gid.x+1) * (gid.y+1) * (current_chunk+1) * seed`` (src/shader.wgsl:398)
    where gid is the *chunk-local* pixel coordinate and ``current_chunk``
    indexes row-major ``chunk_size``-square tiles over the frame
    (src/shader.wgsl:400-404). All multiplies wrap mod 2^32."""
    px = px.astype(jnp.uint32)
    py = py.astype(jnp.uint32)
    cs = jnp.uint32(chunk_size)
    chunks_per_row = jnp.uint32(max(width // chunk_size, 1))
    chunk = (py // cs) * chunks_per_row + (px // cs)
    lx = px % cs
    ly = py % cs
    s = (lx + jnp.uint32(1)) * (ly + jnp.uint32(1))
    s = (s * (chunk + jnp.uint32(1))).astype(jnp.uint32)
    return (s * jnp.uint32(seed)).astype(jnp.uint32)
