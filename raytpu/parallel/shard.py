"""Multi-chip rendering via jax.sharding + shard_map.

The reference is single-GPU; its only parallelism is pixels (SURVEY.md
§2.7). The TPU-native scaling story is therefore pure data parallelism over
the pixel domain: shard framebuffer rows across a 1-D ICI mesh with the
scene tables replicated. Row sharding preserves reference-exact RNG (each
pixel's stream is self-contained), so a multi-chip render matches the
single-chip one up to 1-ulp float-associativity noise from per-shape XLA
fusion decisions.

An optional second mesh axis ("spp") splits the per-pixel sample loop across
chips and ``pmean``s the result. Because the reference's RNG is serial
across samples (src/shader.wgsl:412-414) this mode decorrelates the streams
(each spp shard seeds with ``seed * (2*shard + 1)``): statistically
equivalent, not bit-equal — a fast mode, not a parity mode.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine.render import render_tile
from ..types import CameraPack, RenderConfig, ScenePack


def make_mesh(n_row_shards: int, n_sample_shards: int = 1) -> Mesh:
    need = n_row_shards * n_sample_shards
    devs = np.array(jax.devices())
    if devs.size < need:
        raise ValueError(f"need {need} devices, have {devs.size}")
    return Mesh(devs[:need].reshape(n_row_shards, n_sample_shards),
                ("rows", "spp"))


@partial(
    jax.jit,
    static_argnames=("config", "rows_per_shard", "mesh", "tiles_per_shard"),
)
def _render_sharded(
    pack: ScenePack,
    camera: CameraPack,
    config: RenderConfig,
    rows_per_shard: int,
    mesh: Mesh,
    tiles_per_shard: int = 1,
):
    """With tiles_per_shard > 1, each shard renders that many
    ``rows_per_shard``-row tiles assigned round-robin (shard s takes tiles
    s, s + n, s + 2n, ...) — trading per-tile size for load balance when
    ray cost is concentrated in a few rows (see
    benchmarks/multichip_report.py for measured balance)."""
    n_rows = mesh.shape["rows"]
    n_spp = mesh.shape["spp"]
    if n_spp > 1:
        if config.samples % n_spp:
            raise ValueError("samples must divide by the spp mesh axis")
        sub_samples = config.samples // n_spp
    else:
        sub_samples = config.samples

    def render_one(pack_, camera_, y0):
        if n_spp > 1:
            # decorrelated fast mode: each spp shard renders its own sample
            # batch under a distinct odd seed multiplier, then pmean merges.
            # The per-shard seed is a TRACED value so every shard (and every
            # spp-axis size) shares one compiled render program — compile
            # time is flat in the spp axis.
            spp_shard = jax.lax.axis_index("spp")
            seed = (
                jnp.uint32(config.seed) * (2 * spp_shard.astype(jnp.uint32)
                                           + 1)
            )
            cfg = replace(config, samples=sub_samples)
            mine = render_tile(pack_, camera_, y0, cfg, rows_per_shard,
                               seed=seed)
            return jax.lax.pmean(mine, axis_name="spp")
        return render_tile(pack_, camera_, y0, config, rows_per_shard)

    def shard_fn(pack_, camera_):
        row_shard = jax.lax.axis_index("rows")
        tiles = [
            render_one(
                pack_, camera_,
                ((i * n_rows + row_shard) * rows_per_shard).astype(jnp.int32),
            )
            for i in range(tiles_per_shard)
        ]
        # leading axes: [rows shard = 1, tile index]
        return jnp.stack(tiles)[None]

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),  # scene + camera replicated
        out_specs=P("rows", None, None, None, None),
    )
    out = fn(pack, camera)  # [n_rows, tiles_per_shard, tile_h, W, 4]
    # tile t = i * n_rows + s sits at rows [t * rows_per_shard, ...): undo
    # the round-robin by making the tile index the slow axis
    out = out.transpose(1, 0, 2, 3, 4)
    return out.reshape(
        n_rows * tiles_per_shard * rows_per_shard, config.width, 4
    )


def render_frame_sharded(
    pack: ScenePack,
    camera: CameraPack,
    config: RenderConfig,
    n_devices: int | None = None,
    n_sample_shards: int = 1,
    mesh: Mesh | None = None,
    tiles_per_shard: int = 1,
) -> np.ndarray:
    """Render the frame with rows sharded across devices.

    tiles_per_shard > 1 splits each shard's rows into that many round-robin
    tiles for load balance (ray cost concentrates where geometry is); 1 =
    one contiguous block per shard (largest tiles, best per-tile kernel
    efficiency)."""
    if mesh is None:
        if n_devices is None:
            n_devices = len(jax.devices())
        mesh = make_mesh(n_devices // n_sample_shards, n_sample_shards)
    n_rows = mesh.shape["rows"]
    rows_per_shard = -(-config.height // (n_rows * tiles_per_shard))
    out = _render_sharded(pack, camera, config, rows_per_shard, mesh,
                          tiles_per_shard)
    return np.asarray(out)[: config.height]
