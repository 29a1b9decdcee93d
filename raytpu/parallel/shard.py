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


@partial(jax.jit, static_argnames=("config", "rows_per_shard", "mesh"))
def _render_sharded(
    pack: ScenePack,
    camera: CameraPack,
    config: RenderConfig,
    rows_per_shard: int,
    mesh: Mesh,
):
    n_rows = mesh.shape["rows"]
    n_spp = mesh.shape["spp"]
    if n_spp > 1:
        if config.samples % n_spp:
            raise ValueError("samples must divide by the spp mesh axis")
        sub_samples = config.samples // n_spp
    else:
        sub_samples = config.samples

    def shard_fn(pack_, camera_):
        row_shard = jax.lax.axis_index("rows")
        y0 = (row_shard * rows_per_shard).astype(jnp.int32)
        if n_spp > 1:
            # decorrelated fast mode: each spp shard renders its own sample
            # batch under a distinct odd seed multiplier, then pmean merges.
            # lax.switch picks this shard's branch (only one executes).
            def branch(s):
                cfg = replace(
                    config,
                    samples=sub_samples,
                    seed=(config.seed * (2 * s + 1)) & 0xFFFFFFFF,
                )
                return lambda: render_tile(pack_, camera_, y0, cfg,
                                           rows_per_shard)

            spp_shard = jax.lax.axis_index("spp")
            mine = jax.lax.switch(spp_shard, [branch(s) for s in range(n_spp)])
            tile = jax.lax.pmean(mine, axis_name="spp")
        else:
            tile = render_tile(pack_, camera_, y0, config, rows_per_shard)
        return tile[None]  # leading axis: rows shard

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),  # scene + camera replicated
        out_specs=P("rows", None, None, None),
    )
    out = fn(pack, camera)
    return out.reshape(n_rows * rows_per_shard, config.width, 4)


def render_frame_sharded(
    pack: ScenePack,
    camera: CameraPack,
    config: RenderConfig,
    n_devices: int | None = None,
    n_sample_shards: int = 1,
    mesh: Mesh | None = None,
) -> np.ndarray:
    """Render the frame with rows sharded across devices."""
    if mesh is None:
        if n_devices is None:
            n_devices = len(jax.devices())
        mesh = make_mesh(n_devices // n_sample_shards, n_sample_shards)
    n_rows = mesh.shape["rows"]
    rows_per_shard = -(-config.height // n_rows)
    out = _render_sharded(pack, camera, config, rows_per_shard, mesh)
    return np.asarray(out)[: config.height]
