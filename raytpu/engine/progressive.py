"""Progressive rendering with checkpoint/resume.

The reference is naturally checkpointable — all inter-chunk state is the
SAMPLES texture plus the ``current_chunk`` counter (src/state.rs:330-379) —
but never persists it (SURVEY.md §5). raytpu does: a checkpoint is an .npz
with the partial framebuffer and the next tile row. Tiles are deterministic
(seeded per pixel, kernels/rng.py), so resuming produces the identical
image."""

from __future__ import annotations

import os

import numpy as np

from ..types import CameraPack, RenderConfig, ScenePack
from .render import render_frame_tiles


def render_with_checkpoint(
    pack: ScenePack,
    camera: CameraPack,
    config: RenderConfig,
    path: str,
    save_every: int = 1,
) -> np.ndarray:
    """Render, persisting progress to ``path`` after every ``save_every``
    tiles; resumes from an existing checkpoint of the same shape."""
    frame = np.zeros((config.height, config.width, 4), np.float32)
    next_y0 = 0
    if os.path.exists(path):
        ckpt = np.load(path)
        saved = ckpt["frame"]
        if saved.shape == frame.shape and int(ckpt["seed"]) == config.seed:
            frame = saved
            next_y0 = int(ckpt["next_y0"])

    pending = 0
    for y0, rows, tile in render_frame_tiles(pack, camera, config):
        if y0 + rows <= next_y0:
            continue  # already rendered in a previous run
        frame[y0 : y0 + rows] = tile
        pending += 1
        if pending >= save_every:
            np.savez(
                path, frame=frame, next_y0=np.int64(y0 + rows),
                seed=np.int64(config.seed),
            )
            pending = 0
    np.savez(
        path, frame=frame, next_y0=np.int64(config.height),
        seed=np.int64(config.seed),
    )
    return frame
