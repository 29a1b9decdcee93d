"""Progressive rendering with checkpoint/resume.

The reference is naturally checkpointable — all inter-chunk state is the
SAMPLES texture plus the ``current_chunk`` counter (src/state.rs:330-379) —
but never persists it (SURVEY.md §5). raytpu does: a checkpoint is an .npz
with the partial framebuffer and the next tile row. Tiles are deterministic
(seeded per pixel, kernels/rng.py), so resuming produces the identical
image."""

from __future__ import annotations

import hashlib
import os

import numpy as np

from ..types import CameraPack, RenderConfig, ScenePack
from .render import render_frame_tiles


def _ckpt_key(pack: ScenePack, camera: CameraPack,
              config: RenderConfig) -> str:
    """Fingerprint of everything a tile depends on. A checkpoint written
    under any other (config, camera, scene) must NOT be resumed — stitching
    rows rendered with different samples/bounces/camera would silently
    produce a frankenframe. Scene identity uses cheap host-side facts
    (counts, bounds, material and light tables) rather than hashing the
    full geometry."""
    h = hashlib.sha256()
    h.update(repr(config).encode())
    h.update(np.asarray(camera.world, np.float32).tobytes())
    h.update(np.asarray(camera.projection, np.float32).tobytes())
    h.update(str(np.asarray(pack.tri_row).shape).encode())
    h.update(np.asarray(pack.scene_bmin, np.float32).tobytes())
    h.update(np.asarray(pack.scene_bmax, np.float32).tobytes())
    h.update(np.asarray(pack.mat_table, np.float32).tobytes())
    h.update(np.asarray(pack.light_table, np.float32).tobytes())
    return h.hexdigest()


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
    key = _ckpt_key(pack, camera, config)
    next_y0 = 0
    if os.path.exists(path):
        ckpt = np.load(path)
        saved = ckpt["frame"]
        # legacy checkpoints (no key) never match: restart is the safe side
        saved_key = str(ckpt["key"]) if "key" in ckpt else ""
        if saved.shape == frame.shape and saved_key == key:
            frame = saved
            next_y0 = int(ckpt["next_y0"])

    def save(done_y0: int) -> None:
        np.savez(path, frame=frame, next_y0=np.int64(done_y0), key=key)

    pending = 0
    for y0, rows, tile in render_frame_tiles(pack, camera, config):
        if y0 + rows <= next_y0:
            continue  # already rendered in a previous run
        frame[y0 : y0 + rows] = tile
        pending += 1
        if pending >= save_every:
            save(y0 + rows)
            pending = 0
    save(config.height)
    return frame
