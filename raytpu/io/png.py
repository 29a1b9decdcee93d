"""PNG output with the reference's exact quantisation.

The reference downloads the RGBA32F frame and converts per channel with a
Rust saturating float->u8 ``as`` cast — truncation toward zero, clamped to
[0, 255], NaN -> 0, alpha dropped, **no gamma or tone mapping**
(src/main.rs:324-365)."""

from __future__ import annotations

import numpy as np


def quantize_rgba32f(frame: np.ndarray) -> np.ndarray:
    """[H,W,4] f32 -> [H,W,3] u8 exactly like rgba32float_to_rgba8888."""
    rgb = frame[..., :3].astype(np.float64) * 255.0
    rgb = np.nan_to_num(rgb, nan=0.0, posinf=255.0, neginf=0.0)
    rgb = np.clip(np.trunc(rgb), 0.0, 255.0)
    return rgb.astype(np.uint8)


def write_png(path: str, frame: np.ndarray) -> None:
    """Save an RGBA32F frame as RGB8 PNG (src/main.rs:338-349)."""
    from PIL import Image

    Image.fromarray(quantize_rgba32f(frame), mode="RGB").save(path, format="PNG")
