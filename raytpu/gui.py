"""Optional live progressive preview (the reference's --gui mode,
src/main.rs:196-286, which blits the SAMPLES texture per chunk).

Kept deliberately thin so it cannot contaminate the pure renderer: it simply
consumes the progressive tile generator. Backend preference order:
matplotlib window if a display is available, otherwise a terminal progress
line (headless CI / TPU pods have no display server)."""

from __future__ import annotations

import sys

import numpy as np

from .engine.render import render_frame_tiles
from .io.png import quantize_rgba32f


def _try_matplotlib():
    """Return pyplot only when a window can actually appear: a non-Agg
    interactive backend, or a display server for Agg to be switched away
    from. (get_backend() is always truthy, so it alone proves nothing —
    headless boxes default to Agg, which would 'show' invisibly.)"""
    try:
        import os

        import matplotlib

        backend = matplotlib.get_backend().lower()
        if "agg" in backend and not os.environ.get("DISPLAY"):
            return None  # headless: fall back to the progress line
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def run_gui(pack, camera, config) -> np.ndarray:
    frame = np.zeros((config.height, config.width, 4), np.float32)
    plt = _try_matplotlib()
    im = None
    if plt is not None:
        try:
            plt.ion()
            fig, ax = plt.subplots(num="raytpu")
            im = ax.imshow(quantize_rgba32f(frame))
            ax.set_axis_off()
        except Exception:
            plt, im = None, None

    done_rows = 0
    for y0, rows, tile in render_frame_tiles(pack, camera, config):
        frame[y0 : y0 + rows] = tile
        done_rows += rows
        if im is not None:
            im.set_data(quantize_rgba32f(frame))
            plt.pause(0.001)
        else:
            pct = 100.0 * done_rows / config.height
            print(f"\rraytpu: {pct:5.1f}% ({done_rows}/{config.height} rows)",
                  end="", file=sys.stderr, flush=True)
    if im is None:
        print(file=sys.stderr)
    elif plt is not None:
        plt.ioff()
        plt.show()
    return frame
