"""Command-line driver with the reference's exact flag surface
(src/main.rs:30-52):

    raytpu --width W --height H --seed S --scene FILE.glb \
           --chunk-size C --samples N --bounces B \
           [--gui] [--output out.png] [--camera camera.json]

Camera resolution order matches src/state.rs:398-411: the JSON override wins;
otherwise the scene's glTF camera; a scene with neither is an error."""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="raytpu", description=__doc__)
    p.add_argument("--width", type=int, required=True)
    p.add_argument("--height", type=int, required=True)
    p.add_argument("--seed", type=int, required=True)
    p.add_argument("--scene", type=str, required=True)
    p.add_argument("--chunk-size", dest="chunk_size", type=int, required=True)
    p.add_argument("--samples", type=int, required=True)
    p.add_argument("--bounces", type=int, required=True)
    p.add_argument("--gui", action="store_true")
    p.add_argument("--output", type=str, default=None)
    p.add_argument("--camera", type=str, default=None)
    # raytpu extensions beyond the reference surface:
    p.add_argument(
        "--mode", choices=["path", "flat"], default="path",
        help="path tracing (reference behaviour) or flat primary-hit colour",
    )
    p.add_argument(
        "--checkpoint", type=str, default=None,
        help="progressive checkpoint file for resume (raytpu extension)",
    )
    p.add_argument(
        "--devices", type=int, default=1,
        help="shard the frame across this many TPU devices (raytpu extension)",
    )
    p.add_argument(
        "--profile", type=str, default=None,
        help="dump a JAX profiler trace of the render to this directory "
             "(raytpu extension; view with TensorBoard)",
    )
    return p


def _enable_compile_cache():
    """Persistent XLA compile cache for CLI runs: TPU compiles through
    the tunnel cost 30-120 s per config; repeat invocations with the
    same (size, samples, bounces, chunk) should pay it once. Same dir
    contract as bench.py (RAYTPU_CACHE overrides).

    TPU backends only: CPU compiles are fast enough not to need it, and
    the config is process-global — a test that drives main() on the
    forced-CPU backend would otherwise leave the cache on for every
    later interpret-mode kernel in the process, and serializing those
    executables can crash XLA's cache writer (observed segfault in
    compilation_cache.put_executable_and_time on CPU, r5)."""
    import os

    try:
        import jax

        if jax.default_backend() == "cpu":
            return
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "RAYTPU_CACHE", os.path.expanduser("~/.raytpu_jaxcache")
            ),
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
    except Exception:
        pass  # cache is best-effort; rendering must not depend on it


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    _enable_compile_cache()

    from . import (
        RenderConfig,
        load_camera_json,
        load_scene,
        pack_camera,
        pack_scene,
        write_png,
    )
    from .scene.gltf import GltfError

    try:
        scene = load_scene(args.scene)
    except (OSError, GltfError) as e:
        print(f"ray tracer error: failed to load scene file {args.scene}",
              file=sys.stderr)
        print(f" caused by: {e}", file=sys.stderr)
        return 1

    if args.camera is not None:
        camera = load_camera_json(args.camera, args.width, args.height)
    elif scene.camera is not None:
        camera = scene.camera
    else:
        print("ray tracer error: failed to load camera from scene",
              file=sys.stderr)
        return 1

    config = RenderConfig(
        width=args.width,
        height=args.height,
        seed=args.seed,
        samples=args.samples,
        bounces=args.bounces,
        chunk_size=args.chunk_size,
        mode=args.mode,
    )
    pack = pack_scene(scene)
    cam = pack_camera(camera)

    from contextlib import nullcontext

    if args.profile is not None:
        import jax

        profile_ctx = jax.profiler.trace(args.profile)
    else:
        profile_ctx = nullcontext()

    with profile_ctx:  # exceptions must still close the trace
        if args.gui:
            from .gui import run_gui

            frame = run_gui(pack, cam, config)
        elif args.devices > 1:
            from .parallel.shard import render_frame_sharded

            frame = render_frame_sharded(
                pack, cam, config, n_devices=args.devices
            )
        elif args.checkpoint is not None:
            from .engine.progressive import render_with_checkpoint

            frame = render_with_checkpoint(pack, cam, config, args.checkpoint)
        else:
            from .engine.render import render_frame

            frame = render_frame(pack, cam, config)

    if args.output is not None:
        write_png(args.output, frame)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
