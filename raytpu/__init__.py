"""raytpu — a TPU-native Monte Carlo path tracer (JAX/XLA/Pallas).

A ground-up TPU rebuild of the capabilities of the wgpu/WGSL GPU ray tracer
``Jturnerusa/gpu-accelerated-raytracer``: glTF/GLB scenes + optional JSON
look-at camera in, path-traced PNG out. See SURVEY.md for the structural map
of the reference and the citations used throughout this package.

Typical use:

    import raytpu
    scene = raytpu.load_scene("cube.glb")
    cam = raytpu.load_camera_json("camera.json", 512, 512)  # or scene.camera
    cfg = raytpu.RenderConfig(width=512, height=512, seed=1,
                              samples=16, bounces=4, chunk_size=64)
    frame = raytpu.render(scene, cam, cfg)       # [H,W,4] float32
    raytpu.write_png("out.png", frame)
"""

from .engine.render import render_frame, render_frame_tiles, render_tile
from .io.png import quantize_rgba32f, write_png
from .scene.camera import (
    CameraData,
    camera_from_lookat,
    load_camera_json,
    look_at,
    perspective_matrix,
)
from .scene.gltf import GltfError, SceneData, load_scene
from .scene.pack import pack_camera, pack_scene
from .types import BvhPack, CameraPack, RenderConfig, ScenePack

__version__ = "0.1.0"


def render(scene, camera, config: RenderConfig):
    """Convenience wrapper: accepts host SceneData/CameraData or packed
    device objects and returns the [H,W,4] float32 frame."""
    pack = scene if isinstance(scene, ScenePack) else pack_scene(scene)
    if isinstance(camera, CameraData):
        camera = pack_camera(camera)
    return render_frame(pack, camera, config)


__all__ = [
    "BvhPack",
    "CameraData",
    "CameraPack",
    "GltfError",
    "RenderConfig",
    "SceneData",
    "ScenePack",
    "camera_from_lookat",
    "load_camera_json",
    "load_scene",
    "look_at",
    "pack_camera",
    "pack_scene",
    "perspective_matrix",
    "quantize_rgba32f",
    "render",
    "render_frame",
    "render_frame_tiles",
    "render_tile",
    "write_png",
]
