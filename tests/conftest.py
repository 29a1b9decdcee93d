"""Test configuration: force the CPU backend with 8 virtual devices so the
whole suite (including multi-chip sharding tests) runs anywhere, per
SURVEY.md §4's backend-equivalence strategy. Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# ambient TPU plugins (axon) can override JAX_PLATFORMS; pin via config too
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cube_scene():
    import raytpu

    return raytpu.load_scene("/root/reference/cube.glb")


@pytest.fixture(scope="session")
def cube_camera():
    import raytpu

    return raytpu.load_camera_json("/root/reference/camera.json", 64, 64)
