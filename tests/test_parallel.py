"""Multi-device sharding tests on the 8-device virtual CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import pytest

import raytpu
from raytpu.parallel.shard import make_mesh, render_frame_sharded
from raytpu.scene.pack import pack_camera, pack_scene


@pytest.fixture(scope="module")
def packed(cube_scene, cube_camera):
    return pack_scene(cube_scene), pack_camera(cube_camera)


def test_eight_devices_available():
    assert len(jax.devices()) >= 8


@pytest.mark.slow
def test_row_sharded_render_matches_single_device(cube_scene, cube_camera,
                                                  packed):
    """Row sharding computes the same pixels with the same RNG streams; the
    only tolerated difference is 1-ulp float-associativity noise from XLA
    compiling different fusion shapes per shard count."""
    pack, cam = packed
    cfg = raytpu.RenderConfig(width=32, height=32, seed=1, samples=2,
                              bounces=3, chunk_size=16)
    single = np.asarray(raytpu.render(pack, cam, cfg))
    for n in (2, 4, 8):
        sharded = render_frame_sharded(pack, cam, cfg, n_devices=n)
        np.testing.assert_allclose(sharded, single, rtol=2e-6, atol=1e-7)


def test_spp_sharded_render_statistically_close(packed):
    pack, cam = packed
    cfg = raytpu.RenderConfig(width=32, height=32, seed=1, samples=8,
                              bounces=2, chunk_size=16)
    single = np.asarray(
        raytpu.render_frame(pack, cam, cfg)
    )
    mesh = make_mesh(2, 4)  # 2 row shards x 4 sample shards
    fast = render_frame_sharded(pack, cam, cfg, mesh=mesh)
    # decorrelated seeds: same expectation, different noise
    assert fast.shape == single.shape
    assert abs(float(fast.mean()) - float(single.mean())) < 0.05


def test_uneven_rows_pad_correctly(packed):
    pack, cam = packed
    cfg = raytpu.RenderConfig(width=32, height=20, seed=1, samples=1,
                              bounces=2, chunk_size=4)
    single = np.asarray(raytpu.render_frame(pack, cam, cfg))
    sharded = render_frame_sharded(pack, cam, cfg, n_devices=8)
    np.testing.assert_allclose(sharded, single, rtol=2e-6, atol=1e-7)
