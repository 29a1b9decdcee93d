"""Intersection kernels: Möller–Trumbore unit cases, brute-force sweep, and
BVH traversal equivalence on random scenes."""

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.accel.bvh import LEAF_SIZE, build_bvh, validate_bvh
from raytpu.kernels.intersect import (
    F32_MAX,
    intersect_any_bruteforce,
    intersect_bruteforce,
    intersect_bvh,
    moller_trumbore,
)
from raytpu.types import BvhPack


def _tri_arrays(v0, v1, v2):
    p0 = np.asarray(v0, np.float32).reshape(-1, 3)
    e1 = np.asarray(v1, np.float32).reshape(-1, 3) - p0
    e2 = np.asarray(v2, np.float32).reshape(-1, 3) - p0
    return jnp.asarray(p0), jnp.asarray(e1), jnp.asarray(e2)


def test_mt_basic_hit():
    p0, e1, e2 = _tri_arrays([0, 0, 5], [2, 0, 5], [0, 2, 5])
    ro = jnp.asarray([[0.25, 0.25, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    t, u, v, hit = moller_trumbore(ro, rd, p0[0], e1[0], e2[0], 0.001, F32_MAX)
    assert bool(hit[0])
    assert float(t[0]) == pytest.approx(5.0)
    assert float(u[0]) == pytest.approx(0.125)
    assert float(v[0]) == pytest.approx(0.125)


def test_mt_miss_outside_and_behind():
    p0, e1, e2 = _tri_arrays([0, 0, 5], [2, 0, 5], [0, 2, 5])
    ro = jnp.asarray([[5.0, 5.0, 0.0], [0.25, 0.25, 10.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    _, _, _, hit = moller_trumbore(ro, rd, p0[0], e1[0], e2[0], 0.001, F32_MAX)
    assert not bool(hit[0])  # outside barycentric range
    assert not bool(hit[1])  # triangle behind the ray


def test_mt_degenerate_padding_never_hits():
    p0 = jnp.zeros((1, 3))
    e1 = jnp.zeros((1, 3))
    e2 = jnp.zeros((1, 3))
    ro = jnp.asarray([[0.0, 0.0, -1.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    _, _, _, hit = moller_trumbore(ro, rd, p0[0], e1[0], e2[0], 0.0, F32_MAX)
    assert not bool(hit[0])


def test_bruteforce_closest_of_two():
    p0, e1, e2 = _tri_arrays(
        [[-1, -1, 5], [-1, -1, 3]],
        [[1, -1, 5], [1, -1, 3]],
        [[0, 1, 5], [0, 1, 3]],
    )
    ro = jnp.asarray([[0.0, 0.0, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0]])
    hit = intersect_bruteforce(ro, rd, p0, e1, e2, 0.001, F32_MAX)
    assert bool(hit.valid[0])
    assert int(hit.tri[0]) == 1
    assert float(hit.t[0]) == pytest.approx(3.0)


def test_any_hit_respects_tmax():
    p0, e1, e2 = _tri_arrays([[-1, -1, 5]], [[1, -1, 5]], [[0, 1, 5]])
    ro = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
    rd = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    tmax = jnp.asarray([4.0, 6.0])
    blocked = intersect_any_bruteforce(ro, rd, p0, e1, e2, 0.0, tmax)
    assert not bool(blocked[0])  # light closer than the occluder
    assert bool(blocked[1])


def _random_soup(n_tris, rng):
    centers = rng.uniform(-5, 5, (n_tris, 3)).astype(np.float32)
    a = centers + rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    b = centers + rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    c = centers + rng.uniform(-0.5, 0.5, (n_tris, 3)).astype(np.float32)
    return a, b, c


@pytest.mark.parametrize("n_tris", [5, 37, 256])
def test_bvh_matches_bruteforce(n_tris):
    rng = np.random.default_rng(n_tris)
    a, b, c = _random_soup(n_tris, rng)
    p0 = a
    e1 = b - a
    e2 = c - a
    bvh = build_bvh(p0, e1, e2)
    validate_bvh(bvh, n_tris)

    # reorder into leaf order with degenerate padding (as pack_scene does)
    order = bvh.tri_order
    n_slots = order.shape[0]

    def scat(arr):
        out = np.zeros((n_slots,) + arr.shape[1:], arr.dtype)
        valid = order >= 0
        out[valid] = arr[order[valid]]
        return out

    rp0, re1, re2 = (jnp.asarray(scat(x)) for x in (p0, e1, e2))
    pad = (-n_slots) % 8
    if pad:
        rp0 = jnp.concatenate([rp0, jnp.zeros((pad, 3))])
        re1 = jnp.concatenate([re1, jnp.zeros((pad, 3))])
        re2 = jnp.concatenate([re2, jnp.zeros((pad, 3))])

    bpack = BvhPack(
        bmin=jnp.asarray(bvh.bmin),
        bmax=jnp.asarray(bvh.bmax),
        miss=jnp.asarray(bvh.miss),
        leaf_first=jnp.asarray(bvh.leaf_first),
        leaf_count=jnp.asarray(bvh.leaf_count),
    )

    n_rays = 128
    ro = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    brute = intersect_bruteforce(ro, rd, rp0, re1, re2, 0.001, F32_MAX)
    tree = intersect_bvh(
        ro, rd, rp0, re1, re2, bpack, 0.001, F32_MAX, leaf_size=LEAF_SIZE
    )
    np.testing.assert_allclose(
        np.asarray(tree.t), np.asarray(brute.t), rtol=1e-6
    )
    np.testing.assert_array_equal(
        np.asarray(tree.valid), np.asarray(brute.valid)
    )
    # same triangle except legitimate exact-t ties
    same = np.asarray(tree.tri) == np.asarray(brute.tri)
    ties = np.asarray(tree.t) == np.asarray(brute.t)
    assert (same | ties).all()

    # any-hit agreement with per-ray tmax
    tmax = jnp.asarray(rng.uniform(1, 20, n_rays).astype(np.float32))
    ba = intersect_any_bruteforce(ro, rd, rp0, re1, re2, 0.0, tmax)
    ta = intersect_bvh(
        ro, rd, rp0, re1, re2, bpack, 0.0, tmax, leaf_size=LEAF_SIZE,
        any_hit=True,
    )
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ba))
