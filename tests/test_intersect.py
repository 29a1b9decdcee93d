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


def _build_bvh_pack(p0, e1, e2):
    """Fused node/leaf rows exactly as scene.pack builds them."""
    bvh, bvh8 = build_bvh(p0, e1, e2)
    order = bvh.tri_order
    n_slots = -(-max(int(order.shape[0]), LEAF_SIZE) // LEAF_SIZE) * LEAF_SIZE

    def scat(arr):
        out = np.zeros((n_slots,) + arr.shape[1:], arr.dtype)
        valid = order >= 0
        out[: order.shape[0]][valid] = arr[order[valid]]
        return out

    rp0, re1, re2 = scat(p0), scat(e1), scat(e2)
    nodes = np.zeros((bvh.n_nodes, 8), np.float32)
    nodes[:, 0:3] = bvh.bmin
    nodes[:, 3:6] = bvh.bmax
    nodes[:, 6] = bvh.miss.astype(np.int32).view(np.float32)
    leaf_row = np.where(
        bvh.leaf_first >= 0, bvh.leaf_first // LEAF_SIZE, -1
    ).astype(np.int32)
    nodes[:, 7] = leaf_row.view(np.float32)
    per_tri = np.concatenate(
        [rp0, re1, re2, np.zeros((n_slots, 1), np.float32)], axis=1
    )
    leaf_tris = per_tri.reshape(n_slots // LEAF_SIZE, LEAF_SIZE * 10)
    bpack = BvhPack(
        nodes=jnp.asarray(nodes),
        node8_rows=jnp.asarray(bvh8.node_rows),
        leaf_tris=jnp.asarray(leaf_tris),
    )
    return bvh, bpack, jnp.asarray(rp0), jnp.asarray(re1), jnp.asarray(re2)


@pytest.mark.parametrize("n_tris", [5, 37, 256])
def test_bvh_matches_bruteforce(n_tris):
    rng = np.random.default_rng(n_tris)
    a, b, c = _random_soup(n_tris, rng)
    bvh, bpack, rp0, re1, re2 = _build_bvh_pack(a, b - a, c - a)
    validate_bvh(bvh, n_tris)

    n_rays = 128
    ro = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    brute = intersect_bruteforce(ro, rd, rp0, re1, re2, 0.001, F32_MAX)
    tree = intersect_bvh(ro, rd, bpack, 0.001, F32_MAX, leaf_size=LEAF_SIZE)
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
        ro, rd, bpack, 0.0, tmax, leaf_size=LEAF_SIZE, any_hit=True
    )
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(ba))


def test_barycentrics_recompute_matches_direct():
    from raytpu.kernels.intersect import barycentrics

    rng = np.random.default_rng(0)
    a, b, c = _random_soup(64, rng)
    _, bpack, rp0, re1, re2 = _build_bvh_pack(a, b - a, c - a)
    n_slots = rp0.shape[0]
    tri_geo = jnp.concatenate(
        [rp0, re1, re2, jnp.zeros((n_slots, 3))], axis=1
    )  # geo rows: world p0/e1/e2 in cols 0:9
    n_rays = 64
    ro = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    hit = intersect_bruteforce(ro, rd, rp0, re1, re2, 0.001, F32_MAX)
    u, v = barycentrics(ro, rd, tri_geo[np.maximum(np.asarray(hit.tri), 0)])
    # direct per-winning-triangle evaluation
    tri = np.maximum(np.asarray(hit.tri), 0)
    t2, u2, v2, _ = moller_trumbore(
        ro, rd, rp0[tri], re1[tri], re2[tri], 0.001, F32_MAX
    )
    valid = np.asarray(hit.valid)
    np.testing.assert_array_equal(np.asarray(u)[valid], np.asarray(u2)[valid])
    np.testing.assert_array_equal(np.asarray(v)[valid], np.asarray(v2)[valid])
    # and the recomputed t equals the sweep's committed t
    np.testing.assert_array_equal(
        np.asarray(t2)[valid], np.asarray(hit.t)[valid]
    )


@pytest.mark.slow
def test_packet_kernel_matches_bruteforce_interpret():
    """The Pallas packet kernel (interpret mode, runs on CPU) must agree
    with the brute-force sweep on closest-hit t and any-hit blocking."""
    from raytpu.accel.bvh import validate_bvh8
    from raytpu.kernels.intersect_pallas import PACKET, packet_query

    rng = np.random.default_rng(7)
    a, b, c = _random_soup(300, rng)
    bvh, bpack, rp0, re1, re2 = _build_bvh_pack(a, b - a, c - a)
    validate_bvh8(build_bvh(a, b - a, c - a)[1], 300)

    n_rays = PACKET
    ro = jnp.asarray(rng.uniform(-8, 8, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))

    brute = intersect_bruteforce(ro, rd, rp0, re1, re2, 0.001, F32_MAX)
    t, tri = packet_query(
        bpack.node8_rows, bpack.leaf_tris,
        ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        jnp.full(n_rays, float(F32_MAX)), tmin=0.001, interpret=True,
    )
    t = np.asarray(t)
    bt = np.asarray(brute.t)
    valid = np.asarray(brute.valid)
    np.testing.assert_array_equal(tri >= 0, valid)
    np.testing.assert_allclose(t[valid], bt[valid], rtol=1e-6)

    # any-hit with per-ray tmax; dead lanes (tmax=-inf) never block
    tmax = rng.uniform(1, 20, n_rays).astype(np.float32)
    tmax[::7] = -np.inf  # simulate dead lanes
    ba = intersect_any_bruteforce(
        ro, rd, rp0, re1, re2, 0.0, jnp.asarray(np.where(
            np.isinf(tmax), -1.0, tmax).astype(np.float32))
    )
    _, tri_a = packet_query(
        bpack.node8_rows, bpack.leaf_tris,
        ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        jnp.asarray(tmax), tmin=0.0, any_hit=True, interpret=True,
    )
    blocked_pal = np.asarray(tri_a) >= 0
    blocked_brу = np.asarray(ba)
    live = ~np.isinf(tmax)
    np.testing.assert_array_equal(blocked_pal[live], blocked_brу[live])
    assert not blocked_pal[~live].any()


@pytest.mark.slow
def test_mixed_packet_matches_separate_queries_interpret():
    """mixed=True traces closest-hit and shadow lanes in one packet; the
    results must equal the separate closest / any-hit queries lane for
    lane, and the capped two-round scheme ([tmin, cap) then [cap, inf))
    must reproduce the single-round answer exactly."""
    from raytpu.kernels.intersect_pallas import PACKET, packet_query

    rng = np.random.default_rng(11)
    a, b, c = _random_soup(300, rng)
    bvh, bpack, rp0, re1, re2 = _build_bvh_pack(a, b - a, c - a)

    n = PACKET  # half closest, half shadow
    h = n // 2
    ro = jnp.asarray(rng.uniform(-8, 8, (n, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    sdist = rng.uniform(1, 20, h).astype(np.float32)
    sdist[::9] = -np.inf  # dead shadow lanes
    tmax = np.full(n, float(F32_MAX), np.float32)
    tmax[h:] = sdist
    tmax[5] = -np.inf  # a dead closest lane
    smask = np.zeros(n, np.float32)
    smask[h:] = 1.0

    args = (bpack.node8_rows, bpack.leaf_tris,
            ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2])
    t_m, tri_m = packet_query(
        *args, jnp.asarray(tmax), jnp.asarray(smask),
        tmin=0.001, mixed=True, shadow_tmin=0.0, interpret=True,
    )
    # reference: separate closest on the first half ...
    ctmax = np.full(n, float(F32_MAX), np.float32)
    ctmax[5] = -np.inf
    ctmax[h:] = -np.inf
    t_c, tri_c = packet_query(
        *args, jnp.asarray(ctmax), tmin=0.001, interpret=True,
    )
    # ... and any-hit on the second half
    atmax = np.full(n, -np.inf, np.float32)
    atmax[h:] = sdist
    _, tri_a = packet_query(
        *args, jnp.asarray(atmax), tmin=0.0, any_hit=True, interpret=True,
    )
    tri_m, t_m = np.asarray(tri_m), np.asarray(t_m)
    np.testing.assert_array_equal(tri_m[:h], np.asarray(tri_c)[:h])
    np.testing.assert_array_equal(t_m[:h], np.asarray(t_c)[:h])
    np.testing.assert_array_equal(
        tri_m[h:] >= 0, np.asarray(tri_a)[h:] >= 0
    )

    # capped two rounds == one uncapped round, lane for lane
    cap = 6.0
    t1, tri1 = packet_query(
        *args, jnp.minimum(jnp.asarray(tmax), cap), jnp.asarray(smask),
        tmin=0.001, mixed=True, shadow_tmin=0.0, interpret=True,
    )
    unresolved = (np.asarray(tri1) < 0) & (tmax > cap)
    t2, tri2 = packet_query(
        *args,
        jnp.asarray(np.where(unresolved, tmax, -np.inf).astype(np.float32)),
        jnp.asarray(smask), tmin=cap, mixed=True, shadow_tmin=cap,
        interpret=True,
    )
    t12 = np.where(np.asarray(tri1) >= 0, np.asarray(t1), np.asarray(t2))
    tri12 = np.where(np.asarray(tri1) >= 0, np.asarray(tri1),
                     np.asarray(tri2))
    np.testing.assert_array_equal(tri12[:h], tri_m[:h])
    np.testing.assert_array_equal(t12[:h], t_m[:h])
    np.testing.assert_array_equal(tri12[h:] >= 0, tri_m[h:] >= 0)


def test_native_builder_matches_python_renders():
    """The C++ builder (raytpu/native) may tie-break SAH splits differently
    from the Python reference builder, but any valid BVH must produce the
    same intersections."""
    import raytpu.native as rn
    from raytpu.accel.bvh import validate_bvh8

    if not rn.native_available():
        pytest.skip("no native toolchain")

    rng = np.random.default_rng(3)
    a, b, c = _random_soup(500, rng)
    p0, e1, e2 = a, b - a, c - a

    bvh_n, bvh8_n = build_bvh(p0, e1, e2)
    validate_bvh(bvh_n, 500)
    validate_bvh8(bvh8_n, 500)

    # force the Python builder
    lib, tried = rn._LIB, rn._TRIED
    rn._LIB, rn._TRIED = None, True
    try:
        bvh_p, bvh8_p = build_bvh(p0, e1, e2)
    finally:
        rn._LIB, rn._TRIED = lib, tried
    validate_bvh(bvh_p, 500)

    def traversal_t(bvh_arrays):
        order = bvh_arrays.tri_order
        n_slots = -(-max(int(order.shape[0]), LEAF_SIZE) // LEAF_SIZE) * (
            LEAF_SIZE
        )

        def scat(arr):
            out = np.zeros((n_slots,) + arr.shape[1:], arr.dtype)
            valid = order >= 0
            out[: order.shape[0]][valid] = arr[order[valid]]
            return out

        rp0, re1, re2 = scat(p0), scat(e1), scat(e2)
        nodes = np.zeros((bvh_arrays.n_nodes, 8), np.float32)
        nodes[:, 0:3] = bvh_arrays.bmin
        nodes[:, 3:6] = bvh_arrays.bmax
        nodes[:, 6] = bvh_arrays.miss.astype(np.int32).view(np.float32)
        leaf_row = np.where(
            bvh_arrays.leaf_first >= 0,
            bvh_arrays.leaf_first // LEAF_SIZE, -1,
        ).astype(np.int32)
        nodes[:, 7] = leaf_row.view(np.float32)
        per_tri = np.concatenate(
            [rp0, re1, re2, np.zeros((n_slots, 1), np.float32)], axis=1
        )
        leaf_tris = per_tri.reshape(n_slots // LEAF_SIZE, LEAF_SIZE * 10)
        bp = BvhPack(
            nodes=jnp.asarray(nodes),
            node8_rows=jnp.zeros((1, 128)),
            leaf_tris=jnp.asarray(leaf_tris),
        )
        r = 256
        rr = np.random.default_rng(9)
        ro = jnp.asarray(rr.uniform(-8, 8, (r, 3)).astype(np.float32))
        d = rr.normal(size=(r, 3)).astype(np.float32)
        rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        return np.asarray(
            intersect_bvh(ro, rd, bp, 0.001, F32_MAX, leaf_size=LEAF_SIZE).t
        )

    np.testing.assert_allclose(
        traversal_t(bvh_n), traversal_t(bvh_p), rtol=1e-6
    )


@pytest.mark.slow
def test_adversarial_overlapping_scene_fits_stack():
    """Worst-case trees (thousands of near-coincident triangles: SAH
    degenerates to median splits on identical centroids) must still satisfy
    the packet kernel's provable stack bound — and traverse correctly.
    Guards intersect_pallas.STACK_DEPTH against silent SMEM corruption."""
    from raytpu.accel.bvh import bvh8_depth
    from raytpu.kernels.intersect_pallas import (
        PACKET,
        STACK_DEPTH,
        packet_query,
    )

    rng = np.random.default_rng(11)
    n = 4096
    # all triangles overlapping inside a unit box around the origin
    jitter = rng.uniform(-1e-3, 1e-3, (n, 3)).astype(np.float32)
    a = np.tile(np.array([[-1.0, -1.0, 0.0]], np.float32), (n, 1)) + jitter
    b = np.tile(np.array([[1.0, -1.0, 0.0]], np.float32), (n, 1)) + jitter
    c = np.tile(np.array([[0.0, 1.0, 0.0]], np.float32), (n, 1)) + jitter
    bvh, bpack, rp0, re1, re2 = _build_bvh_pack(a, b - a, c - a)

    depth = bvh8_depth(np.asarray(bpack.node8_rows))
    assert 8 * depth + 8 <= STACK_DEPTH, (depth, STACK_DEPTH)

    n_rays = PACKET
    ro = jnp.asarray(rng.uniform(-2, 2, (n_rays, 3)).astype(np.float32))
    d = rng.normal(size=(n_rays, 3)).astype(np.float32)
    rd = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    # brute force needs a 512-multiple; pad with degenerate (e=0) triangles
    padn = (-rp0.shape[0]) % 512
    z = np.zeros((padn, 3), np.float32)
    brute = intersect_bruteforce(
        ro, rd,
        np.concatenate([rp0, z]), np.concatenate([re1, z]),
        np.concatenate([re2, z]), 0.001, F32_MAX,
    )
    t, tri = packet_query(
        bpack.node8_rows, bpack.leaf_tris,
        ro[:, 0], ro[:, 1], ro[:, 2], rd[:, 0], rd[:, 1], rd[:, 2],
        jnp.full(n_rays, float(F32_MAX)), tmin=0.001, interpret=True,
    )
    valid = np.asarray(brute.valid)
    np.testing.assert_array_equal(np.asarray(tri) >= 0, valid)
    np.testing.assert_allclose(
        np.asarray(t)[valid], np.asarray(brute.t)[valid], rtol=1e-6
    )
