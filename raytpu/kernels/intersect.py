"""Ray-triangle intersection: Möller–Trumbore sweeps and stackless BVH
traversal.

This module replaces the reference's hardware ray queries
(src/shader.wgsl:312-319; TLAS/BLAS built at src/state.rs:1145-1246). Two
device paths, both pure XLA (a Pallas variant lives in
``intersect_pallas.py``):

* **Brute-force sweep** — every ray against every triangle, scanned in
  fixed-size triangle chunks to bound memory. Dense VPU work with zero
  gathers; the fastest possible path for small scenes (the cube fixture has
  12 triangles) and the leaf tester for the BVH path.
* **Threaded-BVH traversal** — one ``lax.while_loop``; each step gathers one
  node per ray (skip-link layout from raytpu.accel.bvh) and, when the node
  is a leaf, tests its ``leaf_size`` contiguous triangles.

The intersection record mirrors WGSL ``RayIntersection``'s consumed fields
(src/shader.wgsl:259-286): committed t, triangle id (which pre-resolves
instance_custom_index / geometry_index / primitive_index — see
scene/pack.py), and barycentrics (u, v) with hit = v0*(1-u-v) + v1*u + v2*v.

Ranges are closed, [tmin, tmax], matching acceleration-structure semantics.
Degenerate padding triangles (e1 = e2 = 0) produce det == 0 and can never
hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

F32_MAX = jnp.float32(3.40282347e38)


class Hit(NamedTuple):
    t: jnp.ndarray  # [R] f32 (F32_MAX when no hit)
    tri: jnp.ndarray  # [R] i32 (-1 when no hit)
    u: jnp.ndarray  # [R] f32 barycentric of v1
    v: jnp.ndarray  # [R] f32 barycentric of v2
    valid: jnp.ndarray  # [R] bool


def _dot(a, b):
    """Explicitly-associated dot so CPU/TPU round identically (parity with
    the scalar oracle; shadow rays are ulp-sensitive)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def _cross(a, b):
    return jnp.stack(
        [
            a[..., 1] * b[..., 2] - a[..., 2] * b[..., 1],
            a[..., 2] * b[..., 0] - a[..., 0] * b[..., 2],
            a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0],
        ],
        axis=-1,
    )


def moller_trumbore(ro, rd, p0, e1, e2, tmin, tmax):
    """Batched Möller–Trumbore. ro/rd broadcast against p0/e1/e2 on the
    second-to-last axis; returns (t, u, v, hit_mask)."""
    pvec = _cross(rd, e2)
    det = _dot(e1, pvec)
    inv_det = 1.0 / det
    tvec = ro - p0
    u = _dot(tvec, pvec) * inv_det
    qvec = _cross(tvec, e1)
    v = _dot(rd, qvec) * inv_det
    t = _dot(e2, qvec) * inv_det
    hit = (
        (det != 0.0)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= tmin)
        & (t <= tmax)
    )
    return t, u, v, hit


def intersect_bruteforce(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tri_p0: jnp.ndarray,
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    tmin,
    tmax,
    chunk: int = 512,
) -> Hit:
    """Closest hit over all triangles. ro/rd: [R,3]."""
    n = tri_p0.shape[0]
    chunk = min(chunk, n)
    assert n % chunk == 0, "triangle array must pad to a chunk multiple"
    n_chunks = n // chunk
    r = ro.shape[0]
    ro_b = ro[:, None, :]
    rd_b = rd[:, None, :]

    def body(carry, tri_chunk):
        best_t, best_tri, best_u, best_v = carry
        c_p0, c_e1, c_e2, c_ids = tri_chunk
        t, u, v, hit = moller_trumbore(ro_b, rd_b, c_p0, c_e1, c_e2, tmin, tmax)
        t = jnp.where(hit, t, F32_MAX)
        # argmin within the chunk, then merge with carry
        k = jnp.argmin(t, axis=1)
        rows = jnp.arange(r)
        ct, cu, cv = t[rows, k], u[rows, k], v[rows, k]
        cid = c_ids[k]
        better = ct < best_t
        return (
            jnp.where(better, ct, best_t),
            jnp.where(better, cid, best_tri),
            jnp.where(better, cu, best_u),
            jnp.where(better, cv, best_v),
        ), None

    ids = jnp.arange(n, dtype=jnp.int32).reshape(n_chunks, chunk)
    # carries derive from the rays so their sharding axes match the
    # outputs (required under shard_map's varying-axis checks); ro alone is
    # not enough — a pinhole origin is a broadcast constant
    zeros = (ro[:, 0] + rd[:, 0]) * 0.0
    init = (
        zeros + F32_MAX,
        zeros.astype(jnp.int32) - 1,
        zeros,
        zeros,
    )
    (t, tri, u, v), _ = lax.scan(
        body,
        init,
        (
            tri_p0.reshape(n_chunks, chunk, 3),
            tri_e1.reshape(n_chunks, chunk, 3),
            tri_e2.reshape(n_chunks, chunk, 3),
            ids,
        ),
    )
    return Hit(t=t, tri=tri, u=u, v=v, valid=tri >= 0)


def intersect_any_bruteforce(
    ro, rd, tri_p0, tri_e1, tri_e2, tmin, tmax, chunk: int = 512
) -> jnp.ndarray:
    """Any-hit (shadow) query: bool [R]. tmax may be per-ray [R]."""
    n = tri_p0.shape[0]
    chunk = min(chunk, n)
    n_chunks = n // chunk
    ro_b = ro[:, None, :]
    rd_b = rd[:, None, :]
    tmax_b = tmax[:, None] if jnp.ndim(tmax) == 1 else tmax

    def body(blocked, tri_chunk):
        c_p0, c_e1, c_e2 = tri_chunk
        _, _, _, hit = moller_trumbore(ro_b, rd_b, c_p0, c_e1, c_e2, tmin, tmax_b)
        return blocked | hit.any(axis=1), None

    blocked, _ = lax.scan(
        body,
        ((ro[:, 0] + rd[:, 0]) * 0.0).astype(bool),
        (
            tri_p0.reshape(n_chunks, chunk, 3),
            tri_e1.reshape(n_chunks, chunk, 3),
            tri_e2.reshape(n_chunks, chunk, 3),
        ),
    )
    return blocked


def _slab_test(bmin, bmax, ro, inv_d, tmin, tmax):
    """Ray-AABB slab test; robust to inv_d = ±inf (axis-parallel rays)."""
    t0 = (bmin - ro) * inv_d
    t1 = (bmax - ro) * inv_d
    # NaNs (0 * inf) must not poison the min/max: replace with ±inf
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    lo = jnp.where(jnp.isnan(lo), -jnp.inf, lo)
    hi = jnp.where(jnp.isnan(hi), jnp.inf, hi)
    near = jnp.maximum(lo.max(axis=-1), tmin)
    far = jnp.minimum(hi.min(axis=-1), tmax)
    return near <= far


def intersect_bvh(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    tri_p0: jnp.ndarray,
    tri_e1: jnp.ndarray,
    tri_e2: jnp.ndarray,
    bvh,
    tmin,
    tmax,
    leaf_size: int = 4,
    any_hit: bool = False,
):
    """Stackless threaded-BVH closest-hit (or any-hit) traversal.

    All rays advance in lockstep through their own node pointers inside one
    ``lax.while_loop``; finished rays park at ptr = -1. ``tmax`` may be
    per-ray. Returns Hit (closest) or bool blocked (any_hit)."""
    r = ro.shape[0]
    tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    inv_d = 1.0 / rd

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        ptr, best_t, best_tri, best_u, best_v = state
        active = ptr >= 0
        idx = jnp.maximum(ptr, 0)
        node_bmin = bvh.bmin[idx]
        node_bmax = bvh.bmax[idx]
        leaf_first = bvh.leaf_first[idx]
        is_leaf = leaf_first >= 0
        limit = jnp.minimum(best_t, tmax_r)
        hit_box = _slab_test(node_bmin, node_bmax, ro, inv_d, tmin, limit)

        test_leaf = active & is_leaf & hit_box
        # gather the leaf's triangles (contiguous, leaf_size-aligned);
        # inactive lanes gather slot 0 harmlessly
        base = jnp.where(test_leaf, leaf_first, 0)
        tri_ids = base[:, None] + jnp.arange(leaf_size, dtype=jnp.int32)
        lp0 = tri_p0[tri_ids]
        le1 = tri_e1[tri_ids]
        le2 = tri_e2[tri_ids]
        t, u, v, hit = moller_trumbore(
            ro[:, None, :], rd[:, None, :], lp0, le1, le2, tmin, limit[:, None]
        )
        hit = hit & test_leaf[:, None]
        t = jnp.where(hit, t, F32_MAX)
        k = jnp.argmin(t, axis=1)
        rows = jnp.arange(r)
        ct = t[rows, k]
        better = ct < best_t
        best_t = jnp.where(better, ct, best_t)
        best_tri = jnp.where(better, tri_ids[rows, k], best_tri)
        best_u = jnp.where(better, u[rows, k], best_u)
        best_v = jnp.where(better, v[rows, k], best_v)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, idx + 1, bvh.miss[idx])
        if any_hit:
            # stop a lane as soon as anything blocks it
            nxt = jnp.where(best_t < F32_MAX, -1, nxt)
        ptr = jnp.where(active, nxt, -1)
        return ptr, best_t, best_tri, best_u, best_v

    zeros = (ro[:, 0] + rd[:, 0]) * 0.0
    init = (
        zeros.astype(jnp.int32),
        zeros + F32_MAX,
        zeros.astype(jnp.int32) - 1,
        zeros,
        zeros,
    )
    ptr, t, tri, u, v = lax.while_loop(cond, body, init)
    if any_hit:
        return tri >= 0
    return Hit(t=t, tri=tri, u=u, v=v, valid=tri >= 0)


def make_intersectors(pack, bruteforce_max_tris: int = 2048, chunk: int = 512):
    """Pick the path by (static) scene size; returns (closest_fn, any_fn)
    with signatures (ro, rd, tmin, tmax)."""
    n = pack.tri_p0.shape[0]
    if n <= bruteforce_max_tris:
        def closest(ro, rd, tmin, tmax):
            return intersect_bruteforce(
                ro, rd, pack.tri_p0, pack.tri_e1, pack.tri_e2, tmin, tmax,
                chunk=chunk,
            )

        def any_hit(ro, rd, tmin, tmax):
            return intersect_any_bruteforce(
                ro, rd, pack.tri_p0, pack.tri_e1, pack.tri_e2, tmin, tmax,
                chunk=chunk,
            )
    else:
        from ..accel.bvh import LEAF_SIZE as leaf_size

        def closest(ro, rd, tmin, tmax):
            return intersect_bvh(
                ro, rd, pack.tri_p0, pack.tri_e1, pack.tri_e2, pack.bvh,
                tmin, tmax, leaf_size=leaf_size,
            )

        def any_hit(ro, rd, tmin, tmax):
            return intersect_bvh(
                ro, rd, pack.tri_p0, pack.tri_e1, pack.tri_e2, pack.bvh,
                tmin, tmax, leaf_size=leaf_size, any_hit=True,
            )

    return closest, any_hit
