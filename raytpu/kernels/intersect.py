"""Ray-triangle intersection: Möller–Trumbore sweeps and stackless BVH
traversal.

This module replaces the reference's hardware ray queries
(src/shader.wgsl:312-319; TLAS/BLAS built at src/state.rs:1145-1246). Two
device paths, both pure XLA (a Pallas packet-traversal variant lives in
``intersect_pallas.py``):

* **Brute-force sweep** — every ray against every triangle, scanned in
  fixed-size triangle chunks. XLA fuses the whole Möller–Trumbore chain
  with the running min, so this is dense VPU work with zero gathers — the
  fastest path for small scenes and the leaf tester for the BVH path.
* **Threaded-BVH traversal** — one ``lax.while_loop``. TPU row-gather cost
  is flat in row width, so each step does exactly TWO gathers: one fused
  node row [8] (bmin, bmax, miss, leaf) and, on leaves, one fused leaf row
  [80] holding LEAF_SIZE (8) triangles.

The intersection record carries (t, triangle slot, valid). Barycentrics
are NOT returned — ``barycentrics`` recomputes them from the winning
triangle's already-gathered tri_row (bit-identical: same inputs, same f32
ops), which avoids three [R, chunk]-shaped row-gathers per query.

Ranges are closed, [tmin, tmax], matching acceleration-structure semantics.
Degenerate padding triangles (e1 = e2 = 0) produce det == 0 and never hit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from ..accel.bvh import LEAF_SIZE

F32_MAX = jnp.float32(3.40282347e38)


class Hit(NamedTuple):
    t: jnp.ndarray  # [R] f32 (F32_MAX when no hit)
    tri: jnp.ndarray  # [R] i32 triangle slot (-1 when no hit)
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
    """Batched Möller–Trumbore. ro/rd broadcast against p0/e1/e2;
    returns (t, u, v, hit_mask)."""
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


def barycentrics(ro, rd, geo_rows):
    """(u, v) of each ray's winning triangle, recomputed from the already
    gathered per-hit rows (world p0/e1/e2 in columns 0:9). Bit-identical to
    the sweep's internal values."""
    geo = geo_rows
    p0 = geo[:, 0:3]
    e1 = geo[:, 3:6]
    e2 = geo[:, 6:9]
    pvec = _cross(rd, e2)
    det = _dot(e1, pvec)
    inv_det = 1.0 / det
    tvec = ro - p0
    u = _dot(tvec, pvec) * inv_det
    qvec = _cross(tvec, e1)
    v = _dot(rd, qvec) * inv_det
    return u, v


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
    """Closest hit over all triangles. ro/rd: [R,3]; tmax scalar or [R]."""
    n = tri_p0.shape[0]
    chunk = min(chunk, n)
    assert n % chunk == 0, "triangle array must pad to a chunk multiple"
    n_chunks = n // chunk
    ro_b = ro[:, None, :]
    rd_b = rd[:, None, :]
    tmax_b = tmax[:, None] if jnp.ndim(tmax) == 1 else tmax

    def body(carry, xs):
        best_t, best_tri = carry
        base, c_p0, c_e1, c_e2 = xs
        t, _, _, hit = moller_trumbore(
            ro_b, rd_b, c_p0, c_e1, c_e2, tmin, tmax_b
        )
        t = jnp.where(hit, t, F32_MAX)
        k = jnp.argmin(t, axis=1).astype(jnp.int32)
        ct = t.min(axis=1)
        better = ct < best_t
        # chunk triangle ids are consecutive: id = base + lane — no gather
        return (
            jnp.where(better, ct, best_t),
            jnp.where(better, base + k, best_tri),
        ), None

    zeros = (ro[:, 0] + rd[:, 0]) * 0.0  # varying-axis-correct init
    init = (zeros + F32_MAX, zeros.astype(jnp.int32) - 1)
    bases = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)
    (t, tri), _ = lax.scan(
        body,
        init,
        (
            bases,
            tri_p0.reshape(n_chunks, chunk, 3),
            tri_e1.reshape(n_chunks, chunk, 3),
            tri_e2.reshape(n_chunks, chunk, 3),
        ),
    )
    return Hit(t=t, tri=tri, valid=tri >= 0)


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
        _, _, _, hit = moller_trumbore(
            ro_b, rd_b, c_p0, c_e1, c_e2, tmin, tmax_b
        )
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
    """Ray-AABB slab test. Callers pre-clamp zero direction components to
    +/-tiny (see safe_inv_dir) so 0 * inf NaNs cannot appear."""
    t0 = (bmin - ro) * inv_d
    t1 = (bmax - ro) * inv_d
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    near = jnp.maximum(lo.max(axis=-1), tmin)
    far = jnp.minimum(hi.min(axis=-1), tmax)
    return near <= far


def safe_inv_dir(rd):
    """1/direction with exactly-zero components clamped to +/-1e-36: keeps
    slab intervals NaN-free with unchanged accept/reject for tmin >= 0."""
    tiny = jnp.float32(1e-36)
    safe = jnp.where(rd == 0.0, jnp.where(1.0 / rd < 0.0, -tiny, tiny), rd)
    return 1.0 / safe


def intersect_bvh(
    ro: jnp.ndarray,
    rd: jnp.ndarray,
    bvh,
    tmin,
    tmax,
    leaf_size: int = LEAF_SIZE,
    any_hit: bool = False,
):
    """Stackless threaded-BVH traversal over fused node/leaf rows.

    All rays advance in lockstep through their own node pointers inside one
    ``lax.while_loop``; finished rays park at ptr = -1. Each step costs one
    node-row gather plus (for lanes at a leaf) one leaf-row gather. ``tmax``
    may be per-ray. Returns Hit (closest) or bool blocked (any_hit)."""
    r = ro.shape[0]
    tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
    inv_d = safe_inv_dir(rd)
    nodes = bvh.nodes
    leaf_tris = bvh.leaf_tris

    def cond(state):
        return jnp.any(state[0] >= 0)

    def body(state):
        ptr, best_t, best_tri = state
        active = ptr >= 0
        idx = jnp.maximum(ptr, 0)
        node = nodes[idx]  # one fused row gather [R,8]
        node_bmin = node[:, 0:3]
        node_bmax = node[:, 3:6]
        miss = lax.bitcast_convert_type(node[:, 6], jnp.int32)
        leaf_row = lax.bitcast_convert_type(node[:, 7], jnp.int32)
        is_leaf = leaf_row >= 0
        limit = jnp.minimum(best_t, tmax_r)
        hit_box = _slab_test(node_bmin, node_bmax, ro, inv_d, tmin, limit)

        test_leaf = active & is_leaf & hit_box
        lrow = leaf_tris[jnp.where(test_leaf, leaf_row, 0)]  # [R,40]
        tris = lrow.reshape(r, leaf_size, 10)
        t, _, _, hit = moller_trumbore(
            ro[:, None, :], rd[:, None, :],
            tris[:, :, 0:3], tris[:, :, 3:6], tris[:, :, 6:9],
            tmin, limit[:, None],
        )
        hit = hit & test_leaf[:, None]
        t = jnp.where(hit, t, F32_MAX)
        k = jnp.argmin(t, axis=1).astype(jnp.int32)
        ct = t.min(axis=1)
        better = ct < best_t
        best_t = jnp.where(better, ct, best_t)
        best_tri = jnp.where(better, leaf_row * leaf_size + k, best_tri)

        descend = hit_box & ~is_leaf
        nxt = jnp.where(descend, idx + 1, miss)
        if any_hit:
            nxt = jnp.where(best_t < F32_MAX, -1, nxt)
        ptr = jnp.where(active, nxt, -1)
        return ptr, best_t, best_tri

    zeros = (ro[:, 0] + rd[:, 0]) * 0.0
    init = (
        zeros.astype(jnp.int32),
        zeros + F32_MAX,
        zeros.astype(jnp.int32) - 1,
    )
    ptr, t, tri = lax.while_loop(cond, body, init)
    if any_hit:
        return tri >= 0
    return Hit(t=t, tri=tri, valid=tri >= 0)


def make_intersectors(pack, bruteforce_max_tris: int = 2048,
                      chunk: int = 512, which: str = "auto"):
    """Pick the path by (static) scene size; returns (closest_fn, any_fn)
    with signatures (ro, rd, tmin, tmax)."""
    n = pack.tri_p0.shape[0]
    use_brute = (
        which == "brute"
        or (which == "auto" and n <= bruteforce_max_tris)
    )
    if use_brute:
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
        if pack.bvh.leaf_tris is None:
            raise ValueError(
                "scene was packed with tables='stream' (beyond-VMEM "
                "binned route only); repack with tables='all' for the "
                "threaded-BVH/brute intersectors"
            )
        leaf_size = LEAF_SIZE

        def closest(ro, rd, tmin, tmax):
            return intersect_bvh(
                ro, rd, pack.bvh, tmin, tmax, leaf_size=leaf_size,
            )

        def any_hit(ro, rd, tmin, tmax):
            return intersect_bvh(
                ro, rd, pack.bvh, tmin, tmax, leaf_size=leaf_size,
                any_hit=True,
            )

    return closest, any_hit
