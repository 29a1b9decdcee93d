"""GEMM intersector: ray-triangle intersection as batched matmuls.

The strand/packet kernels are VPU/scalar-issue bound (~40 cycles per
walker-step, docs/PROFILE_r3.md) while the MXU idles. This path feeds it:

1. **Selection** — slab-test every ray against the T treelet bounds
   (dense [R, T] elementwise; treelets from accel/treelets.py, same
   frontier cut as the binned path but at a smaller budget so each
   treelet carries a GEMM-sized triangle block);
2. **Pair routing** — each ray's candidate treelets become (key=treelet,
   ray payload) pairs, padded per-treelet to 128-pair chunks and moved
   by ONE payload sort (sorts are the only fast permutation primitive
   on TPU: random gathers/scatters run ~21M rows/s, payload sorts
   stream at near-bandwidth — measured, docs/PROFILE_r3.md);
3. **Woop GEMMs** — per 128-pair chunk (one treelet each), transform
   rays into every triangle's unit-triangle frame with two batched
   matmuls ([C,128,4] @ [C,4,3K] and [C,128,3] @ [C,3,3K], K = tris
   per treelet), then ~10 elementwise ops recover (t, u, v) and the
   range/validity tests (Woop, "Watertight Ray/Triangle Intersection"
   — the affine form; fast variant, not the watertight one);
4. **Combine** — chunk results unsort back to the [R, PMAX] pair grid
   via a second payload sort and reduce with a vector min.

Parity: this path is NOT bit-identical to the Moller-Trumbore engines
(different op order and an MXU accumulation), so its tests compare with
tolerances — the driver's actual bar is SSIM >= 0.99 at Monte Carlo
seed tolerance (BASELINE.json), which ulp-level t differences satisfy.
Replaces the traversal half of src/shader.wgsl:312-319 with dense MXU
work instead of a walk.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

F32_MAX = 3.40282347e38
PMAX = 16  # max candidate treelets per ray; overflowing candidates are
# DROPPED (missed hits), so gemm_query also returns the overflow count —
# callers size the treelet budget so it stays zero (p99 was 7 at T=36,
# PROFILE_r3; it grows as treelets shrink)
CHUNK = 128  # pairs per GEMM chunk (MXU M-dimension)


class GemmTables:
    """Host-built per-treelet Woop tables.

    wo: [T, 4, 3K] — origin transform (rows: ox,oy,oz,1)
    wd: [T, 3, 3K] — direction transform
    slot: [T, K] int32 global triangle slot per treelet-local triangle
    tbox_min/max: [T, 3] selection boxes
    """

    def __init__(self, wo, wd, slot, tbox_min, tbox_max):
        self.wo = wo
        self.wd = wd
        self.slot = slot
        self.tbox_min = tbox_min
        self.tbox_max = tbox_max

    @property
    def n_treelets(self):
        return self.wo.shape[0]

    @property
    def tris_per_treelet(self):
        return self.slot.shape[1]


def build_gemm_tables(tl) -> GemmTables:
    """Lower TreeletArrays (accel/treelets.py) to Woop GEMM tables.

    For triangle (p0, e1, e2) with normal n = e1 x e2, the world-to-
    unit-triangle transform is M = inv([e1 e2 n]) (columns), applied as
    o' = M (o - p0), d' = M d; then with t = -o'_z / d'_z the
    barycentrics are u = o'_x + t d'_x, v = o'_y + t d'_y. Degenerate
    (padding) triangles emit all-zero rows -> d'_z = o'_z = 0 -> t is
    NaN -> every comparison fails -> no hit."""
    tn = np.asarray(tl.tleaves)
    T, Sl, _ = tn.shape
    K = Sl * 8
    p0 = np.zeros((T, K, 3), np.float64)
    e1 = np.zeros((T, K, 3), np.float64)
    e2 = np.zeros((T, K, 3), np.float64)
    slot = np.zeros((T, K), np.int32)
    for k in range(8):
        b = 10 * k
        p0[:, k::8] = tn[:, :, b : b + 3]
        e1[:, k::8] = tn[:, :, b + 3 : b + 6]
        e2[:, k::8] = tn[:, :, b + 6 : b + 9]
        slot[:, k::8] = tn[:, :, b + 9].view(np.float32).view(np.int32)
    n = np.cross(e1, e2)
    m = np.stack([e1, e2, n], axis=-1)  # [T,K,3,3] columns e1|e2|n
    det = np.linalg.det(m)
    ok = np.abs(det) > 1e-30
    m_safe = np.where(ok[..., None, None], m, np.eye(3))
    minv = np.linalg.inv(m_safe)
    minv = np.where(ok[..., None, None], minv, 0.0)  # degenerate -> 0
    # wo rows: [3K, 4] per treelet -> transpose to [4, 3K]
    # o'_i = minv[i] . o - minv[i] . p0
    wo = np.zeros((T, 4, 3 * K), np.float32)
    wd = np.zeros((T, 3, 3 * K), np.float32)
    for i in range(3):
        wo[:, 0:3, i::3] = minv[:, :, i, :].transpose(0, 2, 1)
        wo[:, 3, i::3] = -np.einsum("tkj,tkj->tk", minv[:, :, i, :], p0)
        wd[:, 0:3, i::3] = minv[:, :, i, :].transpose(0, 2, 1)
    return GemmTables(
        wo=jnp.asarray(wo),
        wd=jnp.asarray(wd),
        slot=jnp.asarray(slot),
        tbox_min=jnp.asarray(np.asarray(tl.tbox_min)),
        tbox_max=jnp.asarray(np.asarray(tl.tbox_max)),
    )


@functools.partial(
    jax.jit, static_argnames=("tmin", "any_hit", "slab_rays")
)
def gemm_query(
    wo, wd, slot, tbox_min, tbox_max,
    ro, rd, tmax,
    tmin: float = 0.001,
    any_hit: bool = False,
    slab_rays: int = 65536,
):
    """Closest-hit (t, tri) / any-hit blocked over all rays.

    Rays are processed in ``slab_rays`` slabs so each routing sort's
    working set stays VMEM-resident (the lax.sort spill cliff,
    docs/PROFILE_r3.md)."""
    r = ro.shape[0]
    T = tbox_min.shape[0]
    K = slot.shape[1]
    r_pad = -(-r // slab_rays) * slab_rays
    if r_pad != r:
        pad = r_pad - r
        ro = jnp.concatenate([ro, jnp.zeros((pad, 3), ro.dtype)])
        rd = jnp.concatenate([rd, jnp.ones((pad, 3), rd.dtype)])
        tmax = jnp.concatenate(
            [jnp.broadcast_to(tmax, (r,)),
             jnp.full((pad,), -jnp.inf, jnp.float32)]
        )
    else:
        tmax = jnp.broadcast_to(tmax, (r,))

    def one_slab(args):
        o, d, tm = args
        R = o.shape[0]
        tiny = 1e-36
        sd = jnp.where(d == 0.0, jnp.where(1.0 / d < 0.0, -tiny, tiny), d)
        inv = 1.0 / sd
        # --- selection: [R, T] slab test ---
        lo = jnp.where(inv[:, None, :] < 0, tbox_max[None], tbox_min[None])
        hi = jnp.where(inv[:, None, :] < 0, tbox_min[None], tbox_max[None])
        t0 = (lo - o[:, None, :]) * inv[:, None, :]
        t1 = (hi - o[:, None, :]) * inv[:, None, :]
        near = jnp.maximum(t0.max(-1), jnp.float32(tmin))
        far = jnp.minimum(t1.min(-1), tm[:, None])
        cand = near <= far  # [R, T]

        # --- pair build: [R, PMAX] candidate treelet ids (ray-major) ---
        slot_idx = jnp.cumsum(cand.astype(jnp.int32), axis=1) - 1
        pair_t = jnp.full((R, PMAX), T, jnp.int32)  # T = empty key
        tids = jnp.arange(T, dtype=jnp.int32)
        for s in range(PMAX):
            sel = cand & (slot_idx == s)
            val = jnp.max(jnp.where(sel, tids[None], -1), axis=1)
            pair_t = pair_t.at[:, s].set(
                jnp.where(val >= 0, val, pair_t[:, s])
            )

        # --- per-treelet pad pairs to the next CHUNK multiple ---
        # count pairs actually EMITTED (rank < PMAX; overflow candidates
        # are dropped as misses), else pads misalign the chunk grid
        counts = jnp.sum(
            (cand & (slot_idx < PMAX)).astype(jnp.int32), axis=0
        )  # [T]
        pads_needed = (-counts) % CHUNK  # [T]
        pad_rank = jnp.arange(CHUNK - 1, dtype=jnp.int32)
        pad_keys = jnp.where(
            pad_rank[None, :] < pads_needed[:, None], tids[:, None], T
        ).reshape(-1)  # [T*(CHUNK-1)]
        # keep the total length a CHUNK multiple (the trailing empty-key
        # region absorbs the remainder)
        extra = (-(R * PMAX + pad_keys.shape[0])) % CHUNK
        if extra:
            pad_keys = jnp.concatenate(
                [pad_keys, jnp.full((extra,), T, jnp.int32)]
            )

        # --- ONE payload sort routes pairs (+pads) into chunk order ---
        n_pairs = R * PMAX
        keys = jnp.concatenate([pair_t.reshape(-1), pad_keys])
        zpad = jnp.zeros((pad_keys.shape[0],), jnp.float32)
        cols = lambda a: jnp.concatenate(
            [jnp.repeat(a, PMAX), zpad]
        )
        pidx = jnp.concatenate([
            jax.lax.iota(jnp.int32, n_pairs),
            jnp.full((pad_keys.shape[0],), n_pairs, jnp.int32),
        ])
        (k_s, ox, oy, oz, dx, dy, dz, tms, pix) = jax.lax.sort(
            (keys, cols(o[:, 0]), cols(o[:, 1]), cols(o[:, 2]),
             cols(sd[:, 0]), cols(sd[:, 1]), cols(sd[:, 2]), cols(tm),
             pidx),
            num_keys=1,
        )
        # real+pad pairs, chunked; every chunk holds ONE treelet by
        # construction (segments padded to CHUNK multiples; empty-key
        # pairs sort last)
        n_chunk = (n_pairs + pad_keys.shape[0]) // CHUNK
        tc = k_s.reshape(n_chunk, CHUNK)[:, 0]  # [C]
        tc_c = jnp.minimum(tc, T - 1)
        O4 = jnp.stack(
            [ox, oy, oz, jnp.ones_like(ox)], axis=-1
        ).reshape(n_chunk, CHUNK, 4)
        D3 = jnp.stack([dx, dy, dz], axis=-1).reshape(n_chunk, CHUNK, 3)
        WO = wo[tc_c]  # [C, 4, 3K]
        WD = wd[tc_c]  # [C, 3, 3K]
        op = jax.lax.batch_matmul(
            O4, WO, precision=jax.lax.Precision.HIGHEST
        ).reshape(n_chunk, CHUNK, K, 3)
        dp = jax.lax.batch_matmul(
            D3, WD, precision=jax.lax.Precision.HIGHEST
        ).reshape(n_chunk, CHUNK, K, 3)
        t = -op[..., 2] / dp[..., 2]  # [C, CHUNK, K]
        u = op[..., 0] + t * dp[..., 0]
        v = op[..., 1] + t * dp[..., 1]
        tmc = tms.reshape(n_chunk, CHUNK)
        valid = (
            (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
            & (t >= tmin)
        )
        if any_hit:
            valid = valid & (t <= tmc[..., None])
        else:
            valid = valid & (t < tmc[..., None])
        gslot = slot[tc_c][:, None, :]  # [C, 1, K]
        # lexicographic (t, slot) min via composite key; slots < 2^24 so
        # the fractional tie nudge cannot reorder distinct t values
        tkey = jnp.where(valid, t, jnp.float32(jnp.inf))
        best_k = jnp.argmin(tkey, axis=-1)  # first (lowest-slot) min
        bt = jnp.take_along_axis(tkey, best_k[..., None], -1)[..., 0]
        bs = jnp.take_along_axis(
            jnp.broadcast_to(gslot, valid.shape), best_k[..., None], -1
        )[..., 0]
        hitc = jnp.isfinite(bt)  # [C, CHUNK]

        # --- unsort back to the [R, PMAX] pair grid, reduce per ray ---
        _, t_u, tri_u, hit_u = jax.lax.sort(
            (pix,
             jnp.where(hitc, bt, F32_MAX).reshape(-1),
             jnp.where(hitc, bs, -1).reshape(-1),
             hitc.astype(jnp.int32).reshape(-1)),
            num_keys=1,
        )
        t_g = t_u[:n_pairs].reshape(R, PMAX)
        tri_g = tri_u[:n_pairs].reshape(R, PMAX)
        hit_g = hit_u[:n_pairs].reshape(R, PMAX) == 1
        ov = jnp.sum((jnp.sum(cand.astype(jnp.int32), axis=1) > PMAX)
                     .astype(jnp.int32))
        if any_hit:
            return (
                jnp.zeros((R,), jnp.float32), jnp.where(
                    jnp.any(hit_g, axis=1), jnp.int32(0), jnp.int32(-1)
                ), ov,
            )
        best = jnp.argmin(t_g, axis=1)
        bt_r = jnp.take_along_axis(t_g, best[:, None], 1)[:, 0]
        btri_r = jnp.take_along_axis(tri_g, best[:, None], 1)[:, 0]
        any_r = jnp.any(hit_g, axis=1)
        return (
            jnp.where(any_r, bt_r, F32_MAX),
            jnp.where(any_r, btri_r, -1),
            ov,
        )

    outs_t = []
    outs_tri = []
    overflow = jnp.int32(0)
    for s0 in range(0, r_pad, slab_rays):
        sl = slice(s0, s0 + slab_rays)
        t_s, tri_s, ov = one_slab((ro[sl], rd[sl], tmax[sl]))
        outs_t.append(t_s)
        outs_tri.append(tri_s)
        overflow = overflow + ov
    t = jnp.concatenate(outs_t)[:r]
    tri = jnp.concatenate(outs_tri)[:r]
    return t, tri, overflow


def gemm_tables_from_pack(pack, budget_rows: int = 512) -> GemmTables:
    """Small-budget treelet cut + Woop tables from a full pack (needs
    tables='all': rebuilds from the BVH8 rows + leaf rows)."""
    from ..accel.bvh import Bvh8Arrays
    from ..accel.treelets import build_treelets

    node_rows = np.asarray(pack.bvh.node8_rows)
    leaf_tris = np.asarray(pack.bvh.leaf_tris)
    bvh8 = Bvh8Arrays(
        node_rows=node_rows,
        n_leaf_rows=leaf_tris.shape[0],
    )
    tl = build_treelets(bvh8, leaf_tris, budget_rows=budget_rows)
    return build_gemm_tables(tl)


def make_gemm_intersectors(pack, budget_rows: int = 256,
                           slab_rays: int = 65536):
    """(closest_fn, any_fn) with the engine's (ro, rd, tmin, tmax)
    signature. Like the other factories, tmin binds here (closest 0.001,
    any-hit 0.0 per src/shader.wgsl:174-186,312-319); the per-call tmin_
    is ignored. Needs a full pack (tables='all'/resident: BVH8 + leaf
    rows feed the treelet cut)."""
    from .intersect import Hit

    if pack.gm_wo is not None:
        # pack-time tables (trace-safe: the factory runs inside jit)
        gt = GemmTables(pack.gm_wo, pack.gm_wd, pack.gm_slot,
                        pack.gm_bmin, pack.gm_bmax)
    else:
        gt = gemm_tables_from_pack(pack, budget_rows=budget_rows)

    def closest(ro, rd, tmin_, tmax):
        t, tri, _ = gemm_query(
            gt.wo, gt.wd, gt.slot, gt.tbox_min, gt.tbox_max,
            ro, rd, tmax, tmin=0.001, any_hit=False,
            slab_rays=slab_rays,
        )
        return Hit(t=t, tri=tri, valid=tri >= 0)

    def any_fn(ro, rd, tmin_, tmax):
        _, tri, _ = gemm_query(
            gt.wo, gt.wd, gt.slot, gt.tbox_min, gt.tbox_max,
            ro, rd, tmax, tmin=0.0, any_hit=True, slab_rays=slab_rays,
        )
        return tri >= 0

    return closest, any_fn
