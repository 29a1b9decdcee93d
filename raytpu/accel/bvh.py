"""Software bounding-volume hierarchy for TPU traversal.

The reference leans on wgpu hardware acceleration structures (BLAS-per-object
+ TLAS, src/state.rs:1145-1246; traversal via WGSL ``ray_query``,
src/shader.wgsl:312-319). TPUs have no ray units, so this module owns that
subsystem in software:

* scene triangles are flattened to *world space* at pack time (one copy per
  object instance — the same memory behaviour as the reference, which builds
  one BLAS per mesh-bearing node rather than sharing BLASes, SURVEY.md §2.2);
* a binned-SAH BVH is built on the host over world-space triangle AABBs;
* the tree is emitted as a *threaded / stackless* flat layout (DFS order with
  skip links), so device traversal is a single ``lax.while_loop`` with one
  node gather per step and no per-ray stack;
* leaf triangles are reordered to be contiguous and padded to a fixed width
  ``leaf_size``, so a leaf visit is a dense, maskless gather of
  ``leaf_size`` triangles.

The layout is SoA numpy arrays; ``raytpu.scene.pack`` moves them to device.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

N_BINS = 16
LEAF_SIZE = 4  # triangles per (padded) leaf; fixed across builder and kernels


@dataclass
class BvhArrays:
    """Flat threaded BVH.

    Node ``i``'s first child (when interior) is ``i + 1`` (DFS order);
    ``miss[i]`` is the node to visit when the ray misses ``i``'s box or has
    finished ``i``'s leaf (-1 terminates traversal). Leaves reference
    ``leaf_size``-aligned consecutive entries of ``tri_order`` starting at
    ``leaf_first[i]``; padding entries are -1 (packed by the scene packer as
    degenerate triangles that can never be hit)."""

    bmin: np.ndarray  # [N,3] f32
    bmax: np.ndarray  # [N,3] f32
    miss: np.ndarray  # [N] i32
    leaf_first: np.ndarray  # [N] i32 (-1 for interior nodes)
    leaf_count: np.ndarray  # [N] i32 (0 for interior nodes)
    tri_order: np.ndarray  # [n_leaves * leaf_size] i32, -1 = padding
    leaf_size: int

    @property
    def n_nodes(self) -> int:
        return int(self.miss.shape[0])


def _sah_split(
    centroids: np.ndarray,
    tri_bmin: np.ndarray,
    tri_bmax: np.ndarray,
    ids: np.ndarray,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Binned SAH split of ``ids``: returns (left_ids, right_ids), or None
    when the centroids are degenerate on every axis."""
    n = ids.shape[0]
    c = centroids[ids]
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    extent = cmax - cmin
    for axis in np.argsort(-extent):
        if extent[axis] <= 0.0:
            continue
        scale = N_BINS * (1.0 - 1e-6) / extent[axis]
        bins = np.minimum(
            ((c[:, axis] - cmin[axis]) * scale).astype(np.int32), N_BINS - 1
        )
        counts = np.bincount(bins, minlength=N_BINS)
        binned_min = np.full((N_BINS, 3), np.inf, np.float32)
        binned_max = np.full((N_BINS, 3), -np.inf, np.float32)
        np.minimum.at(binned_min, bins, tri_bmin[ids])
        np.maximum.at(binned_max, bins, tri_bmax[ids])
        # sweep: SAH cost of splitting after bin k
        lmin = np.minimum.accumulate(binned_min, axis=0)
        lmax = np.maximum.accumulate(binned_max, axis=0)
        rmin = np.minimum.accumulate(binned_min[::-1], axis=0)[::-1]
        rmax = np.maximum.accumulate(binned_max[::-1], axis=0)[::-1]
        lcount = np.cumsum(counts)
        rcount = n - lcount

        def area(lo, hi):
            d = np.maximum(hi - lo, 0.0)
            return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

        cost = area(lmin, lmax)[:-1] * lcount[:-1] + area(rmin[1:], rmax[1:]) * (
            rcount[:-1]
        )
        cost = np.where((lcount[:-1] == 0) | (rcount[:-1] == 0), np.inf, cost)
        best = int(np.argmin(cost))
        if not np.isfinite(cost[best]):
            continue
        go_left = bins <= best
        return ids[go_left], ids[~go_left]
    return None


def build_bvh(
    tri_p0: np.ndarray,
    tri_e1: np.ndarray,
    tri_e2: np.ndarray,
    leaf_size: int = 4,
) -> BvhArrays:
    """Build a threaded binned-SAH BVH over triangles (p0, p0+e1, p0+e2)."""
    v0 = tri_p0
    v1 = tri_p0 + tri_e1
    v2 = tri_p0 + tri_e2
    tri_bmin = np.minimum(np.minimum(v0, v1), v2).astype(np.float32)
    tri_bmax = np.maximum(np.maximum(v0, v1), v2).astype(np.float32)
    centroids = ((tri_bmin + tri_bmax) * 0.5).astype(np.float32)
    n_tris = tri_p0.shape[0]

    if n_tris == 0:
        return BvhArrays(
            bmin=np.zeros((1, 3), np.float32),
            bmax=np.full((1, 3), -1.0, np.float32),  # inverted box: never hit
            miss=np.full(1, -1, np.int32),
            leaf_first=np.zeros(1, np.int32),
            leaf_count=np.zeros(1, np.int32),
            tri_order=np.full(leaf_size, -1, np.int32),
            leaf_size=leaf_size,
        )

    # --- pass 1: build tree records with an explicit work stack (the DFS
    # pre-order of the work stack IS the final flat node order) ---
    # record := [leaf_ids | None, left_rec, right_rec, bmin, bmax]
    records: list[list] = []

    def build_node(ids_root: np.ndarray) -> int:
        work = [(ids_root, None, None)]  # (ids, parent_rec, child_slot)
        root_rec = None
        while work:
            ids, parent, slot = work.pop()
            b_lo = tri_bmin[ids].min(axis=0)
            b_hi = tri_bmax[ids].max(axis=0)
            split = None
            if ids.shape[0] > leaf_size:
                split = _sah_split(centroids, tri_bmin, tri_bmax, ids)
                if split is None:
                    # degenerate centroids: median split to bound leaf size
                    half = ids.shape[0] // 2
                    split = (ids[:half], ids[half:])
            rec = len(records)
            if split is None:
                records.append([ids, -1, -1, b_lo, b_hi])
            else:
                records.append([None, -1, -1, b_lo, b_hi])
                work.append((split[1], rec, 2))
                work.append((split[0], rec, 1))
            if parent is None:
                root_rec = rec
            else:
                records[parent][slot] = rec
        return root_rec

    root = build_node(np.arange(n_tris, dtype=np.int64))

    # --- pass 2: thread the tree (DFS pre-order with miss links) ---
    n_nodes = len(records)
    bmin_arr = np.empty((n_nodes, 3), np.float32)
    bmax_arr = np.empty((n_nodes, 3), np.float32)
    miss_arr = np.empty(n_nodes, np.int32)
    leaf_first_arr = np.full(n_nodes, -1, np.int32)
    leaf_count_arr = np.zeros(n_nodes, np.int32)
    order: list[int] = []

    # First walk assigns flat indices; miss targets are record ids resolved
    # afterwards (a left child's miss is its right sibling's record).
    flat_of_rec: dict[int, int] = {}
    walk: list[tuple[int, int]] = [(root, -1)]  # (rec, miss_rec: -1 = exit)
    emitted: list[tuple[int, int]] = []
    while walk:
        rec, miss_rec = walk.pop()
        flat_of_rec[rec] = len(emitted)
        emitted.append((rec, miss_rec))
        ids, left, right, _, _ = records[rec]
        if ids is None:
            walk.append((right, miss_rec))
            walk.append((left, right))

    for idx, (rec, miss_rec) in enumerate(emitted):
        ids, left, right, b_lo, b_hi = records[rec]
        bmin_arr[idx] = b_lo
        bmax_arr[idx] = b_hi
        miss_arr[idx] = -1 if miss_rec == -1 else flat_of_rec[miss_rec]
        if ids is not None:
            leaf_first_arr[idx] = len(order)
            leaf_count_arr[idx] = ids.shape[0]
            order.extend(int(i) for i in ids)
            order.extend([-1] * ((-ids.shape[0]) % leaf_size))

    return BvhArrays(
        bmin=bmin_arr,
        bmax=bmax_arr,
        miss=miss_arr,
        leaf_first=leaf_first_arr,
        leaf_count=leaf_count_arr,
        tri_order=np.asarray(order, np.int32),
        leaf_size=leaf_size,
    )


def validate_bvh(bvh: BvhArrays, n_tris: int) -> None:
    """Structural sanity checks (used by tests)."""
    seen = bvh.tri_order[bvh.tri_order >= 0]
    assert seen.shape[0] == n_tris, "every triangle must appear exactly once"
    assert np.unique(seen).shape[0] == n_tris
    leaves = bvh.leaf_count > 0
    assert (bvh.leaf_first[leaves] >= 0).all()
    ends = bvh.leaf_first[leaves] + bvh.leaf_count[leaves]
    assert (ends <= bvh.tri_order.shape[0]).all()
    interior = ~leaves
    # interior miss links must skip past the whole subtree (strictly after
    # the first child), or terminate
    idx = np.arange(bvh.n_nodes)
    assert ((bvh.miss > idx) | (bvh.miss == -1)).all()
