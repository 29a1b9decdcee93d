"""Strand traversal: 8 independent 128-ray walkers per (8, 128) tile.

The resident packet kernel (intersect_pallas.py) walks the whole BVH once
per 4096-ray packet, so a packet of incoherent bounce rays pays for the
UNION of its lanes' node visits (~300x redundancy measured on the atrium
frame, docs/PROFILE_r2.md). Shrinking packets under XLA semantics did not
help because every vector op costs a full tile regardless of live lanes —
the fix is to make the tile itself carry INDEPENDENT traversals:

* each sublane row of the (8, 128) ray tile is one **strand** of 128
  coherence-sorted rays with its OWN stackless walker — per-strand visit
  unions replace the 4096-ray union (32x finer scheduling granularity);
* walkers traverse the octant-threaded tree (accel/strandtree.py):
  stackless skip-link walking whose near-first child order is baked into
  per-octant links, selected per strand by one scalar roll — the
  near-first ordering that the frame A/Bs showed is essential
  (docs/PROFILE_r2.md) without any per-visit ordering scalar work;
* walker state stays VECTORIZED: one (8, 1) node-pointer column, a
  lane-reduction for the hit-any bit, and a vector select for the next
  node — the per-visit scalar cost that dominated the packet kernel
  (8 full-tile ``jnp.any`` reductions + 56 box scalar extracts per pop)
  becomes ~8 scalar VMEM reads per step;
* leaf tests are BATCHED across walkers: the 8 walkers' pending leaf rows
  stack into one (8, 128) tile whose per-walker triangle data broadcasts
  from (8, 1) columns, so one dense Moller-Trumbore pass serves up to 8
  different leaf visits at full tile efficiency.

Results are bit-identical to the packet kernel / XLA walk / brute sweep:
same Moller-Trumbore op order, same closed/open range contract, same
lowest-slot tie break.

This kernel replaces the execution half of the GPU's hardware ray-query
scheduler (/root/reference/src/shader.wgsl:312-319, src/state.rs:129-133);
the octant-threaded layout replaces its traversal-order half.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import LEAF_SIZE

F32_MAX = 3.40282347e38
STRANDS = 8  # walkers per group = sublanes of one f32 tile
STRAND_RAYS = 128  # rays per strand = lanes
BLOCK = STRANDS * STRAND_RAYS


def _strand_kernel(
    tree_ref,  # [Rt, 128] VMEM — octant-threaded node rows
    leaf_ref,  # [Nl, 80] VMEM — shared leaf triangle rows
    rox_ref, roy_ref, roz_ref,  # (8G, 128) ray block
    rdx_ref, rdy_ref, rdz_ref,
    tmax_ref,  # (8G, 128); -inf disables a lane
    *refs,  # t, tri [, stats] outputs; then scratch: snode, sleaf,
    # cur, pend, obase, queue, qn
    tmin: float,
    any_hit: bool,
    with_stats: bool,
    walkers: int,
    skip_done: bool,
    multiroll: bool,
):
    if with_stats:
        (t_ref, tri_ref, stats_ref, snode_ref, sleaf_ref, cur_ref,
         pend_ref, obase_ref, queue_ref, qn_ref) = refs
    else:
        (t_ref, tri_ref, snode_ref, sleaf_ref, cur_ref, pend_ref,
         obase_ref, queue_ref, qn_ref) = refs
        stats_ref = None
    ROX = rox_ref[...]
    ROY = roy_ref[...]
    ROZ = roz_ref[...]
    RDX = rdx_ref[...]
    RDY = rdy_ref[...]
    RDZ = rdz_ref[...]
    TMAX = tmax_ref[...]
    TINY = 1e-36

    def _safe(d):
        return jnp.where(d == 0.0, jnp.where(1.0 / d < 0.0, -TINY, TINY), d)

    IDX = 1.0 / _safe(RDX)
    IDY = 1.0 / _safe(RDY)
    IDZ = 1.0 / _safe(RDZ)
    NEGX = IDX < 0.0
    NEGY = IDY < 0.0
    NEGZ = IDZ < 0.0

    # per-walker octant (strand rays share one; lane 0 is representative
    # because the engine sorts waves direction-octant-major)
    if multiroll:
        # vector copy for the batched per-row roll: (walkers, 1) i32
        OB = (
            (RDX[:, 0:1] < 0.0).astype(jnp.int32)
            + 2 * (RDY[:, 0:1] < 0.0).astype(jnp.int32)
            + 4 * (RDZ[:, 0:1] < 0.0).astype(jnp.int32)
        ) * 8
    else:
        for w in range(walkers):
            o = (
                (rdx_ref[w, 0] < 0.0).astype(jnp.int32)
                + 2 * (rdy_ref[w, 0] < 0.0).astype(jnp.int32)
                + 4 * (rdz_ref[w, 0] < 0.0).astype(jnp.int32)
            )
            obase_ref[w] = o * 8
    cur_ref[...] = jnp.zeros((walkers, 1), jnp.int32)
    qn_ref[...] = jnp.zeros((walkers, 1), jnp.int32)
    LANE = lax.broadcasted_iota(jnp.int32, (walkers, 128), 1)
    # leaf-queue overflow guard: a flush fires before an insert could push
    # lane 127 out (queues grow by <= 1 per step)
    QCAP = 120

    def leaf_phase(args):
        best_t, best_tri = args
        pend = pend_ref[...]
        for w in range(walkers):
            if skip_done:
                @pl.when(pend_ref[w, 0] >= 0)
                def _(w=w):
                    sleaf_ref[w : w + 1, 0 : leaf_ref.shape[1]] = leaf_ref[
                        pl.ds(pend_ref[w, 0], 1), :
                    ]
            else:
                lr = jnp.maximum(pend_ref[w, 0], 0)
                sleaf_ref[w : w + 1, 0 : leaf_ref.shape[1]] = leaf_ref[
                    pl.ds(lr, 1), :
                ]
        L = sleaf_ref[...]
        PM = pend >= 0  # (8,1) participation
        LR = jnp.maximum(pend, 0)
        for k in range(LEAF_SIZE):
            b = 10 * k
            p0x, p0y, p0z = L[:, b : b + 1], L[:, b + 1 : b + 2], L[:, b + 2 : b + 3]
            e1x, e1y, e1z = L[:, b + 3 : b + 4], L[:, b + 4 : b + 5], L[:, b + 5 : b + 6]
            e2x, e2y, e2z = L[:, b + 6 : b + 7], L[:, b + 7 : b + 8], L[:, b + 8 : b + 9]
            pvx = RDY * e2z - RDZ * e2y
            pvy = RDZ * e2x - RDX * e2z
            pvz = RDX * e2y - RDY * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = 1.0 / det
            tvx = ROX - p0x
            tvy = ROY - p0y
            tvz = ROZ - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            qx = tvy * e1z - tvz * e1y
            qy = tvz * e1x - tvx * e1z
            qz = tvx * e1y - tvy * e1x
            v = (RDX * qx + RDY * qy + RDZ * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            geo_ok = (
                (det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & PM
            )
            slot = LR * LEAF_SIZE + k  # (8,1) global triangle slot
            if any_hit:
                # closed range [tmin, tmax] like the hardware query
                ok = geo_ok & (t >= tmin) & (t <= best_t)
                best_tri = jnp.where(ok, slot, best_tri)
            else:
                # open far bound + lowest-slot tie break (cross-engine
                # bit-identical results regardless of visit order)
                ok = geo_ok & (t >= tmin) & (
                    (t < best_t) | ((t == best_t) & (slot < best_tri))
                )
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, slot, best_tri)
        return best_t, best_tri

    def body(state):
        if with_stats:
            alive, best_t, best_tri, n_steps, n_leafp = state
            n_steps = n_steps + 1
        else:
            alive, best_t, best_tri = state
            n_leafp = None
        # 1) fetch each walker's (node, octant) record: one dynamic row
        #    load + one dynamic roll lands box/links at lanes 0..7.
        #    The walkers' load->roll chains are mutually independent, so
        #    widening `walkers` (groups > 1) overlaps their latency — the
        #    fitted per-step cost is latency, not VPU throughput
        if multiroll:
            # batched roll: per-walker amounts are (c%2)*64 + octant*8 —
            # all multiples of 8 — so FOUR masked static rolls (8/16/32/
            # 64) rotate every walker's row at once, replacing `walkers`
            # serialized dynamic pltpu.roll ops with 8 full-tile vector
            # ops; the scalar loop keeps only the dynamic row load
            for w in range(walkers):
                c = jnp.maximum(cur_ref[w, 0], 0)
                snode_ref[w : w + 1, :] = tree_ref[pl.ds(c // 2, 1), :]
            cur = cur_ref[...]
            S = snode_ref[...]
            AMT = (jnp.maximum(cur, 0) & 1) * 64 + OB
            for b in (3, 4, 5, 6):
                # static left-rotate by 2^b == right-rotate by 128 - 2^b
                S = jnp.where(
                    (AMT & (1 << b)) != 0,
                    pltpu.roll(S, 128 - (1 << b), 1), S,
                )
        else:
            for w in range(walkers):
                if skip_done:
                    # drain-tail diet: finished walkers (cur < 0) skip
                    # the fetch+roll entirely — their stale snode row is
                    # fully masked by ACT below. The sim puts wasted tail
                    # loads at ~(max-mean)/max ~= 35% of a block's fetch
                    # work. (MEASURED 4x WORSE: per-walker pl.when
                    # serializes Mosaic's load pipeline, PROFILE_r3.)
                    @pl.when(cur_ref[w, 0] >= 0)
                    def _(w=w):
                        c = cur_ref[w, 0]
                        row = tree_ref[pl.ds(c // 2, 1), :]
                        amt = (c % 2) * 64 + obase_ref[w]
                        snode_ref[w : w + 1, :] = pltpu.roll(row, -amt, 1)
                else:
                    c = jnp.maximum(cur_ref[w, 0], 0)
                    row = tree_ref[pl.ds(c // 2, 1), :]
                    amt = (c % 2) * 64 + obase_ref[w]
                    snode_ref[w : w + 1, :] = pltpu.roll(row, -amt, 1)
            S = snode_ref[...]
            cur = cur_ref[...]
        ACT = cur >= 0
        HITL = S[:, 6:7].astype(jnp.int32)  # value-cast links
        MISSL = S[:, 7:8].astype(jnp.int32)
        if any_hit:
            # lanes already blocked stop participating; walkers whose live
            # lanes are all blocked terminate outright
            LIMIT = jnp.where(best_tri >= 0, -jnp.inf, TMAX)
            all_done = jnp.all(
                (best_tri >= 0) | (TMAX < 0.0), axis=1, keepdims=True
            )
            ACT = ACT & jnp.logical_not(all_done)
        else:
            LIMIT = best_t
        # 2) slab test: per-walker box broadcast from (8,1) columns
        lox = (jnp.where(NEGX, S[:, 3:4], S[:, 0:1]) - ROX) * IDX
        hix = (jnp.where(NEGX, S[:, 0:1], S[:, 3:4]) - ROX) * IDX
        loy = (jnp.where(NEGY, S[:, 4:5], S[:, 1:2]) - ROY) * IDY
        hiy = (jnp.where(NEGY, S[:, 1:2], S[:, 4:5]) - ROY) * IDY
        loz = (jnp.where(NEGZ, S[:, 5:6], S[:, 2:3]) - ROZ) * IDZ
        hiz = (jnp.where(NEGZ, S[:, 2:3], S[:, 5:6]) - ROZ) * IDZ
        near = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, tmin))
        far = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, LIMIT))
        HIT = near <= far
        hit_any = jnp.any(HIT, axis=1, keepdims=True) & ACT  # (8,1)
        IS_LEAF = HITL < 0
        # 3) advance walkers (vector select, no per-walker branches)
        pend = jnp.where(hit_any & IS_LEAF, ~HITL, -1)
        nxt = jnp.where(hit_any & jnp.logical_not(IS_LEAF), HITL, MISSL)
        nxt = jnp.where(ACT, nxt, jnp.int32(-1))
        cur_ref[...] = nxt
        # 4) enqueue leaf visits (LIFO insert at lane 0 via a static
        #    roll): the MT pass is DEFERRED until (almost) every walker
        #    has one queued, so each flush runs at full walker occupancy
        #    instead of serving whichever 1-2 walkers pend this step.
        #    Deferral only delays best_t shrink / any-hit blocking —
        #    the final committed set is unchanged (lowest-slot ties).
        enq = pend >= 0
        q = queue_ref[...]
        q = jnp.where(enq, pltpu.roll(q, 1, 1), q)
        queue_ref[...] = jnp.where(enq & (LANE == 0), pend, q)
        qn = qn_ref[...] + enq.astype(jnp.int32)
        qn_ref[...] = qn
        # 5) flush when every walker is finished-or-queued (done walkers
        #    count as ready, so the tail drains), or on overflow risk
        ready = (qn > 0) | (nxt < 0)
        do_leaf = (jnp.all(ready) & jnp.any(qn > 0)) | (
            jnp.max(qn) >= QCAP
        )

        def flush(args):
            qf = queue_ref[...]
            qnf = qn_ref[...]
            popped = qnf > 0
            pend_ref[...] = jnp.where(popped, qf[:, 0:1], -1)
            # cyclic roll by 127 == shift left by one lane (pop)
            queue_ref[...] = jnp.where(popped, pltpu.roll(qf, 127, 1), qf)
            qn_ref[...] = qnf - popped.astype(jnp.int32)
            return leaf_phase(args)

        best_t, best_tri = lax.cond(
            do_leaf, flush, lambda a: a, (best_t, best_tri)
        )
        # keep looping while any walker walks OR any queue holds work
        queued = jnp.max(qn_ref[...])
        alive = jnp.maximum(
            jnp.max(nxt), jnp.where(queued > 0, 0, -1)
        )
        if with_stats:
            n_leafp = n_leafp + do_leaf.astype(jnp.int32)
            return alive, best_t, best_tri, n_steps, n_leafp
        return alive, best_t, best_tri

    def cond(state):
        return state[0] >= 0

    if any_hit:
        best0 = TMAX  # compare against the per-ray max directly
    else:
        best0 = jnp.minimum(jnp.full((walkers, 128), F32_MAX), TMAX)
    tri0 = jnp.full((walkers, 128), -1, jnp.int32)
    if with_stats:
        _, best_t, best_tri, n_steps, n_leafp = lax.while_loop(
            cond, body,
            (jnp.int32(0), best0, tri0, jnp.int32(0), jnp.int32(0)),
        )
        lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        stats_ref[...] = jnp.where(lane == 1, n_leafp, n_steps)
    else:
        _, best_t, best_tri = lax.while_loop(
            cond, body, (jnp.int32(0), best0, tri0)
        )
    t_ref[...] = best_t
    tri_ref[...] = best_tri


@functools.partial(
    jax.jit,
    static_argnames=("tmin", "any_hit", "interpret", "with_stats",
                     "groups"),
)
def strand_query(
    tree_rows,
    leaf_tris,
    rox, roy, roz,
    rdx, rdy, rdz,
    tmax,
    tmin: float = 0.001,
    any_hit: bool = False,
    interpret: bool = False,
    with_stats: bool = False,
    groups: int = 4,
):
    """Trace R rays (coherence-sorted; consecutive 128 = one strand)
    through the octant-threaded tree. Returns (t, tri) like packet_query:
    t = committed distance (F32_MAX/tmax when none), tri = global
    triangle slot or -1; any_hit uses the closed range [tmin, tmax],
    closest-hit the open bound. Dead lanes carry tmax = -inf.

    ``groups`` interleaves 8*groups independent walkers per grid block:
    the walkers' dynamic node fetches overlap, hiding the per-step
    latency that dominates a lone 8-walker block (fitted ~580ns/step vs
    ~25ns of VPU work, benchmarks/waves.py ab). Results are identical
    for any value; it only changes scheduling granularity.

    With ``with_stats`` also returns an int32 [n_blocks, 128] array: per
    (1024*groups)-ray block, lane 1 = leaf-phase count, other lanes =
    step count.
    """
    walkers = STRANDS * groups
    block = walkers * STRAND_RAYS
    r = rox.shape[0]
    r_pad = -(-r // block) * block
    if r_pad != r:
        def padr(a, fill):
            return jnp.concatenate(
                [a, jnp.full((r_pad - r,), fill, a.dtype)]
            )

        rox, roy, roz = padr(rox, 0.0), padr(roy, 0.0), padr(roz, 0.0)
        rdx, rdy, rdz = padr(rdx, 1.0), padr(rdy, 1.0), padr(rdz, 1.0)
        tmax = padr(jnp.broadcast_to(tmax, (r,)), -jnp.inf)
    n_blocks = r_pad // block

    def to2d(a):
        return a.reshape(r_pad // 128, 128)

    rspec = pl.BlockSpec((walkers, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    import os

    kernel = functools.partial(
        _strand_kernel, tmin=tmin, any_hit=any_hit, with_stats=with_stats,
        walkers=walkers,
        skip_done=bool(os.environ.get("RAYTPU_STRAND_SKIP_DONE")),
        # measured default: the batched 4-roll fetch is FLAT on captured
        # waves and -1% on the headline frame (1034.7 vs 1024.1 ms) —
        # per-step cost is load-bound, not roll-bound (PROFILE_r3)
        multiroll=os.environ.get("RAYTPU_STRAND_MULTIROLL", "0") != "0",
    )
    out_specs = [rspec, rspec]
    out_shape = [
        jax.ShapeDtypeStruct((r_pad // 128, 128), jnp.float32),
        jax.ShapeDtypeStruct((r_pad // 128, 128), jnp.int32),
    ]
    if with_stats:
        # stats rides as the third output; pallas passes refs in
        # (outputs..., scratch...) order, which already matches the
        # kernel's with_stats unpacking — no rewrapping needed
        # Mosaic needs >= (8, 128) blocks: emit a full tile per block
        # (all 8 rows identical) and slice row 0 on the host
        out_specs.append(
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((n_blocks * 8, 128), jnp.int32)
        )
    out = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(tree_rows.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(leaf_tris.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        + [rspec] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((walkers, 128), jnp.float32),
            pltpu.VMEM((walkers, 128), jnp.float32),
            pltpu.VMEM((walkers, 1), jnp.int32),
            pltpu.VMEM((walkers, 1), jnp.int32),
            pltpu.SMEM((walkers,), jnp.int32),
            pltpu.VMEM((walkers, 128), jnp.int32),  # leaf queue
            pltpu.VMEM((walkers, 1), jnp.int32),  # queue depth
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(tree_rows, leaf_tris, *(to2d(a) for a in (rox, roy, roz)),
      *(to2d(a) for a in (rdx, rdy, rdz)),
      to2d(jnp.broadcast_to(tmax, (r_pad,))))
    t = out[0].reshape(r_pad)[:r]
    tri = out[1].reshape(r_pad)[:r]
    if with_stats:
        return t, tri, out[2].reshape(n_blocks, 8, 128)[:, 0, :]
    return t, tri


STRAND_VMEM_BUDGET = 100 * 1024 * 1024


def _hbm_tables(tree, leaves):
    """(tree, leaves, tree_any): decide the beyond-VMEM route. When the
    strand tree + leaf rows exceed the persistent kernel's VMEM budget
    the tables stay in HBM and the kernel fetches rows via overlapped
    async copies (tree_any) — same traversal, bit-identical results.
    RAYTPU_STRAND_HBM=1/0 forces either way (A/B). HBM leaf rows are
    padded to the DMA-friendly 128-lane width here, once."""
    import os

    env = os.environ.get("RAYTPU_STRAND_HBM")
    tree_any = (
        (tree.size + leaves.size) * 4 > STRAND_VMEM_BUDGET
        if env is None
        else env != "0"
    )
    if tree_any and leaves.shape[1] < 128:
        leaves = jnp.pad(
            leaves, ((0, 0), (0, 128 - leaves.shape[1]))
        )
    return tree, leaves, tree_any


def make_strand_intersectors(pack, tmin: float = 0.001,
                             interpret: bool = False,
                             groups: int | None = None):
    """(closest_fn, any_fn) with the engine's (ro, rd, tmin, tmax)
    signature, traversing the octant-threaded strand layout. The engine
    routes coherence-sorted BOUNCE waves here (strand beats the packet
    kernel 2.4-3.1x on every captured bounce wave, benchmarks/waves.py
    ab) and keeps the packet kernel for primary/first-shadow waves.

    Like make_packet_intersectors, ``tmin`` binds at factory time
    (closest = 0.001, any-hit = 0.0 per src/shader.wgsl:174-186,312-319);
    the per-call tmin_ argument is checked against the baked value and
    raises on mismatch (VERDICT r3 item 6).

    ``groups`` defaults to 16 (the round-3 sweep winner on captured
    atrium bounce waves); RAYTPU_STRAND_GROUPS overrides for sweeps."""
    import os

    from .intersect import Hit
    from .intersect_pallas import check_baked_tmin

    if groups is None:
        groups = int(os.environ.get("RAYTPU_STRAND_GROUPS", "16"))

    tree, leaves, tree_any = _hbm_tables(
        pack.bvh.strand_rows, pack.bvh.leaf_tris
    )
    # The persistent-refill kernel (kernels/strand_persistent.py) is the
    # default: same math bit-for-bit, walkers refill from an on-device
    # strand queue instead of paying each block's slowest strand (the
    # 2.7-4.3x drain tail). Measured on captured atrium bounce waves
    # (benchmarks/waves.py ab, TPU v5e): 13.2/17.8/40.5/30.1 Mrays/s on
    # b1c/b2c/b2s/b3c vs 4.8/7.1/14.3/13.2 for the block kernel —
    # 2.3-2.8x everywhere. RAYTPU_STRAND_PERSISTENT=0 restores the block
    # kernel for A/Bs.
    persistent = os.environ.get("RAYTPU_STRAND_PERSISTENT", "1") != "0"
    if tree_any:
        # HBM tables exist only on the persistent kernel's pipelined
        # strand layout (the block kernel block-slices its tree to VMEM)
        persistent = True
    # all knobs bind at factory time (consistent toggle semantics:
    # changing the env after the factory has run has no effect)
    walkers_n = int(os.environ.get("RAYTPU_STRAND_WALKERS", "128"))
    service_k = int(os.environ.get("RAYTPU_STRAND_SERVICE_K", "16"))
    # flush occupancy 0.5 (r5 frame A/B: 564.5 -> 539.4 ms headline at
    # 0.5 vs the r3 default 0.75; 0.375 gives ground back — earlier
    # drains shrink best-t sooner and the saved walk steps beat the
    # extra MT passes, docs/PROFILE_r5.md queue 2/4)
    flush_occ = float(os.environ.get("RAYTPU_STRAND_FLUSH", "0.5"))
    # pipelined node fetch: measured win on deep-tree captured waves
    # (b1c 18.6 -> 17.7 ms, b2c 14.4 -> 13.5, headline frame part of the
    # 675 ms best combo — docs/PROFILE_r4.md); unmeasured on tiny trees
    # whose walks are a few steps, so default on only for big scenes.
    pipe = os.environ.get(
        "RAYTPU_STRAND_PIPE",
        "1" if pack.n_triangles >= 4096 else "0",
    ) != "0" or tree_any  # tree_any requires the pipelined fetch shape
    # check-every-K unroll (strand_persistent docstring): K walk steps
    # per flush/service decision. step_bench: the decision logic costs
    # ~470 cycles/iter — as much as the advance body — so K amortizes
    # it. Frame-measured (r4_queue4, docs/PROFILE_r4.md): K=4 is the
    # winner (673.5 -> 653.4 ms solo; 588.0 -> 564.8 under fused wave
    # mode), K=8 gives some back — default 4 wherever pipe is on (same
    # >= 4096-tri gate; unroll without pipe is unmeasured).
    unroll = int(os.environ.get("RAYTPU_STRAND_UNROLL", "4"))
    if not pipe:
        unroll = 1
    # control cadence + multi-pop flush (strand_persistent docstring):
    # the flush/service decision block runs every ctl_every body
    # iterations and each flush pops up to flush_pop heads per walker.
    # Enqueues are gated on queue headroom (walkers stall in place at
    # QCAP), so any (unroll, ctl_every) combination is overflow-safe.
    ctl_every = int(os.environ.get("RAYTPU_STRAND_CTL", "1"))
    flush_pop = int(os.environ.get("RAYTPU_STRAND_POP", "1"))
    # dual interleave (strand_persistent docstring): two walker
    # half-pools alternate so each half's serialized scalar fetch
    # overlaps the other half's vector advance
    dual = os.environ.get("RAYTPU_STRAND_DUAL", "0") != "0" and pipe
    # ribbon layout: RAYTPU_RIBBON=K (sub-steps per fetched row, 1..8)
    # walks the per-octant pre-order renumbered tree — persistent kernel
    # only; 0 restores the octant-threaded strand layout
    ribbon_k = int(os.environ.get("RAYTPU_RIBBON", "0"))
    use_ribbon = (
        ribbon_k > 0 and persistent and not tree_any
        and getattr(pack.bvh, "ribbon_rows", None) is not None
    )
    if use_ribbon:
        tree = pack.bvh.ribbon_rows
        unroll = 1  # ribbon sub-steps already batch the walk
    ribbon_rpo = tree.shape[0] // 8 if use_ribbon else 0

    def query(ro, rd, tmax_r, tmin_q, any_q):
        if persistent:
            from .strand_persistent import strand_query_persistent

            return strand_query_persistent(
                tree, leaves,
                ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2],
                tmax_r, tmin=tmin_q, any_hit=any_q, interpret=interpret,
                walkers=walkers_n,
                service_k=service_k,
                flush_occ=flush_occ,
                pipe=pipe,
                ribbon_rpo=ribbon_rpo,
                ribbon_k=ribbon_k if use_ribbon else 4,
                unroll=unroll,
                ctl_every=ctl_every,
                flush_pop=flush_pop,
                tree_any=tree_any,
                dual=dual and not use_ribbon,
            )
        return strand_query(
            tree, leaves,
            ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2],
            tmax_r, tmin=tmin_q, any_hit=any_q, interpret=interpret,
            groups=groups,
        )

    def closest(ro, rd, tmin_, tmax):
        check_baked_tmin(tmin_, tmin, "strand closest")
        r = ro.shape[0]
        tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        t, tri = query(ro, rd, tmax_r, tmin, False)
        return Hit(t=t, tri=tri, valid=tri >= 0)

    def any_fn(ro, rd, tmin_, tmax):
        check_baked_tmin(tmin_, 0.0, "strand any-hit")
        r = ro.shape[0]
        tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        _, tri = query(ro, rd, tmax_r, 0.0, True)
        return tri >= 0

    return closest, any_fn


def make_strand_mixed_query(pack, interpret: bool = False):
    """Deferred-NEE mixed query on the persistent strand kernel: ONE
    launch serves bounce b's shadow wave and bounce b+1's continuation
    wave after one shared coherence sort (engine _mixed_bounce_query) —
    per-LANE any-hit flags replace the two per-bounce sorted queries.
    Contract matches kernels/binned.py make_binned_query:
    (ro, rd, tmax, smask, *, tmin, shadow_tmin) -> (t [R], tri [R])."""
    import os

    from .strand_persistent import strand_query_persistent

    tree, leaves, tree_any = _hbm_tables(
        pack.bvh.strand_rows, pack.bvh.leaf_tris
    )
    walkers = int(os.environ.get("RAYTPU_STRAND_WALKERS", "128"))
    service_k = int(os.environ.get("RAYTPU_STRAND_SERVICE_K", "16"))
    # flush occupancy 0.5 (r5 frame A/B: 564.5 -> 539.4 ms headline at
    # 0.5 vs the r3 default 0.75; 0.375 gives ground back — earlier
    # drains shrink best-t sooner and the saved walk steps beat the
    # extra MT passes, docs/PROFILE_r5.md queue 2/4)
    flush_occ = float(os.environ.get("RAYTPU_STRAND_FLUSH", "0.5"))
    # bound at factory time like every other knob (ADVICE r3); same
    # size-gated default as make_strand_intersectors
    pipe = os.environ.get(
        "RAYTPU_STRAND_PIPE",
        "1" if pack.n_triangles >= 4096 else "0",
    ) != "0" or tree_any
    unroll = int(os.environ.get("RAYTPU_STRAND_UNROLL", "4"))
    if not pipe:
        unroll = 1
    ctl_every = int(os.environ.get("RAYTPU_STRAND_CTL", "1"))
    flush_pop = int(os.environ.get("RAYTPU_STRAND_POP", "1"))
    dual = os.environ.get("RAYTPU_STRAND_DUAL", "0") != "0" and pipe
    ribbon_k = int(os.environ.get("RAYTPU_RIBBON", "0"))
    use_ribbon = (
        ribbon_k > 0 and not tree_any
        and getattr(pack.bvh, "ribbon_rows", None) is not None
    )
    if use_ribbon:
        tree = pack.bvh.ribbon_rows
        unroll = 1
    ribbon_rpo = tree.shape[0] // 8 if use_ribbon else 0

    def query(ro, rd, tmax, smask, *, tmin: float, shadow_tmin: float):
        return strand_query_persistent(
            tree, leaves,
            ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2],
            tmax, tmin=tmin, interpret=interpret,
            walkers=walkers, service_k=service_k, flush_occ=flush_occ,
            smask=smask, mixed=True, shadow_tmin=shadow_tmin,
            pipe=pipe,
            ribbon_rpo=ribbon_rpo,
            ribbon_k=ribbon_k if use_ribbon else 4,
            unroll=unroll,
            ctl_every=ctl_every,
            flush_pop=flush_pop,
            tree_any=tree_any,
            dual=dual and not use_ribbon,
        )

    return query
