"""Pallas TPU packet traversal over the 8-wide BVH.

The TPU-native answer to the reference's hardware ray queries
(src/shader.wgsl:312-319): XLA's dynamic gathers move ~2% of HBM bandwidth,
so per-ray node fetches can never reach the north-star ray rate. Instead,
this kernel amortises *scalar* node fetches across a coherent **packet** of
``packet`` rays (default 4096) held in VMEM ([packet//128, 128] vector
tiles), with the whole BVH resident in VMEM:

* the scene's 8-wide BVH (accel/bvh.py) packs each node's 8 children into
  one 128-lane row — dynamic indexing stays on the sublane dimension, which
  is the only dynamic indexing Mosaic supports;
* traversal is one scalar stack walk per packet: pop a node, slab-test all
  8 children against the whole packet (pure VPU), push children any ray
  hits; leaf children run a dense unrolled Möller–Trumbore over their 8
  triangles;
* rays enter in 32x32-pixel block order (the engine permutes the tile), so
  primary and shadow packets share most of their traversal path; bounce
  packets are coherence-sorted by the engine (direction-octant major,
  origin-morton minor — the best of the swept keys, docs/PROFILE_r2.md);
* ray blocks arrive pre-shaped as [rows, 128] tiles (native layout, no
  in-kernel reshape); children are visited near-first (packet-
  representative ordering) by default — the ``ordered`` flag selects a
  cheaper fused storage-order pass, which wins on synthetic ray sets but
  loses on real engine waves (docs/PROFILE_r2.md). The lowest-slot tie
  break makes results identical either way.

Closest-hit and any-hit (shadow) variants share the kernel body; any-hit
carries a blocked mask and stops a packet as soon as every live lane is
blocked. ``mixed=True`` additionally traces closest-hit and shadow lanes
in ONE packet (per-lane mode from ``smask``) — the engine's deferred-NEE
path fuses each bounce's shadow query into the next bounce's continuation
traversal, which shares nearly the same node set.

``with_stats=True`` additionally returns per-packet traversal counters
(node pops, leaf-row tests) — the occupancy diagnostic behind the packet
size / sort-key tuning (benchmarks/profile_atrium.py).

Measured on TPU v5e (vs the XLA while_loop path, bit-equal results):
~17x faster on a 27k-triangle scene at 131k coherent rays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BVH8_WIDTH, LEAF_SIZE

import os as _os

# default rays per packet ([PACKET//128, 128] vector tiles); the env
# override exists for packet-size sweeps (4096 beat 1024/2048; see
# docs/PROFILE_r2.md)
PACKET = int(_os.environ.get("RAYTPU_PACKET", 4096))
PACKETS_PER_BLOCK = 16  # packets per grid step: amortises the per-step
# scene-window fetch (~50us) across the block's packet walks
F32_MAX = 3.40282347e38
# Worst-case stack: <= BVH8_WIDTH pushes per level x wide-tree depth, so a
# depth-d BVH8 needs at most 8*d + 1 slots. scene/pack.py asserts the built
# tree's actual depth fits (8*depth + 8 <= STACK_DEPTH) at pack time, and
# the kernel clamps pushes as a last-resort corruption guard.
STACK_DEPTH = 512


def _packet_kernel(
    nodes_ref,  # [N8, 128] VMEM
    leaf_ref,  # [Nl, 80] VMEM
    rox_ref, roy_ref, roz_ref,  # [PPB, packet] VMEM
    rdx_ref, rdy_ref, rdz_ref,  # [PPB, packet] VMEM
    tmax_ref,  # [PPB, packet] VMEM (per-ray far; <= tmin disables the lane)
    *refs,  # [smask if mixed], outputs t/tri [PPB, packet]
    # (+ stats [PPB, 128]), then scratch
    packet: int,
    tmin: float,
    any_hit: bool,
    with_stats: bool,
    mixed: bool,
    shadow_tmin: float,
    ordered: bool,
):
    if mixed:
        smask_ref, refs = refs[0], refs[1:]
    else:
        smask_ref = None
    if with_stats:
        t_ref, tri_ref, stats_ref, stack_ref = refs
    else:
        t_ref, tri_ref, stack_ref = refs
        stats_ref = None
    n_packets = rox_ref.shape[0] // (packet // 128)

    def run_packet(pk, _):
        _one_packet(
            nodes_ref, leaf_ref,
            rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
            tmax_ref, smask_ref, t_ref, tri_ref, stats_ref, stack_ref, pk,
            packet=packet, tmin=tmin, any_hit=any_hit, mixed=mixed,
            shadow_tmin=shadow_tmin, ordered=ordered,
        )
        return 0

    lax.fori_loop(0, n_packets, run_packet, 0)


def _one_packet(
    nodes_ref, leaf_ref,
    rox_ref, roy_ref, roz_ref, rdx_ref, rdy_ref, rdz_ref,
    tmax_ref, smask_ref, t_ref, tri_ref, stats_ref, stack_ref, pk,
    *, packet: int, tmin: float, any_hit: bool, mixed: bool,
    shadow_tmin: float, ordered: bool,
):
    rows = packet // 128
    base = pk * rows
    ROX = rox_ref[pl.ds(base, rows), :]
    ROY = roy_ref[pl.ds(base, rows), :]
    ROZ = roz_ref[pl.ds(base, rows), :]
    RDX = rdx_ref[pl.ds(base, rows), :]
    RDY = rdy_ref[pl.ds(base, rows), :]
    RDZ = rdz_ref[pl.ds(base, rows), :]
    TMAX = tmax_ref[pl.ds(base, rows), :]
    # clamp exactly-zero direction components to +/-tiny: 0*inf NaNs can
    # then never appear in the slab test, so its per-axis NaN guards go
    # away (box accept/reject is unchanged: the substituted +/-1e36-scale
    # interval bounds resolve every comparison the same way for tmin >= 0)
    TINY = 1e-36

    def _safe(d):
        return jnp.where(
            d == 0.0, jnp.where(1.0 / d < 0.0, -TINY, TINY), d
        )

    IDX = 1.0 / _safe(RDX)
    IDY = 1.0 / _safe(RDY)
    IDZ = 1.0 / _safe(RDZ)
    if mixed:
        # mixed packets carry closest-hit lanes (open far bound) and shadow
        # lanes (closed range [shadow_tmin, tmax], any-hit semantics) in
        # one traversal; smask flags the shadow lanes, dead lanes are
        # tmax = -inf as everywhere else
        SHAD = smask_ref[pl.ds(base, rows), :] == 1.0
        # per-lane near cutoff: closest lanes use `tmin`, shadow lanes
        # `shadow_tmin` (the reference shoots shadow rays from t = 0,
        # src/shader.wgsl:174-186)
        TCUT = jnp.where(SHAD, shadow_tmin, tmin)
        slab_tmin = min(tmin, shadow_tmin)
    else:
        SHAD = None
        TCUT = None
        slab_tmin = tmin
    NEGX = IDX < 0.0
    NEGY = IDY < 0.0
    NEGZ = IDZ < 0.0
    if ordered:
        # representative ray (rays arrive coherence-sorted, so ray 0
        # stands in for the packet) for near-first child ordering
        MOX = rox_ref[base, 0]
        MOY = roy_ref[base, 0]
        MOZ = roz_ref[base, 0]
        MDX = rdx_ref[base, 0]
        MDY = rdy_ref[base, 0]
        MDZ = rdz_ref[base, 0]

    def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, limit):
        """Direction-sign slab test. Deliberately does NOT order-normalise
        the per-axis intervals, so inverted boxes (bmin > bmax — the
        builder's empty-slot sentinel) miss every ray."""
        lox = (jnp.where(NEGX, bmaxx, bminx) - ROX) * IDX
        hix = (jnp.where(NEGX, bminx, bmaxx) - ROX) * IDX
        loy = (jnp.where(NEGY, bmaxy, bminy) - ROY) * IDY
        hiy = (jnp.where(NEGY, bminy, bmaxy) - ROY) * IDY
        loz = (jnp.where(NEGZ, bmaxz, bminz) - ROZ) * IDZ
        hiz = (jnp.where(NEGZ, bminz, bmaxz) - ROZ) * IDZ
        near = jnp.maximum(jnp.maximum(lox, loy), jnp.maximum(loz, slab_tmin))
        far = jnp.minimum(jnp.minimum(hix, hiy), jnp.minimum(hiz, limit))
        return near <= far

    def leaf_test(leaf_row, best_t, best_tri):
        lrow = leaf_ref[leaf_row]
        for k in range(LEAF_SIZE):  # static unroll (no dynamic_slice on TPU)
            b = k * 10
            p0x, p0y, p0z = lrow[b + 0], lrow[b + 1], lrow[b + 2]
            e1x, e1y, e1z = lrow[b + 3], lrow[b + 4], lrow[b + 5]
            e2x, e2y, e2z = lrow[b + 6], lrow[b + 7], lrow[b + 8]
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
                (det != 0.0)
                & (u >= 0.0)
                & (v >= 0.0)
                & (u + v <= 1.0)
            )
            # closest-hit ties (t == best_t — shared mesh edges produce
            # them) break to the LOWEST global triangle slot, which is
            # what the XLA threaded walk (DFS = increasing slot) and the
            # brute-force argmin already do — cross-engine results stay
            # bit-identical regardless of this kernel's near-first visit
            # order. slot is a scalar, so the extra compare is cheap.
            slot = leaf_row * LEAF_SIZE + k
            if mixed:
                # closest lanes: open far bound; shadow lanes: closed
                # range [shadow_tmin, tmax] like the hardware query
                # (pure i1 logic — where() over bools does not lower)
                ok = geo_ok & (t >= TCUT) & (
                    (t < best_t)
                    | ((t == best_t) & (SHAD | (slot < best_tri)))
                )
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, slot, best_tri)
            elif any_hit:
                # closed range [tmin, tmax] like the hardware query
                ok = geo_ok & (t >= tmin) & (t <= best_t)
                best_tri = jnp.where(ok, slot, best_tri)
            else:
                ok = geo_ok & (t >= tmin) & (
                    (t < best_t) | ((t == best_t) & (slot < best_tri))
                )
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, slot, best_tri)
        return best_t, best_tri

    live = TMAX >= 0.0  # engine disables dead lanes with tmax = -inf

    def cond(state):
        sp = state[0]
        more = sp > 0
        if any_hit:
            best_tri = state[2]
            # stop once every live lane is blocked
            more = more & jnp.logical_not(jnp.all((best_tri >= 0) | ~live))
        return more

    def body(state):
        if stats_ref is not None:
            sp, best_t, best_tri, n_pops, n_leafs = state
            n_pops = n_pops + 1
        else:
            sp, best_t, best_tri = state
            n_leafs = None
        sp = sp - 1
        node = stack_ref[sp]
        nrow = nodes_ref[node]
        if mixed:
            # shadow lanes stop participating in box tests once blocked;
            # closest lanes keep shrinking their limit
            limit = jnp.where(SHAD & (best_tri >= 0), -jnp.inf, best_t)
        elif any_hit:
            # lanes already blocked stop participating in box tests
            limit = jnp.where(best_tri >= 0, -jnp.inf, TMAX)
        else:
            limit = best_t
        if not ordered:
            # ONE fused pass in storage order: slab-test each child, then
            # push/leaf-test it immediately. For CLOSEST-hit walks the
            # near-first ordering's per-visit scalar work (centroid
            # extracts, pivot, 16 bucketed cond sites) costs more than
            # its earlier best-t shrink saves: bounce waves 2.28 -> 3.36
            # Mrays/s, primary 16.8 -> 22.7 (docs/PROFILE_r2.md). Results
            # are order-independent thanks to the lowest-slot tie break.
            for k in range(BVH8_WIDTH):
                c = 16 * k
                link = lax.bitcast_convert_type(
                    nrow[c + 6 : c + 7], jnp.int32
                )[0]
                hit = slab(
                    nrow[c + 0], nrow[c + 1], nrow[c + 2],
                    nrow[c + 3], nrow[c + 4], nrow[c + 5],
                    limit,
                )
                any_k = jnp.any(hit)
                is_leaf = link < 0
                push = any_k & jnp.logical_not(is_leaf)
                # clamp guards SMEM against overflow on adversarial trees
                # (pack.py asserts the depth bound, so this never fires
                # for built scenes; an overflowing push drops a subtree
                # rather than corrupting the stack)
                slot = jnp.minimum(sp, STACK_DEPTH - 1)

                @pl.when(push)
                def _():
                    stack_ref[slot] = link

                sp = jnp.minimum(
                    sp + push.astype(jnp.int32), STACK_DEPTH - 1
                )
                do_leaf = any_k & is_leaf
                best_t, best_tri = lax.cond(
                    do_leaf,
                    lambda bt, bi, link=link: leaf_test(~link, bt, bi),
                    lambda bt, bi: (bt, bi),
                    best_t, best_tri,
                )
                if n_leafs is not None:
                    n_leafs = n_leafs + do_leaf.astype(jnp.int32)
            if stats_ref is not None:
                return sp, best_t, best_tri, n_pops, n_leafs
            return sp, best_t, best_tri

        # ordered (near-first) walk — ANY-HIT queries keep it: finding a
        # blocker early kills lanes (limit -> -inf) and whole packets,
        # which outweighs the ordering's scalar cost for shadow waves
        links, anys, leafs, prios = [], [], [], []
        for k in range(BVH8_WIDTH):
            c = 16 * k
            link = lax.bitcast_convert_type(
                nrow[c + 6 : c + 7], jnp.int32
            )[0]
            hit = slab(
                nrow[c + 0], nrow[c + 1], nrow[c + 2],
                nrow[c + 3], nrow[c + 4], nrow[c + 5],
                limit,
            )
            cx = (nrow[c + 0] + nrow[c + 3]) * 0.5
            cy = (nrow[c + 1] + nrow[c + 4]) * 0.5
            cz = (nrow[c + 2] + nrow[c + 5]) * 0.5
            prio = (cx - MOX) * MDX + (cy - MOY) * MDY + (cz - MOZ) * MDZ
            links.append(link)
            anys.append(jnp.any(hit))
            leafs.append(link < 0)
            prios.append(prio)

        lo = prios[0]
        hi = prios[0]
        for k in range(1, BVH8_WIDTH):
            lo = jnp.minimum(lo, prios[k])
            hi = jnp.maximum(hi, prios[k])
        pivot = (lo + hi) * 0.5

        # push far interior children first (near popped first)
        for far in (True, False):
            for k in range(BVH8_WIDTH):
                in_bucket = (prios[k] > pivot) if far else (prios[k] <= pivot)
                push = anys[k] & jnp.logical_not(leafs[k]) & in_bucket
                link = links[k]
                slot = jnp.minimum(sp, STACK_DEPTH - 1)

                @pl.when(push)
                def _():
                    stack_ref[slot] = link

                sp = jnp.minimum(
                    sp + push.astype(jnp.int32), STACK_DEPTH - 1
                )

        # leaf tests, near bucket first (blocks lanes sooner)
        for far in (False, True):
            for k in range(BVH8_WIDTH):
                in_bucket = (prios[k] > pivot) if far else (prios[k] <= pivot)
                link = links[k]
                do_leaf = anys[k] & leafs[k] & in_bucket
                best_t, best_tri = lax.cond(
                    do_leaf,
                    lambda bt, bi, link=link: leaf_test(~link, bt, bi),
                    lambda bt, bi: (bt, bi),
                    best_t, best_tri,
                )
                if n_leafs is not None:
                    n_leafs = n_leafs + do_leaf.astype(jnp.int32)
        if stats_ref is not None:
            return sp, best_t, best_tri, n_pops, n_leafs
        return sp, best_t, best_tri

    stack_ref[0] = jnp.int32(0)
    if any_hit:
        best0 = TMAX  # any-hit compares against the per-ray max directly
    else:
        best0 = jnp.minimum(jnp.full((rows, 128), F32_MAX), TMAX)
    tri0 = jnp.full((rows, 128), -1, jnp.int32)
    if stats_ref is not None:
        _, best_t, best_tri, n_pops, n_leafs = lax.while_loop(
            cond, body, (jnp.int32(1), best0, tri0, jnp.int32(0),
                         jnp.int32(0))
        )
        # Mosaic cannot store scalars to VMEM: write a full (8,128) tile
        # with lane 1 = leaf count, every other lane = pop count
        lane = lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        stats_ref[pk] = jnp.where(lane == 1, n_leafs, n_pops)
    else:
        _, best_t, best_tri = lax.while_loop(
            cond, body, (jnp.int32(1), best0, tri0)
        )
    t_ref[pl.ds(base, rows), :] = best_t
    tri_ref[pl.ds(base, rows), :] = best_tri


@functools.partial(
    jax.jit,
    static_argnames=(
        "tmin", "any_hit", "interpret", "packet", "with_stats", "mixed",
        "shadow_tmin", "ordered",
    ),
)
def packet_query(
    node8_rows,
    leaf_tris,
    rox, roy, roz,
    rdx, rdy, rdz,
    tmax,
    smask=None,
    tmin: float = 0.001,
    any_hit: bool = False,
    interpret: bool = False,
    packet: int = PACKET,
    with_stats: bool = False,
    mixed: bool = False,
    shadow_tmin: float = 0.0,
    ordered: bool | None = None,
):
    """Trace R rays (packet-coherent ordering) through the 8-wide BVH.
    Returns (t, tri): t = committed distance (F32_MAX / tmax when none),
    tri = triangle slot or -1. For any_hit, tri >= 0 means blocked. With
    ``with_stats`` also returns an int32 [ceil(R/packet), 128] array: per
    packet, lane 1 holds the leaf-row-test count and every other lane the
    node-pop count.

    Range contract: any_hit accepts the closed range [tmin, tmax] like the
    hardware query; closest-hit treats a *finite* tmax as an OPEN bound
    (t < tmax) — the engine only ever passes F32_MAX (or -inf for dead
    lanes) so the distinction is unobservable there, but callers doing
    finite-tmax closest queries should know. With a finite tmax and
    ``tmin = cap``, closest-hit searches exactly the half-open band
    [cap, tmax): the engine's capped two-round bounce traversal relies on
    [tmin, cap) + [cap, inf) partitioning the line with no gap or overlap.

    ``mixed=True`` traces closest-hit and shadow lanes in ONE packet (the
    engine fuses a bounce's continuation rays with the previous bounce's
    deferred NEE shadow rays — same origins, one traversal). ``smask``
    (required, [R] f32) flags shadow lanes with 1.0: they use the closed
    range [shadow_tmin, tmax] and stop participating once blocked, while
    closest lanes use [tmin, tmax) and keep shrinking their bound. Dead
    lanes are tmax = -inf in both modes. ``any_hit`` must be False when
    mixed."""
    assert packet % 128 == 0, packet
    assert (smask is not None) == mixed, "smask required iff mixed"
    if ordered is None:
        # near-first ordering is the default everywhere: its early best-t
        # shrink saves more visits than its per-visit scalar cost on real
        # engine waves (frame A/B: ordered 1878 ms vs unordered 2460 ms on
        # the atrium headline) even though synthetic single-bounce sets
        # measure the opposite — see docs/PROFILE_r2.md for the full
        # story. RAYTPU_ORDER_MODE overrides for A/B: all | anyhit | none.
        import os

        mode = os.environ.get("RAYTPU_ORDER_MODE", "all")
        ordered = {"all": True, "none": False}.get(mode, any_hit)
    r = rox.shape[0]
    # pad rays to a packet multiple with dead lanes (tmax = -inf)
    r_pad = -(-r // packet) * packet
    if r_pad != r:
        def padr(a, fill):
            return jnp.concatenate(
                [a, jnp.full((r_pad - r,), fill, a.dtype)]
            )

        rox, roy, roz = padr(rox, 0.0), padr(roy, 0.0), padr(roz, 0.0)
        rdx, rdy, rdz = padr(rdx, 1.0), padr(rdy, 1.0), padr(rdz, 1.0)
        tmax = padr(jnp.broadcast_to(tmax, (r,)), -jnp.inf)
        if mixed:
            smask = padr(jnp.broadcast_to(smask, (r,)), 0.0)
    n_pk = r_pad // packet
    # Mosaic requires the block's sublane dim to divide by 8 (or equal the
    # array dim): pad the packet count with dead packets (tmax = -inf, one
    # stack pop each)
    ppb = min(PACKETS_PER_BLOCK, -(-n_pk // 8) * 8)
    n_pad = -(-n_pk // ppb) * ppb
    assert not (mixed and any_hit), "mixed packets imply per-lane modes"
    kernel = functools.partial(
        _packet_kernel, packet=packet, tmin=tmin, any_hit=any_hit,
        with_stats=with_stats, mixed=mixed, shadow_tmin=shadow_tmin,
        ordered=ordered,
    )
    rows_per = packet // 128
    rspec = pl.BlockSpec(
        (ppb * rows_per, 128), lambda i: (i, 0), memory_space=pltpu.VMEM
    )

    def to2d(a, fill):
        a = a.reshape(n_pk * rows_per, 128)
        if n_pad != n_pk:
            pad = jnp.full(
                ((n_pad - n_pk) * rows_per, 128), fill, a.dtype
            )
            a = jnp.concatenate([a, pad])
        return a

    args2d = [to2d(a, 0.0) for a in (rox, roy, roz)]
    args2d += [to2d(a, 1.0) for a in (rdx, rdy, rdz)]
    args2d.append(to2d(tmax, -jnp.inf))
    if mixed:
        args2d.append(to2d(smask, 0.0))
    out_specs = [rspec, rspec]
    out_shape = [
        jax.ShapeDtypeStruct((n_pad * rows_per, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_pad * rows_per, 128), jnp.int32),
    ]
    if with_stats:
        out_specs.append(
            pl.BlockSpec((ppb, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((n_pad, 8, 128), jnp.int32))
    out = pl.pallas_call(
        kernel,
        grid=(n_pad // ppb,),
        in_specs=[
            pl.BlockSpec(
                node8_rows.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                leaf_tris.shape, lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ]
        + [rspec] * (8 if mixed else 7),
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        # the default scoped-vmem limit (16MB) rejects large resident
        # scenes; v5e has 128MB of VMEM — leave headroom for ray blocks
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(node8_rows, leaf_tris, *args2d)
    t, tri = out[0], out[1]
    t = t[: n_pk * rows_per].reshape(r_pad)[:r]
    tri = tri[: n_pk * rows_per].reshape(r_pad)[:r]
    if with_stats:
        return t, tri, out[2][:n_pk, 0]
    return t, tri


def vmem_budget_ok(pack, budget_bytes: int = 100 * 1024 * 1024) -> bool:
    """True when the BVH8 + leaf rows fit the packet kernel's VMEM budget
    (v5e has 128 MiB; leave headroom for ray blocks and spills).
    Mosaic pads the lane dimension to 128."""
    if pack.bvh.node8_rows is None:  # stream pack (tables dropped)
        return False
    nodes_bytes = pack.bvh.node8_rows.shape[0] * 128 * 4
    leaf_bytes = pack.bvh.leaf_tris.shape[0] * 128 * 4
    return nodes_bytes + leaf_bytes <= budget_bytes


def check_baked_tmin(tmin_, baked: float, kind: str):
    """Factory-built intersectors bake tmin at compile time; the per-call
    ``tmin_`` argument exists only for the shared engine signature. This
    guard turns a mismatching caller value from a silent wrong image into
    a loud error (VERDICT r3 item 6). Zero runtime cost: it runs at trace
    time on the concrete values the engine passes."""
    import numpy as np

    try:
        val = float(tmin_)
    except Exception as e:  # traced/abstract value — cannot verify
        raise ValueError(
            f"{kind}: tmin is baked at factory time ({baked}); pass a "
            f"concrete Python float equal to it (got an abstract tracer "
            f"— under jit even jnp.float32(x) constants trace; pass x)"
        ) from e
    if np.float32(val) != np.float32(baked):
        raise ValueError(
            f"{kind}: tmin is baked at factory time ({baked}); the "
            f"per-call value {val} would be silently ignored — build new "
            f"intersectors instead"
        )


def make_packet_intersectors(pack, tmin: float = 0.001,
                             interpret: bool = False,
                             packet: int = PACKET):
    """(closest_fn, any_fn) with the engine's (ro, rd, tmin, tmax)
    signature. Rays must arrive packet-ordered and padded to ``packet``.

    tmin is bound at factory time (a Pallas compile-time constant): closest
    queries use ``tmin`` (the reference's 0.001, src/shader.wgsl:312-319),
    any-hit shadow queries use 0.0 (src/shader.wgsl:174-186). The per-call
    ``tmin_`` argument is checked against the baked value and raises on
    mismatch — callers needing a different tmin must build new
    intersectors."""
    from .intersect import Hit

    node8 = pack.bvh.node8_rows
    leaves = pack.bvh.leaf_tris

    def closest(ro, rd, tmin_, tmax):
        check_baked_tmin(tmin_, tmin, "packet closest")
        r = ro.shape[0]
        tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        t, tri = packet_query(
            node8, leaves,
            ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2],
            tmax_r, tmin=tmin, any_hit=False, interpret=interpret,
            packet=packet,
        )
        return Hit(t=t, tri=tri, valid=tri >= 0)

    def any_fn(ro, rd, tmin_, tmax):
        check_baked_tmin(tmin_, 0.0, "packet any-hit")
        r = ro.shape[0]
        tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        _, tri = packet_query(
            node8, leaves,
            ro[:, 0], ro[:, 1], ro[:, 2],
            rd[:, 0], rd[:, 1], rd[:, 2],
            tmax_r, tmin=0.0, any_hit=True, interpret=interpret,
            packet=packet,
        )
        return tri >= 0

    return closest, any_fn


# (a make_mixed_query factory for the round-2 resident deferred-NEE
# backend lived here; that engine arm measured slower end-to-end and was
# retired — docs/PROFILE_r2.md backend table. packet_query's mixed=True
# per-lane mode stays: it defines the smask contract the beyond-VMEM
# binned kernel implements, and tests/test_intersect.py pins it.)
