"""Binned (treelet-wavefront) traversal: the incoherent-ray answer.

The resident packet kernel (intersect_pallas.py) walks the whole BVH once
per packet, so a packet of incoherent bounce rays pays for the *union* of
its lanes' node visits — measured ~300x redundancy on the atrium frame
(docs/PROFILE_r2.md). This module replaces that walk for bounce waves:

1. the tree is pre-cut into treelets of bounded window size
   (accel/treelets.py) — the frontier partitions nodes and leaves;
2. per round, every ray selects its nearest not-yet-visited treelet whose
   entry distance can still beat its current best hit (exact ordered
   traversal with best-t culling, lifted to treelet granularity);
3. rays are binned by selected treelet on device (sort + scatter into
   packet-aligned slots) and one Pallas launch walks every bin, with each
   grid step's treelet window streamed HBM->VMEM via a scalar-prefetched
   BlockSpec index map — per-packet traversal unions are bounded by the
   window, and the BVH never needs to be VMEM-resident (beyond-VMEM
   scenes use the same path; the reference scales to GPU memory the same
   way, src/state.rs:1145-1246);
4. results fold back per ray; the round loop ends when no ray has a
   candidate treelet left.

Closest-hit and NEE shadow lanes ride the same rounds (per-lane mode from
``smask``, as in the mixed resident kernel): the engine's deferred-NEE
structure hands both ray sets of a bounce to one ``binned_query`` call.

Closest-hit ties break to the lowest global triangle slot (carried in
leaf column 10k+9), keeping results bit-identical to the XLA threaded
walk and the brute-force sweep regardless of visit order.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..accel.bvh import BVH8_WIDTH, LEAF_SIZE
from .intersect import safe_inv_dir

F32_MAX = 3.40282347e38
BIN_PACKET = 1024  # rays per binned packet ([8, 128] native tile)
STACK_DEPTH = 256  # treelet windows are shallow; 8*depth + 8 bound


def _binned_packet_kernel(
    tid_ref,  # scalar prefetch: [n_packets] i32 treelet per packet
    nodes_ref,  # [1, Sn, 128] VMEM — this packet's treelet window
    leaf_ref,  # [1, Sl, 128]
    rox_ref, roy_ref, roz_ref,  # [rows, 128]
    rdx_ref, rdy_ref, rdz_ref,
    tmax_ref,  # [rows, 128] per-lane far bound; -inf disables the lane
    smask_ref,  # [rows, 128] 1.0 flags shadow lanes
    tri0_ref,  # [rows, 128] i32 incoming best slot (closest lanes)
    t_ref, tri_ref,  # outputs [rows, 128]
    stack_ref,  # SMEM scratch
    *,
    tmin: float,
    shadow_tmin: float,
):
    ROX = rox_ref[...]
    ROY = roy_ref[...]
    ROZ = roz_ref[...]
    RDX = rdx_ref[...]
    RDY = rdy_ref[...]
    RDZ = rdz_ref[...]
    TMAX = tmax_ref[...]
    rows = ROX.shape[0]
    TINY = 1e-36

    def _safe(d):
        return jnp.where(d == 0.0, jnp.where(1.0 / d < 0.0, -TINY, TINY), d)

    IDX = 1.0 / _safe(RDX)
    IDY = 1.0 / _safe(RDY)
    IDZ = 1.0 / _safe(RDZ)
    SHAD = smask_ref[...] == 1.0
    TCUT = jnp.where(SHAD, shadow_tmin, tmin)
    slab_tmin = min(tmin, shadow_tmin)
    NEGX = IDX < 0.0
    NEGY = IDY < 0.0
    NEGZ = IDZ < 0.0

    def slab(bminx, bminy, bminz, bmaxx, bmaxy, bmaxz, limit):
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
        lrow = leaf_ref[0, leaf_row]
        for k in range(LEAF_SIZE):
            b = k * 10
            p0x, p0y, p0z = lrow[b + 0], lrow[b + 1], lrow[b + 2]
            e1x, e1y, e1z = lrow[b + 3], lrow[b + 4], lrow[b + 5]
            e2x, e2y, e2z = lrow[b + 6], lrow[b + 7], lrow[b + 8]
            slot = lax.bitcast_convert_type(
                lrow[b + 9 : b + 10], jnp.int32
            )[0]
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
            )
            # closest lanes: open far bound + lowest-slot tie break against
            # the (possibly incoming) best; shadow lanes: closed range
            ok = geo_ok & (t >= TCUT) & (
                (t < best_t) | ((t == best_t) & (SHAD | (slot < best_tri)))
            )
            best_t = jnp.where(ok, t, best_t)
            best_tri = jnp.where(ok, slot, best_tri)
        return best_t, best_tri

    live = TMAX >= 0.0

    def cond(state):
        sp, _, best_tri = state
        # stop early once every live shadow lane is blocked AND no closest
        # lanes exist is rare; keep the simple stack check plus the all-
        # blocked check for pure-shadow packets
        more = sp > 0
        all_done = jnp.all(~live | ~SHAD | (best_tri >= 0))
        only_shadow = jnp.all(SHAD | ~live)
        return more & jnp.logical_not(only_shadow & all_done)

    def body(state):
        sp, best_t, best_tri = state
        sp = sp - 1
        node = stack_ref[sp]
        nrow = nodes_ref[0, node]
        limit = jnp.where(SHAD & (best_tri >= 0), -jnp.inf, best_t)
        # ONE fused slab/push/leaf pass in storage order (near-first
        # ordering measured a net scalar-cost loss, docs/PROFILE_r2.md;
        # the lowest-slot tie break keeps results order-independent)
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
            slot = jnp.minimum(sp, STACK_DEPTH - 1)

            @pl.when(push)
            def _():
                stack_ref[slot] = link

            sp = jnp.minimum(sp + push.astype(jnp.int32), STACK_DEPTH - 1)
            do_leaf = any_k & is_leaf
            best_t, best_tri = lax.cond(
                do_leaf,
                lambda bt, bi, link=link: leaf_test(~link, bt, bi),
                lambda bt, bi: (bt, bi),
                best_t, best_tri,
            )
        return sp, best_t, best_tri

    stack_ref[0] = jnp.int32(0)
    best0 = jnp.minimum(jnp.full((rows, 128), F32_MAX), TMAX)
    # closest lanes resume from their incoming best slot; shadow lanes
    # start unblocked
    tri0 = jnp.where(SHAD, jnp.full((rows, 128), -1, jnp.int32),
                     tri0_ref[...])
    _, best_t, best_tri = lax.while_loop(
        cond, body, (jnp.int32(1), best0, tri0)
    )
    t_ref[...] = best_t
    tri_ref[...] = best_tri


@functools.partial(
    jax.jit,
    static_argnames=("tmin", "shadow_tmin", "packet", "interpret"),
)
def _binned_launch(
    tnodes, tleaves, tid_per_packet,
    rox, roy, roz, rdx, rdy, rdz, tmax, smask, tri0,
    tmin: float, shadow_tmin: float, packet: int, interpret: bool,
):
    """One Pallas launch over packet-aligned, bin-sorted rays.
    Ray arrays are [CAP] with CAP a multiple of ``packet``; dead slots
    carry tmax = -inf. Returns (t, tri) [CAP]."""
    cap = rox.shape[0]
    rows = packet // 128
    n_packets = cap // packet
    Sn = tnodes.shape[1]
    Sl = tleaves.shape[1]

    def to2d(a):
        return a.reshape(cap // 128, 128)

    rspec = pl.BlockSpec((rows, 128), lambda i, tid: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_packets,),
        in_specs=[
            pl.BlockSpec((1, Sn, 128), lambda i, tid: (tid[i], 0, 0)),
            pl.BlockSpec((1, Sl, 128), lambda i, tid: (tid[i], 0, 0)),
            rspec, rspec, rspec, rspec, rspec, rspec, rspec, rspec, rspec,
        ],
        out_specs=[rspec, rspec],
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
    )
    kernel = functools.partial(
        _binned_packet_kernel, tmin=tmin, shadow_tmin=shadow_tmin
    )
    t, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((cap // 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((cap // 128, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        tid_per_packet,
        tnodes, tleaves,
        to2d(rox), to2d(roy), to2d(roz),
        to2d(rdx), to2d(rdy), to2d(rdz),
        to2d(tmax), to2d(smask),
        to2d(tri0),
    )
    return t.reshape(cap), tri.reshape(cap)


def make_binned_query(pack, interpret: bool = False,
                      packet: int = BIN_PACKET,
                      max_rounds: int | None = None):
    """Mixed-mode query over the ScenePack's treelet tables with the
    engine's mixed_fn signature: (ro [R,3], rd [R,3], tmax [R], smask [R],
    tmin=, shadow_tmin=) -> (t [R], tri [R]).

    Per-lane modes match the resident mixed kernel: smask==1 lanes are
    any-hit shadow queries over the closed range [shadow_tmin, tmax],
    others closest-hit over [tmin, tmax). Dead lanes use tmax = -inf.

    ``max_rounds`` truncates the round loop (diagnostics/benchmarks ONLY —
    results are exact only when the loop runs to convergence)."""
    tnodes = pack.tl_nodes
    tleaves = pack.tl_leaves
    tb_min = pack.tl_bmin  # [T, 3]
    tb_max = pack.tl_bmax
    T = tnodes.shape[0]

    # rays per selection chunk: the [chunk, T] slab/selection temps are the
    # peak memory of the whole query (a 2M-ray wave against 100+ treelets
    # would otherwise materialise multi-GB [R, T] arrays and OOM HBM).
    # Bounded in ELEMENTS so many-treelet scenes shrink the chunk.
    SELECT_CHUNK = max(
        4096, min(262144, ((1 << 25) // max(T, 1)) // 128 * 128)
    )

    def query(ro, rd, tmax, smask, *, tmin: float, shadow_tmin: float):
        r = ro.shape[0]
        inv = safe_inv_dir(rd)
        shadow = smask == 1.0
        tcut = jnp.where(shadow, jnp.float32(shadow_tmin),
                         jnp.float32(tmin))
        tids = jnp.arange(T, dtype=jnp.int32)
        INF = jnp.float32(jnp.inf)

        ch = min(SELECT_CHUNK, -(-r // 128) * 128)
        r_pad = -(-r // ch) * ch
        n_ch = r_pad // ch

        def padc(a, fill):
            if r_pad == r:
                return a
            return jnp.concatenate(
                [a, jnp.full((r_pad - r,), fill, a.dtype)]
            )

        # loop-invariant chunked ray data (dead padding: tmax = -inf)
        ro_c = tuple(padc(ro[:, a], 0.0).reshape(n_ch, ch) for a in range(3))
        inv_c = tuple(
            padc(inv[:, a], 1.0).reshape(n_ch, ch) for a in range(3)
        )
        tcut_c = padc(tcut, 0.0).reshape(n_ch, ch)
        tmax_c = padc(tmax, -jnp.inf).reshape(n_ch, ch)
        shadow_c = padc(shadow, False).reshape(n_ch, ch)

        def select(best_t, best_tri, last_t, last_tid):
            """Each ray's next treelet in (tenter, tid) order that can
            still matter; returns (tid, tenter, valid). Chunked over rays
            (lax.map) with per-axis slab accumulation so peak temps are
            [chunk, T], never [R, T, 3]."""

            def chunk_fn(args):
                (rox, roy, roz, ivx, ivy, ivz, tct, tmx, shd,
                 bt, btri, lt, ltid) = args
                near = jnp.broadcast_to(tct[:, None], (ch, T))
                far = jnp.broadcast_to(tmx[:, None], (ch, T))
                for a, (o, iv) in enumerate(
                    ((rox, ivx), (roy, ivy), (roz, ivz))
                ):
                    lo = (tb_min[None, :, a] - o[:, None]) * iv[:, None]
                    hi = (tb_max[None, :, a] - o[:, None]) * iv[:, None]
                    near = jnp.maximum(near, jnp.minimum(lo, hi))
                    far = jnp.minimum(far, jnp.maximum(lo, hi))
                bound = jnp.where(shd, jnp.where(btri >= 0, -INF, tmx), bt)
                after = (near > lt[:, None]) | (
                    (near == lt[:, None])
                    & (tids[None, :] > ltid[:, None])
                )
                ok = (near <= far) & after & (near <= bound[:, None])
                key = jnp.where(ok, near, INF)
                sel = jnp.argmin(key, axis=1).astype(jnp.int32)
                sel_t = jnp.take_along_axis(key, sel[:, None], axis=1)[:, 0]
                return sel, sel_t

            sel, sel_t = lax.map(
                chunk_fn,
                (*ro_c, *inv_c, tcut_c, tmax_c, shadow_c,
                 padc(best_t, -jnp.inf).reshape(n_ch, ch),
                 padc(best_tri, -1).reshape(n_ch, ch),
                 padc(last_t, INF).reshape(n_ch, ch),
                 padc(last_tid, 0).reshape(n_ch, ch)),
            )
            sel = sel.reshape(r_pad)[:r]
            sel_t = sel_t.reshape(r_pad)[:r]
            return sel, sel_t, sel_t < INF

        # static capacity: every ray in some bin + per-bin alignment slack
        cap = -(-(r + T * (packet - 1)) // packet) * packet
        n_packets = cap // packet

        def round_body(state):
            (best_t, best_tri, last_t, last_tid, sel, sel_t, valid,
             _nround) = state
            # --- bin: sort (treelet, ray), rank within bin, scatter to
            # packet-aligned slots
            # NOTE on scatters: XLA TPU serialises scatters it cannot
            # prove collision-free — a plain bincount/.at[].set over 100k+
            # indices costs SECONDS. Counts therefore come from binary
            # searches over the sorted keys, and every scatter passes
            # unique_indices (pos is strictly increasing; sorted_ray is a
            # permutation).
            skey = jnp.where(valid, sel, T)
            order_idx = jnp.arange(r, dtype=jnp.int32)
            sorted_key, sorted_ray = lax.sort((skey, order_idx), num_keys=1)
            bin_first = jnp.searchsorted(
                sorted_key, jnp.arange(T + 1, dtype=jnp.int32), side="left"
            ).astype(jnp.int32)
            counts = bin_first[1:] - bin_first[:-1]  # [T]
            padded = -(-counts // packet) * packet
            cum = jnp.cumsum(padded)
            offs = cum - padded
            seg_first = bin_first[jnp.minimum(sorted_key, T - 1)]
            rank = order_idx - seg_first
            # invalid rays (sorted_key == T) land at DISTINCT overflow
            # slots cap + rank-within-the-invalid-tail, so the scatter's
            # unique_indices/indices_are_sorted hints stay honest (a
            # shared index would be undefined behaviour XLA may exploit)
            pos = jnp.where(
                sorted_key < T,
                offs[jnp.minimum(sorted_key, T - 1)].astype(jnp.int32) + rank,
                cap + (order_idx - bin_first[T]),
            )
            # per-packet treelet id (packets past the last bin are dead)
            starts = jnp.arange(n_packets, dtype=jnp.int32) * packet
            tidpp = jnp.searchsorted(cum, starts, side="right").astype(
                jnp.int32
            )
            tidpp = jnp.minimum(tidpp, T - 1)

            g = jnp.full((cap + r,), -1, jnp.int32).at[pos].set(
                sorted_ray, unique_indices=True, indices_are_sorted=True
            )
            g = g[:cap]
            alive_slot = g >= 0
            gi = jnp.maximum(g, 0)

            # ONE row gather moves all per-ray state (element gathers on
            # TPU run at ~2% of HBM bandwidth; row-gather cost is flat in
            # row width — the tri_row principle, raytpu.types)
            # int columns ride the float row as VALUES (exact for
            # |v| < 2^24 — triangle slots are far below; a bitcast would
            # turn -1 into a NaN whose payload XLA may not preserve)
            ray_rows = jnp.concatenate(
                [
                    ro, rd,
                    jnp.where(shadow, tmax, best_t)[:, None],
                    smask[:, None],
                    best_tri.astype(jnp.float32)[:, None],
                ],
                axis=1,
            )  # [r, 9]
            rows = ray_rows[gi]  # [cap, 9]
            t_out, tri_out = _binned_launch(
                tnodes, tleaves, tidpp,
                rows[:, 0], rows[:, 1], rows[:, 2],
                rows[:, 3], rows[:, 4], rows[:, 5],
                jnp.where(alive_slot, rows[:, 6], -jnp.inf),
                rows[:, 7],
                rows[:, 8].astype(jnp.int32),
                tmin=tmin, shadow_tmin=shadow_tmin, packet=packet,
                interpret=interpret,
            )
            # fold back: each valid ray's result lives at its scatter slot
            # (a second key sort beats a scatter: sorted_ray is a
            # permutation, so sorting by it restores ray order); one row
            # gather again for (t, tri)
            _, pos_by_ray = lax.sort(
                (sorted_ray, jnp.where(sorted_key < T, pos, cap)),
                num_keys=1,
            )
            safe_pos = jnp.minimum(pos_by_ray, cap - 1)
            out_rows = jnp.stack(
                [t_out, tri_out.astype(jnp.float32)], axis=1
            )[safe_pos]  # [r, 2]
            new_t = jnp.where(valid, out_rows[:, 0], best_t)
            new_tri = jnp.where(
                valid, out_rows[:, 1].astype(jnp.int32), best_tri
            )
            # shadow lanes keep t = tmax semantics; closest lanes carry
            # the improved bound forward
            best_t = jnp.where(shadow, best_t, new_t)
            best_tri = new_tri
            last_t = jnp.where(valid, sel_t, last_t)
            last_tid = jnp.where(valid, sel, last_tid)
            nsel, nsel_t, nvalid = select(best_t, best_tri, last_t, last_tid)
            return (best_t, best_tri, last_t, last_tid, nsel, nsel_t, nvalid,
                    state[7] + 1)

        def round_cond(state):
            more = jnp.any(state[6])
            if max_rounds is not None:
                more = more & (state[7] < max_rounds)
            return more

        best_t0 = jnp.minimum(jnp.full((r,), F32_MAX), tmax)
        best_tri0 = jnp.full((r,), -1, jnp.int32)
        last_t0 = jnp.full((r,), -INF)
        last_tid0 = jnp.full((r,), -1, jnp.int32)
        sel0, sel_t0, valid0 = select(best_t0, best_tri0, last_t0, last_tid0)
        best_t, best_tri, *_ = lax.while_loop(
            round_cond, round_body,
            (best_t0, best_tri0, last_t0, last_tid0, sel0, sel_t0, valid0,
             jnp.int32(0)),
        )
        return best_t, best_tri

    return query


def make_binned_intersectors(pack, tmin: float = 0.001,
                             interpret: bool = False,
                             packet: int = BIN_PACKET):
    """(closest_fn, any_fn) with the engine's (ro, rd, tmin, tmax)
    signature, entirely over the binned path — the intersectors for scenes
    whose BVH exceeds the resident kernel's VMEM budget (treelet windows
    stream from HBM, nothing is resident). ``tmin`` is bound at factory
    time like make_packet_intersectors (mismatching per-call values
    raise)."""
    from .intersect import Hit
    from .intersect_pallas import check_baked_tmin

    query = make_binned_query(pack, interpret=interpret, packet=packet)

    def closest(ro, rd, tmin_, tmax):
        check_baked_tmin(tmin_, tmin, "binned closest")
        r = ro.shape[0]
        tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        t, tri = query(
            ro, rd, tmax_r, jnp.zeros((r,), jnp.float32),
            tmin=tmin, shadow_tmin=0.0,
        )
        return Hit(t=t, tri=tri, valid=tri >= 0)

    def any_fn(ro, rd, tmin_, tmax):
        check_baked_tmin(tmin_, 0.0, "binned any-hit")
        r = ro.shape[0]
        tmax_r = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,))
        _, tri = query(
            ro, rd, tmax_r, jnp.ones((r,), jnp.float32),
            tmin=tmin, shadow_tmin=0.0,
        )
        return tri >= 0

    return closest, any_fn
