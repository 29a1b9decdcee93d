"""Persistent strand traversal: walkers refill from an on-device queue.

The block-scheduled strand kernel (kernels/strand.py) pays every block
iteration for ALL of its walkers until the block's SLOWEST strand
finishes. Strand step counts are heavily skewed (captured atrium bounce
waves: p50 = 61 steps, p99 = 1340, benchmarks/strand_sim.py), so at the
production group size the blocks pay 2.7-4.3x more walker-iterations
than the strands actually use (the ``tail@g16`` sim column).

This kernel removes the tail with the classic persistent-worker scheme,
which is exactly the traversal *scheduler* half of the GPU hardware
ray-query this engine replaces (/root/reference/src/shader.wgsl:312-319
gets it for free from the SIMT dispatcher; src/state.rs:129-133):

* ONE kernel invocation holds W walkers resident; ray strands live in
  HBM (``memory_space=ANY``) instead of being block-sliced into VMEM;
* a walker whose strand completes (walk terminated AND its deferred
  leaf queue drained) stages its results, DMAs them to the output rows,
  pulls the next strand id from an SMEM counter, and DMAs that strand's
  rays in — walkers never idle while strands remain;
* refills are BATCHED (``service_k`` at a time, or whenever no walker
  is mid-walk) so the per-walker predicated scalar blocks amortize over
  hundreds of walk steps — the every-step ``pl.when`` that made the
  round-3 ``skip_done`` knob 4x slower (docs/PROFILE_r3.md) never runs
  on the step path;
* out-DMAs complete lazily: each walker waits for its previous result
  copy only when it next refills (staging rows make the overwrite safe).

Per-ray math is IDENTICAL to kernels/strand.py (same octant-threaded
tree, same slab/Moller-Trumbore op order, same closed/open range
contract, same lowest-slot tie break), so results stay bit-identical to
all other intersector paths.
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
TINY = 1e-36
QCAP = 120  # leaf-queue overflow guard (grows <= 1 per step)


def _persistent_kernel(
    tree_ref,  # [Rt, 128] VMEM — octant-threaded node rows
    leaf_ref,  # [Nl, 80] VMEM — shared leaf triangle rows
    rays_ref,  # [S*8, 128] ANY — strand s rows 8s..8s+7 = rox roy roz
    #            rdx rdy rdz tmax pad
    t_ref,  # [S, 128] f32 ANY out
    tri_ref,  # [S, 128] i32 ANY out
    *refs,  # [stats_ref (8,) SMEM i32 out when stats] + scratch
    n_strands: int,
    tmin: float,
    any_hit: bool,
    walkers: int,
    service_k: int,
    max_iters: int,
    flush_occ: float,
    mixed: bool,
    shadow_tmin: float,
    smem_cur: bool,
    smem_pend: bool,
    pipe: bool,
    ribbon_rpo: int,
    ribbon_k: int,
    stats: bool,
    unroll: int,
    ctl_every: int,
    flush_pop: int,
    tree_any: bool,
    dual: bool,
    fetch_smem: bool,
):
    if stats:
        stats_ref, *refs = refs
    (
        rox_s, roy_s, roz_s, rdx_s, rdy_s, rdz_s, tmax_s,  # (W,128) f32
        idx_s, idy_s, idz_s,  # (W,128) f32 — safe inverse directions
        bt_s, btr_s,  # (W,128) f32/i32 — best t / best tri
        stt_s, sti_s,  # (W,128) f32/i32 — out staging
        stin_s,  # (W*8, 128) f32 — in staging
        snode_s,  # (W,128) f32
        sleaf_s,  # (W,128) f32
        queue_s,  # (W,128) i32
        qn_s, cur_s, pend_s, act_s,  # (W,1) i32
        ah_s,  # (W,128) f32 — per-lane any-hit flag (mixed; zeros else)
        sid_smem,  # SMEM (W,) i32 — current strand id per walker
        flags_smem,  # SMEM (W,) i32 — 0 idle, 1 serviced+refilled,
        #              2 serviced+parked
        ctr_smem,  # SMEM (8,) i32 — [next strand, walkers parked,
        #            deferred-leaf pending, flushes, services, installs,
        #            leaf pops, enqueues]
        cur_smem,  # SMEM (W,1) i32 — scalar mirror of cur_s (fetch idx)
        pend_smem,  # SMEM (W,1) i32 — scalar mirror of pend_s
        obase_smem,  # SMEM (W,) i32 — ribbon: per-walker octant row base
        sem_in,  # DMA, shared by all in-copies (waits match starts 1:1)
        sem_out,  # DMA, shared by all out-copies
        sem_cur,  # DMA for the per-step cur_s -> cur_smem mirror copy
        sem_pend,  # DMA for the per-flush pend_s -> pend_smem mirror
        sem_tree,  # DMA for HBM node-row fetches (tree_any)
        sem_leaf,  # DMA for HBM leaf-row fetches (tree_any)
    ) = refs
    W = walkers
    # ribbon mode (accel/strandtree.py RibbonTree): tree_ref rows pack 16
    # nodes of ONE octant in that octant's near-first DFS pre-order
    # (hit == v + 1), so a walker's hit-chain runs inside one fetched row.
    # Each iteration fetches once per walker and then takes up to
    # ribbon_k sub-steps while the walk stays in-row (sim: 74% of all
    # transitions do, 2.69x fewer fetches at K=4 — strand_sim --ribbon).
    ribbon = ribbon_rpo > 0
    assert not ribbon or 1 <= ribbon_k <= 8
    # unrolled sub-steps re-fetch mid-body, which requires the pipelined
    # fetch shape (snode_s consumed at body start) and the strand layout.
    # Queue safety at ANY unroll comes from the enqueue gate (a walker
    # with qn >= QCAP stalls in place), not from a growth bound.
    assert 1 <= unroll <= 64
    assert unroll == 1 or (pipe and not ribbon), (
        "unroll > 1 requires pipe=True and the strand (non-ribbon) layout"
    )
    # ctl_every: run the flush/service DECISION block only on body
    # iterations where it % ctl_every == 0 (power of two so the gate is
    # one scalar AND on the carry). The decision block's five
    # vector->scalar reductions + their in-situ serialization are the
    # measured per-iteration control floor (docs/PROFILE_r4.md:
    # ~471 + ~780 cycles of ~2250/iter); deferring a flush/service by
    # < ctl_every iterations only delays best-t shrink / refill timing —
    # the same schedule-independence argument as the occupancy flush.
    assert ctl_every >= 1 and (ctl_every & (ctl_every - 1)) == 0
    # flush_pop: pop up to P queue heads per walker per flush (P chained
    # MT passes), so flush arbitration amortizes over P leaf rounds and
    # queues drain fast enough for deep unrolls to stay unstalled.
    assert flush_pop >= 1
    assert flush_pop == 1 or not smem_pend, (
        "smem_pend defers exactly one pend set; multi-pop needs the"
        " in-line leaf phase"
    )
    # tree_any: node/leaf tables live in HBM (memory_space=ANY) — the
    # beyond-VMEM scene route. Every row fetch becomes an async copy;
    # all W starts issue before any wait so the HBM latencies overlap
    # across walkers. Same rows, same math: results stay bit-identical
    # to the VMEM-resident configuration.
    assert not tree_any or (pipe and not ribbon and not smem_cur), (
        "tree_any requires the pipelined strand (non-ribbon) layout"
    )
    # dual: interleave two walker half-pools so each half's scalar node
    # fetch overlaps the other half's vector advance (see the body)
    assert not dual or (pipe and not ribbon and walkers % 2 == 0), (
        "dual requires the pipelined strand layout and an even pool"
    )
    # fetch_smem: mid-body fetch indices ride ONE cur_s -> cur_smem DMA
    # per sub-step and the per-walker index reads hit SMEM (1-2 cycles)
    # instead of paying a serialized vector->scalar VMEM transfer each
    # (the measured per-sub-step floor; docs/PROFILE_r5.md queue 1b)
    assert not fetch_smem or (pipe and not ribbon and not smem_cur), (
        "fetch_smem requires the pipelined strand layout"
    )

    def stage_node_rows(row_of, lo=0, hi=None):
        """snode_s[w] <- tree row ``row_of(w)`` for walkers [lo, hi).
        VMEM trees copy rows directly; HBM trees (tree_any) start all
        the async copies first, then wait (waits match starts 1:1 on
        the shared semaphore, counted by shape)."""
        hi = W if hi is None else hi
        if tree_any:
            for w in range(lo, hi):
                pltpu.make_async_copy(
                    tree_ref.at[pl.ds(row_of(w), 1), :],
                    snode_s.at[pl.ds(w, 1), :],
                    sem_tree,
                ).start()
            for w in range(lo, hi):
                pltpu.make_async_copy(
                    tree_ref.at[pl.ds(0, 1), :],
                    snode_s.at[pl.ds(w, 1), :],
                    sem_tree,
                ).wait()
        else:
            for w in range(lo, hi):
                snode_s[w : w + 1, :] = tree_ref[pl.ds(row_of(w), 1), :]
    # mixed mode: rays8 row 7 carries a per-LANE any-hit flag (the
    # deferred-NEE shadow mask) — one launch serves bounce b's shadow
    # rays AND bounce b+1's continuation rays after one shared coherence
    # sort (engine _mixed_bounce_query). Per-lane tmin follows the flag.
    slab_tmin = min(tmin, shadow_tmin) if mixed else tmin

    def install(w):
        """Move staged strand rows into walker w's slots + init state."""
        b = 8 * w
        rox_s[w : w + 1, :] = stin_s[b + 0 : b + 1, :]
        roy_s[w : w + 1, :] = stin_s[b + 1 : b + 2, :]
        roz_s[w : w + 1, :] = stin_s[b + 2 : b + 3, :]
        rdx_s[w : w + 1, :] = stin_s[b + 3 : b + 4, :]
        rdy_s[w : w + 1, :] = stin_s[b + 4 : b + 5, :]
        rdz_s[w : w + 1, :] = stin_s[b + 5 : b + 6, :]
        tmax_s[w : w + 1, :] = stin_s[b + 6 : b + 7, :]

        def safe_inv(row):
            return 1.0 / jnp.where(
                row == 0.0, jnp.where(1.0 / row < 0.0, -TINY, TINY), row
            )

        idx_s[w : w + 1, :] = safe_inv(rdx_s[w : w + 1, :])
        idy_s[w : w + 1, :] = safe_inv(rdy_s[w : w + 1, :])
        idz_s[w : w + 1, :] = safe_inv(rdz_s[w : w + 1, :])
        tm = tmax_s[w : w + 1, :]
        if mixed:
            ah = stin_s[b + 7 : b + 8, :]
            ah_s[w : w + 1, :] = ah
            bt_s[w : w + 1, :] = jnp.where(
                ah > 0.0, tm,
                jnp.minimum(jnp.full((1, 128), F32_MAX), tm),
            )
        elif any_hit:
            bt_s[w : w + 1, :] = tm
        else:
            bt_s[w : w + 1, :] = jnp.minimum(
                jnp.full((1, 128), F32_MAX), tm
            )
        btr_s[w : w + 1, :] = jnp.full((1, 128), -1, jnp.int32)
        one = jnp.full((1, 1), 1, jnp.int32)
        cur_s[w : w + 1, 0:1] = one * 0
        if smem_cur:
            cur_smem[w, 0] = 0
        qn_s[w : w + 1, 0:1] = one * 0
        pend_s[w : w + 1, 0:1] = -one
        act_s[w : w + 1, 0:1] = one
        if ribbon:
            # the strand's octant picks its renumbered tree: row base =
            # octant * rows_per_oct (lane 0 is representative — the
            # engine sorts waves direction-octant-major). Three scalar
            # reads per REFILL, not per step.
            ob = (
                (rdx_s[w, 0] < 0.0).astype(jnp.int32)
                + 2 * (rdy_s[w, 0] < 0.0).astype(jnp.int32)
                + 4 * (rdz_s[w, 0] < 0.0).astype(jnp.int32)
            ) * ribbon_rpo
            obase_smem[w] = ob
            if pipe:
                snode_s[w : w + 1, :] = tree_ref[pl.ds(ob, 1), :]
        elif pipe:
            # pipelined fetch: the body consumes snode_s directly, so a
            # refilled walker's first node row (cur = 0 -> tree row 0)
            # is staged here instead of at body start
            if tree_any:
                cp = pltpu.make_async_copy(
                    tree_ref.at[pl.ds(0, 1), :],
                    snode_s.at[pl.ds(w, 1), :],
                    sem_tree,
                )
                cp.start()
                cp.wait()
            else:
                snode_s[w : w + 1, :] = tree_ref[pl.ds(0, 1), :]

    # ---- initial fill ----
    n0 = min(W, n_strands)
    ctr_smem[0] = n0
    ctr_smem[1] = W - n0
    ctr_smem[2] = 0
    if stats:
        ctr_smem[3] = 0  # flushes
        ctr_smem[4] = 0  # services
        ctr_smem[5] = n0  # installs
        ctr_smem[6] = 0  # leaf pops
        ctr_smem[7] = 0  # enqueues
    for w in range(W):
        flags_smem[w] = 0
        if w < n0:
            sid_smem[w] = w
            pltpu.make_async_copy(
                rays_ref.at[pl.ds(8 * w, 8), :],
                stin_s.at[pl.ds(8 * w, 8), :],
                sem_in,
            ).start()
        else:
            sid_smem[w] = -1
            one = jnp.full((1, 1), 1, jnp.int32)
            act_s[w : w + 1, 0:1] = one * 0
            cur_s[w : w + 1, 0:1] = -one
            if smem_cur:
                cur_smem[w, 0] = -1
            qn_s[w : w + 1, 0:1] = one * 0
            pend_s[w : w + 1, 0:1] = -one
            # inactive rows still flow through the vector step: give them
            # inert values (ACT/PM masks make them no-ops regardless)
            if mixed:
                ah_s[w : w + 1, :] = jnp.zeros((1, 128))
            bt_s[w : w + 1, :] = jnp.full((1, 128), -jnp.inf)
            btr_s[w : w + 1, :] = jnp.full((1, 128), -1, jnp.int32)
            tmax_s[w : w + 1, :] = jnp.full((1, 128), -jnp.inf)
            rdx_s[w : w + 1, :] = jnp.ones((1, 128))
            rdy_s[w : w + 1, :] = jnp.ones((1, 128))
            rdz_s[w : w + 1, :] = jnp.ones((1, 128))
            rox_s[w : w + 1, :] = jnp.zeros((1, 128))
            roy_s[w : w + 1, :] = jnp.zeros((1, 128))
            roz_s[w : w + 1, :] = jnp.zeros((1, 128))
            idx_s[w : w + 1, :] = jnp.ones((1, 128))
            idy_s[w : w + 1, :] = jnp.ones((1, 128))
            idz_s[w : w + 1, :] = jnp.ones((1, 128))
            if ribbon:
                obase_smem[w] = 0
            if pipe:
                # never-active rows still flow through the vector step;
                # stage any real row (ACT masks every consequence)
                if tree_any:
                    cp = pltpu.make_async_copy(
                        tree_ref.at[pl.ds(0, 1), :],
                        snode_s.at[pl.ds(w, 1), :],
                        sem_tree,
                    )
                    cp.start()
                    cp.wait()
                else:
                    snode_s[w : w + 1, :] = tree_ref[pl.ds(0, 1), :]
    for w in range(n0):
        pltpu.make_async_copy(
            rays_ref.at[pl.ds(8 * w, 8), :],
            stin_s.at[pl.ds(8 * w, 8), :],
            sem_in,
        ).wait()
        install(w)

    def leaf_phase():
        """One batched Moller-Trumbore pass over every pending leaf row
        (identical op order to kernels/strand.py leaf_phase)."""
        pend = pend_s[...]
        for w in range(W):
            if smem_pend:
                lr = jnp.maximum(pend_smem[w, 0], 0)
            else:
                lr = jnp.maximum(pend_s[w, 0], 0)
            if tree_any:
                # HBM leaf rows (padded to 128 lanes by the factory):
                # start all W copies, wait below so latencies overlap
                pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(lr, 1), :],
                    sleaf_s.at[pl.ds(w, 1), :],
                    sem_leaf,
                ).start()
            else:
                sleaf_s[w : w + 1, 0 : leaf_ref.shape[1]] = leaf_ref[
                    pl.ds(lr, 1), :
                ]
        if tree_any:
            for w in range(W):
                pltpu.make_async_copy(
                    leaf_ref.at[pl.ds(0, 1), :],
                    sleaf_s.at[pl.ds(w, 1), :],
                    sem_leaf,
                ).wait()
        L = sleaf_s[...]
        PM = pend >= 0
        LR = jnp.maximum(pend, 0)
        ROX, ROY, ROZ = rox_s[...], roy_s[...], roz_s[...]
        RDX, RDY, RDZ = rdx_s[...], rdy_s[...], rdz_s[...]
        best_t = bt_s[...]
        best_tri = btr_s[...]
        if mixed:
            AH = ah_s[...] > 0.0
            TMIN = jnp.where(AH, shadow_tmin, tmin)
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
            slot = LR * LEAF_SIZE + k
            if mixed:
                rng_ok = t >= TMIN
                ok_any = geo_ok & rng_ok & (t <= best_t)
                ok_clo = geo_ok & rng_ok & (
                    (t < best_t) | ((t == best_t) & (slot < best_tri))
                )
                # boolean select via logic ops (Mosaic cannot lower
                # select_n on i1 vectors)
                ok = (AH & ok_any) | (jnp.logical_not(AH) & ok_clo)
                best_t = jnp.where(
                    ok & jnp.logical_not(AH), t, best_t
                )
                best_tri = jnp.where(ok, slot, best_tri)
            elif any_hit:
                ok = geo_ok & (t >= tmin) & (t <= best_t)
                best_tri = jnp.where(ok, slot, best_tri)
            else:
                ok = geo_ok & (t >= tmin) & (
                    (t < best_t) | ((t == best_t) & (slot < best_tri))
                )
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, slot, best_tri)
        bt_s[...] = best_t
        btr_s[...] = best_tri

    def body(carry):
        it, _ = carry
        # 0) deferred leaf phase (smem_pend): the previous iteration's
        #    flush popped the queue heads into pend_s and started the
        #    SMEM mirror copy; it lands here, one iteration later, so the
        #    mirror DMA overlapped that iteration's service instead of
        #    stalling the MT pass on 128 vector->scalar reads. Deferring
        #    by one step only delays best-t shrink (committed sets are
        #    unchanged — same argument as the occupancy flush); the
        #    service guard below keeps popped-but-untested walkers from
        #    refilling, so staged results always include every leaf.
        if smem_pend:
            @pl.when(ctr_smem[2] == 1)
            def _():
                pltpu.make_async_copy(pend_s, pend_smem, sem_pend).wait()
                leaf_phase()
                pend_s[...] = jnp.full((W, 1), -1, jnp.int32)
                ctr_smem[2] = 0

        # 1) fetch + batched octant roll (the strand kernel's multiroll
        #    fetch: amounts are (c%2)*64 + octant*8, all multiples of 8)
        #    With smem_cur the fetch indices come from an SMEM mirror of
        #    cur_s (DMA'd at the previous step, overlapped with the
        #    queue/flush phases): the scalar unit reads SMEM in a cycle
        #    or two, where reading cur_s[w, 0] from VMEM pays a
        #    vector->scalar transfer per walker per step — 128 of them
        #    serialized was the measured ~40-cycle/walker-step floor.
        if not pipe:
            for w in range(W):
                if smem_cur:
                    c = jnp.maximum(cur_smem[w, 0], 0)
                else:
                    c = jnp.maximum(cur_s[w, 0], 0)
                if ribbon:
                    snode_s[w : w + 1, :] = tree_ref[
                        pl.ds(obase_smem[w] + c // 16, 1), :
                    ]
                else:
                    snode_s[w : w + 1, :] = tree_ref[pl.ds(c // 2, 1), :]
        def half_env(a, b):
            """Per-walker loop-invariant walk inputs for rows [a, b),
            read straight from the refs as (b-a, 128) values — the dual
            halves must NOT slice full-width values mid-graph (Mosaic's
            vector_extract_strided_slice cannot lower those shapes; a
            ref read with a static sublane-aligned slice can)."""
            e = {}
            e["TMAX"] = tmax_s[a:b, :]
            e["best_t"] = bt_s[a:b, :]
            e["best_tri"] = btr_s[a:b, :]
            if mixed:
                e["AH"] = ah_s[a:b, :] > 0.0
            ix, iy, iz = idx_s[a:b, :], idy_s[a:b, :], idz_s[a:b, :]
            e["IDX"], e["IDY"], e["IDZ"] = ix, iy, iz
            e["NEGX"], e["NEGY"], e["NEGZ"] = ix < 0.0, iy < 0.0, iz < 0.0
            e["ROX"] = rox_s[a:b, :]
            e["ROY"] = roy_s[a:b, :]
            e["ROZ"] = roz_s[a:b, :]
            e["LANE"] = lax.broadcasted_iota(jnp.int32, (b - a, 128), 1)
            return e

        def advance(S_raw, cur, q, qn, roll_amt, part, env=None):
            """One walk step on the fetched rows: octant/offset roll,
            slab test, link select, leaf enqueue. ``part`` masks walkers
            participating this sub-step (ribbon: in-fetched-row and
            queue-headroom); masked walkers keep cur/q/qn unchanged.
            ``env`` supplies the per-walker loop-invariant inputs (the
            dual halves pass half_env views); per-walker math is
            unchanged, so results stay bit-identical to the full width.
            Identical op order to the original single-step body."""
            if env is None:
                env = full_env
            S = S_raw
            for b in (3, 4, 5, 6):
                S = jnp.where(
                    (roll_amt & (1 << b)) != 0,
                    pltpu.roll(S, 128 - (1 << b), 1), S,
                )
            HITL = S[:, 6:7].astype(jnp.int32)
            MISSL = S[:, 7:8].astype(jnp.int32)
            ACT = part
            if mixed:
                # any-hit lanes stop contributing once blocked (their
                # best_t never shrinks, so -inf kills further box hits);
                # a walker whose lanes are all blocked-or-dead-or-
                # shadow-done parks
                LIMIT = jnp.where(
                    env["AH"] & (env["best_tri"] >= 0), -jnp.inf,
                    env["best_t"],
                )
                all_done = jnp.all(
                    (env["AH"] & (env["best_tri"] >= 0))
                    | (env["TMAX"] < 0.0),
                    axis=1, keepdims=True,
                )
                ACT = ACT & jnp.logical_not(all_done)
            elif any_hit:
                LIMIT = jnp.where(
                    env["best_tri"] >= 0, -jnp.inf, env["TMAX"]
                )
                all_done = jnp.all(
                    (env["best_tri"] >= 0) | (env["TMAX"] < 0.0),
                    axis=1, keepdims=True,
                )
                ACT = ACT & jnp.logical_not(all_done)
            else:
                LIMIT = env["best_t"]
            # 2) slab test (per-walker box broadcast from (W,1) columns)
            NX, NY, NZ = env["NEGX"], env["NEGY"], env["NEGZ"]
            OX, OY, OZ = env["ROX"], env["ROY"], env["ROZ"]
            IX, IY, IZ = env["IDX"], env["IDY"], env["IDZ"]
            lox = (jnp.where(NX, S[:, 3:4], S[:, 0:1]) - OX) * IX
            hix = (jnp.where(NX, S[:, 0:1], S[:, 3:4]) - OX) * IX
            loy = (jnp.where(NY, S[:, 4:5], S[:, 1:2]) - OY) * IY
            hiy = (jnp.where(NY, S[:, 1:2], S[:, 4:5]) - OY) * IY
            loz = (jnp.where(NZ, S[:, 5:6], S[:, 2:3]) - OZ) * IZ
            hiz = (jnp.where(NZ, S[:, 2:3], S[:, 5:6]) - OZ) * IZ
            near = jnp.maximum(
                jnp.maximum(lox, loy), jnp.maximum(loz, slab_tmin)
            )
            far = jnp.minimum(
                jnp.minimum(hix, hiy), jnp.minimum(hiz, LIMIT)
            )
            HIT = near <= far
            hit_any = jnp.any(HIT, axis=1, keepdims=True) & ACT
            IS_LEAF = HITL < 0
            # 3) advance walkers
            pend = jnp.where(hit_any & IS_LEAF, ~HITL, -1)
            nxt = jnp.where(
                hit_any & jnp.logical_not(IS_LEAF), HITL, MISSL
            )
            nxt = jnp.where(ACT, nxt, jnp.int32(-1))
            cur = jnp.where(part, nxt, cur)
            # 4) enqueue leaf visits (LIFO insert at lane 0)
            enq = pend >= 0
            q = jnp.where(enq, pltpu.roll(q, 1, 1), q)
            q = jnp.where(enq & (env["LANE"] == 0), pend, q)
            qn = qn + enq.astype(jnp.int32)
            return cur, q, qn

        # full-width loop-invariant reads only when a full-width advance
        # will run (dual reads per-half views instead — dead full reads
        # would cost real VMEM load cycles every iteration)
        full_env = None if dual else half_env(0, W)
        if not dual:
            cur = cur_s[...]
            q = queue_s[...]
            qn = qn_s[...]
        if stats:
            qn0_sum = jnp.sum(qn_s[...])
        if ribbon:
            # up to ribbon_k sub-steps on the one fetched row: the walk
            # participates while it stays inside the row (and its leaf
            # queue has headroom — sub-steps can enqueue up to K leaves
            # per iteration, so a near-full walker stalls in place until
            # the flush drains it; stalling never loses work, the next
            # iteration refetches its current row)
            S_raw = snode_s[...]
            ROW0 = jnp.maximum(cur, 0) // 16
            for _k in range(ribbon_k):
                c0 = jnp.maximum(cur, 0)
                part = (
                    (cur >= 0) & ((c0 // 16) == ROW0) & (qn < QCAP)
                )
                cur, q, qn = advance(S_raw, cur, q, qn, (c0 & 15) * 8,
                                     part)
            nxt = cur
        else:
            RDX0 = rdx_s[:, 0:1]
            RDY0 = rdy_s[:, 0:1]
            RDZ0 = rdz_s[:, 0:1]
            OB = (
                (RDX0 < 0.0).astype(jnp.int32)
                + 2 * (RDY0 < 0.0).astype(jnp.int32)
                + 4 * (RDZ0 < 0.0).astype(jnp.int32)
            ) * 8
            # check-every-K unroll: take ``unroll`` walk steps per body
            # iteration, re-fetching between sub-steps, and run the
            # flush/service DECISION logic once per body. step_bench
            # (docs/PROFILE_r4.md): the decision logic alone costs ~470
            # cycles/iter — as much as the whole advance body — so
            # amortizing it over K steps cuts the per-step floor. The
            # deferral argument is the occupancy-flush one: checking
            # later only delays best-t shrink; committed sets are
            # unchanged (lowest-slot ties), results stay bit-identical.
            # Queue headroom: enqueues are GATED on qn < QCAP — a walker
            # whose queue is full stalls in place (cur unchanged; the
            # next sub-step refetches the same row and retries), so no
            # queued leaf can ever be dropped at any unroll. The flush
            # drains it within a control round (ADVICE r4: the old
            # ungated path could overflow at unroll>1 because the flush
            # pops fewer per iteration than K sub-steps can push).
            if dual:
                # DUAL INTERLEAVE: the walker pool splits into two
                # independent halves whose advances alternate, so each
                # half's serialized scalar fetch (whose vector->scalar
                # reads of just-written cur_s are the measured per-step
                # floor — the r5 cadence knobs alone moved nothing,
                # docs/PROFILE_r5.md) issues right after its own advance
                # and overlaps the OTHER half's vector advance; the last
                # fetch overlaps the control region like classic pipe.
                # Walkers are independent, so per-walker math and commit
                # order are unchanged: results stay bit-identical.
                Hf = W // 2
                env0, env1 = half_env(0, Hf), half_env(Hf, W)
                cur0, cur1 = cur_s[0:Hf, :], cur_s[Hf:W, :]
                q0, q1 = queue_s[0:Hf, :], queue_s[Hf:W, :]
                qn0, qn1 = qn_s[0:Hf, :], qn_s[Hf:W, :]

                def _ob(a, b):
                    return (
                        (rdx_s[a:b, 0:1] < 0.0).astype(jnp.int32)
                        + 2 * (rdy_s[a:b, 0:1] < 0.0).astype(jnp.int32)
                        + 4 * (rdz_s[a:b, 0:1] < 0.0).astype(jnp.int32)
                    ) * 8

                OB0, OB1 = _ob(0, Hf), _ob(Hf, W)
                row_of = lambda w: jnp.maximum(cur_s[w, 0], 0) // 2
                row_of_smem = lambda w: jnp.maximum(cur_smem[w, 0], 0) // 2
                for _u in range(unroll):
                    amt0 = (jnp.maximum(cur0, 0) & 1) * 64 + OB0
                    cur0, q0, qn0 = advance(
                        snode_s[0:Hf, :], cur0, q0, qn0, amt0,
                        (cur0 >= 0) & (qn0 < QCAP), env=env0,
                    )
                    cur_s[0:Hf, :] = cur0
                    if fetch_smem:
                        # mirror half 0's indices while half 1 advances;
                        # both waits precede both SMEM-read stages, so
                        # either DMA's completion order is safe
                        pltpu.make_async_copy(
                            cur_s.at[pl.ds(0, Hf), :],
                            cur_smem.at[pl.ds(0, Hf), :],
                            sem_cur,
                        ).start()
                    else:
                        stage_node_rows(row_of, 0, Hf)
                    amt1 = (jnp.maximum(cur1, 0) & 1) * 64 + OB1
                    cur1, q1, qn1 = advance(
                        snode_s[Hf:W, :], cur1, q1, qn1, amt1,
                        (cur1 >= 0) & (qn1 < QCAP), env=env1,
                    )
                    cur_s[Hf:W, :] = cur1
                    if fetch_smem:
                        pltpu.make_async_copy(
                            cur_s.at[pl.ds(Hf, Hf), :],
                            cur_smem.at[pl.ds(Hf, Hf), :],
                            sem_cur,
                        ).start()
                        for _ in range(2):
                            pltpu.make_async_copy(
                                cur_s.at[pl.ds(0, Hf), :],
                                cur_smem.at[pl.ds(0, Hf), :],
                                sem_cur,
                            ).wait()
                        stage_node_rows(row_of_smem, 0, Hf)
                        stage_node_rows(row_of_smem, Hf, W)
                    else:
                        stage_node_rows(row_of, Hf, W)
                queue_s[0:Hf, :] = q0
                queue_s[Hf:W, :] = q1
                qn_s[0:Hf, :] = qn0
                qn_s[Hf:W, :] = qn1
                qn = qn_s[...]
                nxt = cur_s[...]
            else:
                for _u in range(unroll):
                    if _u > 0:
                        cur_s[...] = cur
                        if fetch_smem:
                            # one DMA + SMEM-speed index reads replace
                            # 128 serialized vector->scalar transfers
                            cp = pltpu.make_async_copy(
                                cur_s, cur_smem, sem_cur
                            )
                            cp.start()
                            cp.wait()
                            stage_node_rows(
                                lambda w: jnp.maximum(
                                    cur_smem[w, 0], 0
                                ) // 2
                            )
                        else:
                            stage_node_rows(
                                lambda w: jnp.maximum(cur_s[w, 0], 0)
                                // 2
                            )
                    amt = (jnp.maximum(cur, 0) & 1) * 64 + OB
                    cur, q, qn = advance(snode_s[...], cur, q, qn, amt,
                                         (cur >= 0) & (qn < QCAP))
                nxt = cur
        if not dual:
            cur_s[...] = cur
            queue_s[...] = q
            qn_s[...] = qn
        if stats:
            ctr_smem[7] = ctr_smem[7] + (jnp.sum(qn) - qn0_sum)
        if pipe and not dual:
            # pipelined fetch for the NEXT iteration: the 128 serialized
            # scalar reads + row copies issue here, BEFORE the flush /
            # service vector work, so the scalar unit's walk down cur_s
            # overlaps the VPU's queue rolls. Measured (strand_ab,
            # docs/PROFILE_r4.md): 5-8% on captured closest waves (b1c
            # 18.6 -> 17.7 ms, b2c 14.4 -> 13.5), flat on the shadow
            # wave; bit-identical on all four waves. install() re-stages
            # the root row for refilled walkers, so service (which runs
            # after this) stays consistent.
            if ribbon:
                for w in range(W):
                    c = jnp.maximum(cur_s[w, 0], 0)
                    snode_s[w : w + 1, :] = tree_ref[
                        pl.ds(obase_smem[w] + c // 16, 1), :
                    ]
            else:
                stage_node_rows(
                    lambda w: jnp.maximum(cur_s[w, 0], 0) // 2
                )
        if smem_cur:
            # mirror the new fetch indices into SMEM; the copy overlaps
            # the queue/flush phases and is waited before service (whose
            # install() scalar-writes cur_smem AFTER the wait, so the
            # refill reset can never be overwritten by a stale copy)
            pltpu.make_async_copy(cur_s, cur_smem, sem_cur).start()
        # 5) flush policy: the block kernel's "flush when EVERY walker
        #    is finished-or-queued" almost never fires under persistent
        #    refill (a just-refilled walker is never ready), so queues
        #    hit QCAP and the kernel devolves into a flush-per-step MT
        #    storm (first hardware run: b2c 208 ms vs 29). Flush instead
        #    at a queued-occupancy threshold (3/4 of walkers serve per
        #    MT pass), when nobody is mid-walk (drain), or on overflow.
        #    Deferral still only delays best-t shrink: committed sets
        #    are unchanged (lowest-slot ties).
        #    The whole decision region (its five vector->scalar
        #    reductions are the measured control floor) runs only on
        #    control rounds: body iterations with it % ctl_every == 0 —
        #    a scalar gate on the loop carry, free of vector sync.
        ctl_fire = (
            (it & (ctl_every - 1)) == 0 if ctl_every > 1
            else jnp.bool_(True)
        )

        @pl.when(ctl_fire)
        def _():
            n_q = jnp.sum((qn > 0).astype(jnp.int32))
            do_leaf = (
                (n_q >= max(int(flush_occ * W), 1))
                | ((n_q > 0) & jnp.logical_not(jnp.any(nxt >= 0)))
                | (jnp.max(qn) >= QCAP)
            )

            @pl.when(do_leaf)
            def _():
                if stats:
                    ctr_smem[3] = ctr_smem[3] + 1
                # pop up to flush_pop heads per walker: pass p runs only
                # while some queue still holds > p entries (one scalar
                # reduction per extra pass, paid only at flushes)
                qn_at_entry = jnp.max(qn_s[...]) if flush_pop > 1 else None
                for p in range(flush_pop):
                    def pop_pass():
                        qf = queue_s[...]
                        qnf = qn_s[...]
                        popped = qnf > 0
                        if stats:
                            ctr_smem[6] = ctr_smem[6] + jnp.sum(
                                popped.astype(jnp.int32)
                            )
                        pend_s[...] = jnp.where(popped, qf[:, 0:1], -1)
                        queue_s[...] = jnp.where(
                            popped, pltpu.roll(qf, 127, 1), qf
                        )
                        qn_s[...] = qnf - popped.astype(jnp.int32)
                        if smem_pend:
                            pltpu.make_async_copy(
                                pend_s, pend_smem, sem_pend
                            ).start()
                            ctr_smem[2] = 1
                        else:
                            leaf_phase()

                    if p == 0:
                        pop_pass()
                    else:
                        @pl.when(qn_at_entry > p)
                        def _():
                            pop_pass()

        if smem_cur:
            pltpu.make_async_copy(cur_s, cur_smem, sem_cur).wait()

        # 6) service: batch-refill walkers whose strand completed (walk
        #    terminated AND leaf queue drained). Fires when >= service_k
        #    walkers wait, or when nobody is mid-walk/mid-queue (drain
        #    tail + small waves), so the predicated scalar blocks stay
        #    off the hot step path. Gated to control rounds like the
        #    flush (a finished walker waits < ctl_every iterations).
        def _service_round():
            cur_now = cur_s[...]
            qn_now = qn_s[...]
            need_v = (cur_now < 0) & (qn_now == 0) & (act_s[...] == 1)
            if smem_pend:
                # a popped-but-untested walker (deferred leaf in flight)
                # must not refill: its staged result would miss the last
                # leaf
                need_v = need_v & (pend_s[...] < 0)
            n_need = jnp.sum(need_v.astype(jnp.int32))
            others_busy = jnp.any((cur_now >= 0) | (qn_now > 0))
            do_service = (n_need >= service_k) | (
                (n_need > 0) & jnp.logical_not(others_busy)
            )

            @pl.when(do_service)
            def _():
                if stats:
                    ctr_smem[4] = ctr_smem[4] + 1
                # pass 1: stage + start all out/in copies (they overlap
                # across the whole service batch)
                for w in range(W):
                    needs = (
                        (cur_s[w, 0] < 0) & (qn_s[w, 0] == 0)
                        & (act_s[w, 0] == 1)
                    )
                    if smem_pend:
                        # read pend_s (VMEM), NOT the mirror: the mirror's
                        # DMA from this iteration's flush may not have landed
                        # yet. The slow vector->scalar read is fine here —
                        # service fires once per ~service_k walker refills.
                        needs = needs & (pend_s[w, 0] < 0)

                    @pl.when(needs)
                    def _(w=w):
                        stt_s[w : w + 1, :] = bt_s[w : w + 1, :]
                        sti_s[w : w + 1, :] = btr_s[w : w + 1, :]
                        out_row = sid_smem[w]
                        pltpu.make_async_copy(
                            stt_s.at[pl.ds(w, 1), :],
                            t_ref.at[pl.ds(out_row, 1), :],
                            sem_out,
                        ).start()
                        pltpu.make_async_copy(
                            sti_s.at[pl.ds(w, 1), :],
                            tri_ref.at[pl.ds(out_row, 1), :],
                            sem_out,
                        ).start()
                        s_next = ctr_smem[0]

                        @pl.when(s_next < n_strands)
                        def _(w=w, s_next=s_next):
                            ctr_smem[0] = s_next + 1
                            sid_smem[w] = s_next
                            flags_smem[w] = 1  # serviced + refilled
                            pltpu.make_async_copy(
                                rays_ref.at[pl.ds(8 * s_next, 8), :],
                                stin_s.at[pl.ds(8 * w, 8), :],
                                sem_in,
                            ).start()

                        @pl.when(s_next >= n_strands)
                        def _(w=w):
                            act_s[w : w + 1, 0:1] = jnp.zeros(
                                (1, 1), jnp.int32
                            )
                            sid_smem[w] = -1
                            flags_smem[w] = 2  # serviced + parked
                            ctr_smem[1] = ctr_smem[1] + 1

                # pass 2: drain THIS batch's out-copies (shared semaphore:
                # waits match starts 1:1; staging reuse is safe afterwards)
                for w in range(W):
                    @pl.when(flags_smem[w] >= 1)
                    def _(w=w):
                        pltpu.make_async_copy(
                            stt_s.at[pl.ds(w, 1), :],
                            t_ref.at[pl.ds(0, 1), :],
                            sem_out,
                        ).wait()
                        pltpu.make_async_copy(
                            sti_s.at[pl.ds(w, 1), :],
                            tri_ref.at[pl.ds(0, 1), :],
                            sem_out,
                        ).wait()

                # pass 3: wait the in-copies and install the new strands
                for w in range(W):
                    @pl.when(flags_smem[w] == 1)
                    def _(w=w):
                        pltpu.make_async_copy(
                            rays_ref.at[pl.ds(0, 8), :],
                            stin_s.at[pl.ds(8 * w, 8), :],
                            sem_in,
                        ).wait()
                        install(w)
                        if stats:
                            ctr_smem[5] = ctr_smem[5] + 1

                for w in range(W):
                    @pl.when(flags_smem[w] >= 1)
                    def _(w=w):
                        flags_smem[w] = 0

        if ctl_every > 1:
            @pl.when(ctl_fire)
            def _():
                _service_round()
        else:
            _service_round()

        # the parked count rides the carry: Pallas while conditions are
        # pure jax over carries, so SMEM state is sampled at body exit
        return it + 1, ctr_smem[1]

    def cond(carry):
        it, parked = carry
        return (parked < W) & (it < max_iters)

    final_it, _ = lax.while_loop(cond, body, (jnp.int32(0), ctr_smem[1]))
    # no post-loop drain needed: every service batch waits its own
    # out-copies before the next step
    if stats:
        stats_ref[0] = final_it
        stats_ref[1] = ctr_smem[3]  # flushes
        stats_ref[2] = ctr_smem[4]  # services
        stats_ref[3] = ctr_smem[5]  # installs
        stats_ref[4] = ctr_smem[6]  # leaf pops
        stats_ref[5] = ctr_smem[7]  # enqueues
        stats_ref[6] = 0
        stats_ref[7] = 0


@functools.partial(
    jax.jit,
    static_argnames=("tmin", "any_hit", "interpret", "walkers",
                     "service_k", "flush_occ", "mixed", "shadow_tmin",
                     "smem_cur", "smem_pend", "pipe", "ribbon_rpo",
                     "ribbon_k", "stats", "unroll", "ctl_every",
                     "flush_pop", "tree_any", "dual", "fetch_smem"),
)
def strand_query_persistent(
    tree_rows,
    leaf_tris,
    rox, roy, roz,
    rdx, rdy, rdz,
    tmax,
    tmin: float = 0.001,
    any_hit: bool = False,
    interpret: bool = False,
    walkers: int = 128,
    service_k: int = 16,
    flush_occ: float = 0.75,
    smask=None,
    mixed: bool = False,
    shadow_tmin: float = 0.0,
    smem_cur: bool = False,
    smem_pend: bool = False,
    pipe: bool = False,
    ribbon_rpo: int = 0,
    ribbon_k: int = 4,
    stats: bool = False,
    unroll: int = 1,
    ctl_every: int = 1,
    flush_pop: int = 1,
    tree_any: bool = False,
    dual: bool = False,
    fetch_smem: bool = False,
):
    """Trace R rays (coherence-sorted; consecutive 128 = one strand)
    with W persistent walkers refilling from an on-device strand queue.
    Same contract and bit-identical results as strand_query.

    ``ribbon_rpo > 0`` selects the ribbon layout (``tree_rows`` must then
    be RibbonTree.rows with that rows_per_oct): per-octant pre-order
    renumbered rows of 16 nodes, walked with up to ``ribbon_k`` sub-steps
    per fetched row. The node-visit sequence per strand is identical to
    the strand layout's, so results stay bit-identical (sub-stepping only
    delays best-t shrink / flush timing, which the deferred-queue
    argument already covers).

    ``pipe`` supersedes ``smem_cur``: the pipelined fetch reads cur_s
    directly, so the SMEM mirror would be dead weight (its per-step
    mirror DMA start/wait would still be paid) — the combination is
    normalised to pipe-only here.

    ``mixed=True`` (deferred NEE): ``smask`` flags per-RAY any-hit
    lanes — one launch serves a bounce's shadow wave and the next
    bounce's continuation wave after one shared coherence sort; any-hit
    lanes use ``shadow_tmin`` (the reference shoots shadows from t=0,
    src/shader.wgsl:174-186) while closest lanes keep ``tmin``.

    ``tree_any=True`` keeps ``tree_rows`` and ``leaf_tris`` in HBM
    (memory_space=ANY) and fetches rows per walk step via overlapped
    async copies — the beyond-VMEM scene route (the reference scales the
    same way to whatever GPU memory holds, src/state.rs:1145-1246).
    ``leaf_tris`` must then be padded to 128 lanes (the factory does)."""
    smem_cur = smem_cur and not pipe  # see docstring
    if tree_any:
        assert leaf_tris.shape[1] == 128, (
            "tree_any needs 128-lane leaf rows (pad leaf_tris)"
        )
    r = rox.shape[0]
    r_pad = -(-r // 128) * 128

    def padr(a, fill):
        if r_pad == r:
            return a
        return jnp.concatenate([a, jnp.full((r_pad - r,), fill, a.dtype)])

    tmax = padr(jnp.broadcast_to(tmax, (r,)), -jnp.inf)
    rox, roy, roz = padr(rox, 0.0), padr(roy, 0.0), padr(roz, 0.0)
    rdx, rdy, rdz = padr(rdx, 1.0), padr(rdy, 1.0), padr(rdz, 1.0)
    n_strands = r_pad // 128
    if mixed:
        pad_row = padr(jnp.asarray(smask, jnp.float32), 0.0)
    else:
        pad_row = jnp.zeros((r_pad,), jnp.float32)
    # strand s rows 8s..8s+7: rox roy roz rdx rdy rdz tmax smask/pad
    rays8 = jnp.stack(
        [rox, roy, roz, rdx, rdy, rdz, tmax, pad_row]
    ).reshape(8, n_strands, 128).transpose(1, 0, 2).reshape(-1, 128)

    kernel = functools.partial(
        _persistent_kernel,
        n_strands=n_strands,
        tmin=tmin,
        any_hit=any_hit,
        walkers=walkers,
        service_k=service_k,
        flush_occ=flush_occ,
        mixed=mixed,
        shadow_tmin=shadow_tmin,
        smem_cur=smem_cur,
        smem_pend=smem_pend,
        pipe=pipe,
        ribbon_rpo=ribbon_rpo,
        ribbon_k=ribbon_k,
        stats=stats,
        unroll=unroll,
        ctl_every=ctl_every,
        flush_pop=flush_pop,
        tree_any=tree_any,
        dual=dual,
        fetch_smem=fetch_smem,
        # generous step bound: every strand could walk every node twice
        # before this trips (a debugging backstop, not a scheduler limit)
        max_iters=max(1_000_000, n_strands * 64),
    )
    out_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_strands, 128), jnp.float32),
        jax.ShapeDtypeStruct((n_strands, 128), jnp.int32),
    ]
    if stats:
        # event counters for the cost-model decomposition
        # (benchmarks/step_bench.py unit costs x these counts):
        # [iterations, flushes, services, installs, leaf pops, enqueues]
        out_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        out_shape.append(jax.ShapeDtypeStruct((8,), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(
                memory_space=pl.ANY if tree_any else pltpu.VMEM
            ),
            pl.BlockSpec(
                memory_space=pl.ANY if tree_any else pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((walkers, 128), jnp.float32),  # rox
            pltpu.VMEM((walkers, 128), jnp.float32),  # roy
            pltpu.VMEM((walkers, 128), jnp.float32),  # roz
            pltpu.VMEM((walkers, 128), jnp.float32),  # rdx
            pltpu.VMEM((walkers, 128), jnp.float32),  # rdy
            pltpu.VMEM((walkers, 128), jnp.float32),  # rdz
            pltpu.VMEM((walkers, 128), jnp.float32),  # tmax
            pltpu.VMEM((walkers, 128), jnp.float32),  # idx
            pltpu.VMEM((walkers, 128), jnp.float32),  # idy
            pltpu.VMEM((walkers, 128), jnp.float32),  # idz
            pltpu.VMEM((walkers, 128), jnp.float32),  # best t
            pltpu.VMEM((walkers, 128), jnp.int32),  # best tri
            pltpu.VMEM((walkers, 128), jnp.float32),  # stage t
            pltpu.VMEM((walkers, 128), jnp.int32),  # stage tri
            pltpu.VMEM((walkers * 8, 128), jnp.float32),  # stage in
            pltpu.VMEM((walkers, 128), jnp.float32),  # snode
            pltpu.VMEM((walkers, 128), jnp.float32),  # sleaf
            pltpu.VMEM((walkers, 128), jnp.int32),  # leaf queue
            pltpu.VMEM((walkers, 1), jnp.int32),  # queue depth
            pltpu.VMEM((walkers, 1), jnp.int32),  # cur node
            pltpu.VMEM((walkers, 1), jnp.int32),  # pending leaf
            pltpu.VMEM((walkers, 1), jnp.int32),  # active flag
            pltpu.VMEM((walkers, 128), jnp.float32),  # any-hit flags
            pltpu.SMEM((walkers,), jnp.int32),  # strand id
            pltpu.SMEM((walkers,), jnp.int32),  # have_out/refilled
            pltpu.SMEM((8,), jnp.int32),  # next strand / parked / leaf
            #   + stats counters (flushes/services/installs/pops/enq)
            pltpu.SMEM((walkers, 1), jnp.int32),  # cur mirror
            pltpu.SMEM((walkers, 1), jnp.int32),  # pend mirror
            pltpu.SMEM((walkers,), jnp.int32),  # ribbon octant row base
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),  # sem_tree (tree_any)
            pltpu.SemaphoreType.DMA(()),  # sem_leaf (tree_any)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )(tree_rows, leaf_tris, rays8)
    t, tri = outs[0], outs[1]
    if stats:
        return t.reshape(r_pad)[:r], tri.reshape(r_pad)[:r], outs[2]
    return t.reshape(r_pad)[:r], tri.reshape(r_pad)[:r]
