#!/usr/bin/env python
"""Captured-wave A/B harness for the persistent strand kernel.

Times ``strand_query_persistent`` (and the block ``strand_query`` for
reference) on the committed engine waves, median of chained repeats with
the RPC floor subtracted — the committed replacement for the round-3
/tmp scripts that died with the VM. Every persistent-kernel claim in
docs/PROFILE_r3.md should cite this tool.

    python benchmarks/strand_ab.py --waves b1c b2c b2s b3c \
        [--walkers 128] [--service-k 16] [--flush 0.75] [--block] \
        [--repeats 5] [--check]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("RAYTPU_CACHE", os.path.expanduser("~/.raytpu_jaxcache")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=250_000)
    ap.add_argument("--waves", nargs="*", default=["b1c", "b2c", "b2s", "b3c"])
    ap.add_argument("--walkers", type=int, default=128)
    ap.add_argument("--service-k", type=int, default=16)
    ap.add_argument("--flush", type=float, default=0.75)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--smem-cur", action="store_true",
                    help="fetch indices from the SMEM mirror of cur_s")
    ap.add_argument("--smem-pend", action="store_true",
                    help="deferred leaf phase with SMEM pend mirror")
    ap.add_argument("--pipe", action="store_true",
                    help="software-pipelined node fetch (fetch for step "
                         "k+1 issues before step k's queue/flush work)")
    ap.add_argument("--unroll", type=int, default=1,
                    help="walk steps per flush/service decision "
                         "(check-every-K; requires --pipe)")
    ap.add_argument("--ctl-every", type=int, default=1,
                    help="run the flush/service decision block every N "
                         "body iterations (power of two)")
    ap.add_argument("--flush-pop", type=int, default=1,
                    help="pop up to P queue heads per walker per flush")
    ap.add_argument("--fsmem", action="store_true",
                    help="mid-body fetch indices via one cur_s->SMEM "
                         "DMA per sub-step (replaces 128 serialized "
                         "vector->scalar reads)")
    ap.add_argument("--dual", action="store_true",
                    help="dual interleave: two walker half-pools "
                         "alternate so each half's scalar fetch overlaps "
                         "the other half's vector advance")
    ap.add_argument("--hbm", action="store_true",
                    help="tree_any: node/leaf tables in HBM, rows "
                         "fetched via overlapped async copies (the "
                         "beyond-VMEM route, measured on the resident "
                         "scene so the numbers are comparable)")
    ap.add_argument("--ribbon", type=int, default=0, metavar="K",
                    help="ribbon layout with K sub-steps per fetched "
                         "16-node row (0 = strand layout)")
    ap.add_argument("--stats", action="store_true",
                    help="print per-wave event counters (iterations, "
                         "flushes, services, installs, leaf pops, "
                         "enqueues) from the stats kernel variant")
    ap.add_argument("--inner", type=int, default=32,
                    help="device-side chained repeats per timing (waves "
                         "are ~RPC-floor-sized; chaining is the only "
                         "trustworthy sub-50ms timing through the tunnel; "
                         "32 keeps residual floor error < 1 ms even when "
                         "the tunnel floor wobbles by tens of ms)")
    ap.add_argument("--block", action="store_true",
                    help="also time the block strand kernel")
    ap.add_argument("--check", action="store_true",
                    help="assert persistent == block results per wave")
    args = ap.parse_args()

    import bench
    from benchmarks.waves import engine_sort, load_wave
    from raytpu.kernels.strand import strand_query
    from raytpu.kernels.strand_persistent import strand_query_persistent

    _, pack = bench._cached_atrium(args.tris)
    tree = pack.bvh.strand_rows
    leaves = pack.bvh.leaf_tris
    if args.hbm:
        assert not args.ribbon, "tree_any walks the strand layout only"
        leaves_p = jnp.pad(
            jnp.asarray(leaves),
            ((0, 0), (0, 128 - leaves.shape[1])),
        )
    ribbon_rpo = 0
    if args.ribbon:
        assert pack.bvh.ribbon_rows is not None, "pack has no ribbon rows"
        ptree = pack.bvh.ribbon_rows
        ribbon_rpo = ptree.shape[0] // 8
    else:
        ptree = tree

    # RPC floor: cheapest possible device round-trip. The tunnel's floor
    # wobbles (a recovering/cold tunnel measured 25.8 ms vs a steady
    # ~5-10; an inflated floor at --inner 8 once produced NEGATIVE wave
    # times) — warm it with several probes, then take the min of many.
    @jax.jit
    def probe(x):
        return x + 1.0

    for i in range(4):  # compile + tunnel warm
        float(probe(jnp.float32(i)))
    floors = [_timed(lambda: float(probe(jnp.float32(i))))
              for i in range(12)]
    floor = min(floors)
    log(f"[ab] RPC floor {floor * 1e3:.1f} ms "
        f"(median {sorted(floors)[len(floors) // 2] * 1e3:.1f})")

    print("| wave | kernel | ms | Mrays/s |")
    print("|---|---|---|---|")
    for name in args.waves:
        w = load_wave(name)
        any_hit = w["kind"] == "shadow"
        ro, rd, tmax = engine_sort(pack, w["ro"], w["rd"], w["tmax"])
        n = ro.shape[0]
        tmin = float(w["tmin"])

        def persist_q(tm):
            return strand_query_persistent(
                ptree if not args.hbm else tree,
                leaves if not args.hbm else leaves_p,
                ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tm,
                tmin=tmin, any_hit=any_hit,
                walkers=args.walkers, service_k=args.service_k,
                flush_occ=args.flush, smem_cur=args.smem_cur,
                smem_pend=args.smem_pend, pipe=args.pipe,
                ribbon_rpo=ribbon_rpo,
                ribbon_k=args.ribbon if args.ribbon else 4,
                unroll=args.unroll,
                ctl_every=args.ctl_every,
                flush_pop=args.flush_pop,
                tree_any=args.hbm,
                dual=args.dual,
                fetch_smem=args.fsmem,
            )

        def block_q(tm):
            return strand_query(
                tree, leaves, ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tm,
                tmin=tmin, any_hit=any_hit,
            )

        if args.stats:
            t_s, tri_s, st = strand_query_persistent(
                ptree if not args.hbm else tree,
                leaves if not args.hbm else leaves_p,
                ro[:, 0], ro[:, 1], ro[:, 2],
                rd[:, 0], rd[:, 1], rd[:, 2], tmax,
                tmin=tmin, any_hit=any_hit,
                walkers=args.walkers, service_k=args.service_k,
                flush_occ=args.flush, smem_cur=args.smem_cur,
                smem_pend=args.smem_pend, pipe=args.pipe,
                ribbon_rpo=ribbon_rpo,
                ribbon_k=args.ribbon if args.ribbon else 4,
                unroll=args.unroll,
                ctl_every=args.ctl_every,
                flush_pop=args.flush_pop,
                tree_any=args.hbm,
                dual=args.dual,
                fetch_smem=args.fsmem,
                stats=True,
            )
            st = np.asarray(st)
            iters, fl, sv, ins, pops, enq = (int(x) for x in st[:6])
            n_str = -(-n // 128)
            log(f"[stats] {name}: iters={iters} flushes={fl} "
                f"services={sv} installs={ins} pops={pops} enq={enq} "
                f"strands={n_str} "
                f"(walker-steps/strand={iters * args.walkers / n_str:.0f},"
                f" pops/flush={pops / max(fl, 1):.1f},"
                f" iters/flush={iters / max(fl, 1):.2f},"
                f" installs/service={ins / max(sv, 1):.1f})")
            # stats instrumentation must not perturb results
            t_p, tri_p = persist_q(tmax)
            assert (np.asarray(tri_p) == np.asarray(tri_s)).all(), (
                f"{name}: stats variant changed tri"
            )
        arms = [("persist", persist_q)]
        if args.block or args.check:
            arms.append(("block", block_q))
        outs = {}
        for label, q in arms:
            outs[label] = tuple(np.asarray(x) for x in q(tmax))

            @jax.jit
            def chained(tm, _q=q):
                t = tri = None
                for _ in range(args.inner):
                    t, tri = _q(tm)
                    # data-dependency chain: a zero perturbation of tmax
                    # derived from the previous output serializes repeats
                    tm = tm + (t[0] + tri[0]).astype(jnp.float32) * 0.0
                return t, tri

            jax.block_until_ready(chained(tmax))  # compile + warm
            times = []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                jax.block_until_ready(chained(tmax))
                times.append(
                    (time.perf_counter() - t0 - floor) / args.inner
                )
            dt = float(np.median(times))
            mrays = n / dt / 1e6
            print(f"| {name} | {label} | {dt * 1e3:7.2f} | {mrays:7.1f} |",
                  flush=True)
        if args.check and "block" in outs:
            pt, ptri = outs["persist"]
            bt, btri = outs["block"]
            if any_hit:
                # any-hit waves: the BLOCKED BIT is the contract (the
                # engine consumes tri >= 0 only). The committed slot
                # value is schedule-dependent: best_t never shrinks in
                # any-hit mode, so leaves queued before a lane blocked
                # may overwrite best_tri with another blocking slot —
                # and the two kernels flush their queues on different
                # schedules. The bit itself is schedule-independent
                # (an unblocked lane still drives every box on the path
                # to its blockers).
                assert ((ptri >= 0) == (btri >= 0)).all(), (
                    f"{name}: blocked-bit mismatch"
                )
            else:
                assert (ptri == btri).all(), f"{name}: tri mismatch"
                live = ptri >= 0
                assert (pt[live] == bt[live]).all(), f"{name}: t mismatch"
            log(f"[ab] {name}: persistent == block OK")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
