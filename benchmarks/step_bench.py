#!/usr/bin/env python
"""Decompose the persistent strand kernel's per-iteration cost.

The ribbon A/B (docs/PROFILE_r4.md) showed the walker-step floor is NOT
the serialized scalar fetch — so which vector op is it? This microbench
times an isolated Pallas kernel that runs T iterations of each
structural piece of the per-step body on dummy (W, 128) VMEM state:

  full    — roll chain (4 conditional rolls) + slab test + link select +
            queue LIFO roll: the whole advance() shape
  noroll  — full minus the 4-roll chain (predicts a roll-free layout)
  roll2   — 2 conditional rolls (predicts the 4-node x4-replicated
            per-octant layout: roll bits 3-4 only, memory x2)
  slab    — slab test + link select only (no roll, no queue)
  rollq   — roll chain + queue only (no slab)
  fetch   — the serialized 128-iteration scalar fetch loop only
            (dynamic-slice row copies VMEM -> VMEM, what pipe overlaps)
  mt      — one full leaf_phase: serialized per-walker leaf-row fetch +
            the 8-slot Moller-Trumbore pass at (W, 128) + best updates
            (cost is per FLUSH, so divide by leaves served per flush)
  install — one walker install(): 7 staged row copies + 3 safe-inverse
            rows + state init (cost is per REFILL)

Numbers are cycles per walker-step at 940 MHz (v5e), RPC floor
subtracted, median of chained repeats. The arms do NOT compute real
traversal (state is dummy and data-independent across iterations except
through a carried value that defeats CSE/DCE) — this is a COST model,
bit-exactness is irrelevant here.

    python benchmarks/step_bench.py [--walkers 128] [--iters 2000]
"""

from __future__ import annotations

import argparse
import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _kernel(tree_ref, out_ref, scratch, idx_ref, mir_ref, mir_sem,
            arm: str, iters: int, W: int):
    LANE = jax.lax.broadcasted_iota(jnp.int32, (W, 128), 1)
    scratch[...] = tree_ref[0:W, :]

    def body(i, _):
        S0 = scratch[...]
        # a data-dependent roll amount / cur value that the compiler
        # cannot constant-fold (derived from the carried state)
        cur = (S0[:, 0:1] * 1e6).astype(jnp.int32) & 1023
        amt = (cur & 15) * 8
        S = S0
        if arm in ("full", "rollq"):
            for b in (3, 4, 5, 6):
                S = jnp.where(
                    (amt & (1 << b)) != 0,
                    pltpu.roll(S, 128 - (1 << b), 1), S,
                )
        elif arm == "roll2":
            for b in (3, 4):
                S = jnp.where(
                    (amt & (1 << b)) != 0,
                    pltpu.roll(S, 128 - (1 << b), 1), S,
                )
        acc = S[:, 0:1] * 0.0
        if arm in ("full", "noroll", "roll2", "slab"):
            HITL = S[:, 6:7].astype(jnp.int32)
            MISSL = S[:, 7:8].astype(jnp.int32)
            IDX = S0 + 1.0
            NEG = IDX < 0.5
            RO = S0 * 0.25
            lox = (jnp.where(NEG, S[:, 3:4], S[:, 0:1]) - RO) * IDX
            hix = (jnp.where(NEG, S[:, 0:1], S[:, 3:4]) - RO) * IDX
            loy = (jnp.where(NEG, S[:, 4:5], S[:, 1:2]) - RO) * IDX
            hiy = (jnp.where(NEG, S[:, 1:2], S[:, 4:5]) - RO) * IDX
            loz = (jnp.where(NEG, S[:, 5:6], S[:, 2:3]) - RO) * IDX
            hiz = (jnp.where(NEG, S[:, 2:3], S[:, 5:6]) - RO) * IDX
            near = jnp.maximum(jnp.maximum(lox, loy),
                               jnp.maximum(loz, 0.001))
            far = jnp.minimum(jnp.minimum(hix, hiy),
                              jnp.minimum(hiz, 1e30))
            HIT = near <= far
            hit_any = jnp.any(HIT, axis=1, keepdims=True)
            IS_LEAF = HITL < 0
            pend = jnp.where(hit_any & IS_LEAF, ~HITL, -1)
            nxt = jnp.where(hit_any & jnp.logical_not(IS_LEAF),
                            HITL, MISSL)
            acc = acc + nxt.astype(jnp.float32) * 1e-9
        else:
            pend = cur - 1
        if arm in ("full", "rollq"):
            enq = pend >= 0
            q = scratch[...]
            q = jnp.where(enq, pltpu.roll(q, 1, 1), q)
            q = jnp.where(enq & (LANE == 0),
                          pend.astype(jnp.float32), q)
            acc = acc + q[:, 0:1] * 1e-12
        if arm == "fetch":
            for w in range(W):
                c = (cur[0, 0] + w) & 1023
                scratch[w : w + 1, :] = tree_ref[pl.ds(c, 1), :]
            acc = acc + scratch[0:1, 0:1]
        if arm == "mt":
            # the persistent kernel's leaf_phase shape: W serialized
            # leaf-row fetches + LEAF_SIZE Moller-Trumbore slots on
            # (W, 128) state (kernels/strand_persistent.py leaf_phase)
            for w in range(W):
                lr = (cur[0, 0] + w) & 1023
                scratch[w : w + 1, :] = tree_ref[pl.ds(lr, 1), :]
            L = scratch[...]
            RO = S0 * 0.25
            RD = S0 + 1.0
            best_t = S0[:, 8:9] + 1e3
            best_tri = (S0[:, 9:10] * 10.0).astype(jnp.int32)
            for k in range(8):
                b = 10 * k
                p0 = L[:, b : b + 1]
                e1 = L[:, b + 3 : b + 4]
                e2 = L[:, b + 6 : b + 7]
                # same op count as the real pass: 3 cross products,
                # 3 dots, det/inv, u/v/t, range + tie-break compares —
                # expressed on (W,1) columns broadcast over the 128-wide
                # rows exactly like the real kernel's L columns
                pvx = RD * e2 - RD * p0
                pvy = RD * e1 - RD * e2
                pvz = RD * p0 - RD * e1
                det = e1 * pvx + e2 * pvy + p0 * pvz
                inv = 1.0 / det
                tvx = RO - p0
                tvy = RO - e1
                tvz = RO - e2
                u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                qx = tvy * e2 - tvz * e1
                qy = tvz * p0 - tvx * e2
                qz = tvx * e1 - tvy * p0
                v = (RD * qx + RD * qy + RD * qz) * inv
                t = (e2 * qx + e1 * qy + p0 * qz) * inv
                ok = (
                    (det != 0.0) & (u >= 0.0) & (v >= 0.0)
                    & (u + v <= 1.0) & (t >= 0.001)
                    & ((t < best_t) | ((t == best_t)
                                       & (cur + k < best_tri)))
                )
                best_t = jnp.where(ok, t, best_t)
                best_tri = jnp.where(ok, cur + k, best_tri)
            # reduce to a column for the carry (max keeps every lane live)
            acc = acc + (
                jnp.max(best_t, axis=1, keepdims=True)
                + jnp.max(best_tri.astype(jnp.float32), axis=1,
                          keepdims=True)
            ) * 1e-12
        if arm == "fetchdep":
            # the IN-SITU fetch: each scalar row-index read depends on a
            # (W,1) value the VPU wrote THIS iteration (the real kernel
            # reads cur_s right after advance stores it) — measures the
            # vector->scalar dependency stall the plain `fetch` arm
            # (strided from one read) does not pay
            idxv = ((S0[:, 0:1] * 1e6).astype(jnp.int32) & 1023)
            idx_ref[...] = idxv  # VPU store the scalar unit must see
            for w in range(W):
                c = idx_ref[w, 0] & 1023
                scratch[w : w + 1, :] = tree_ref[pl.ds(c, 1), :]
            acc = acc + scratch[0:1, 0:1]
        if arm == "fetchmir":
            # mirror-fetch: same dependent indices, but moved to SMEM by
            # ONE DMA (wait once) and read from there (~1 cycle/read)
            idxv = ((S0[:, 0:1] * 1e6).astype(jnp.int32) & 1023)
            idx_ref[...] = idxv
            cp = pltpu.make_async_copy(idx_ref, mir_ref, mir_sem)
            cp.start()
            cp.wait()
            for w in range(W):
                c = mir_ref[w, 0] & 1023
                scratch[w : w + 1, :] = tree_ref[pl.ds(c, 1), :]
            acc = acc + scratch[0:1, 0:1]
        if arm == "ctl":
            # the per-iteration flush/service DECISION logic (kernel body
            # steps 5-6 minus the taken branches): five vector->scalar
            # reductions feeding two data-dependent @pl.when branches.
            # This is the overhead a check-every-K unroll amortizes.
            qn = (S0[:, 1:2] * 3.0).astype(jnp.int32) & 7
            nxt = cur - 512  # ~half negative
            n_q = jnp.sum((qn > 0).astype(jnp.int32))
            do_leaf = (
                (n_q >= 2 * W)  # rarely true, data-dependent
                | ((n_q > 0) & jnp.logical_not(jnp.any(nxt >= 0)))
                | (jnp.max(qn) >= 128)
            )

            @pl.when(do_leaf)
            def _():
                scratch[0:1, 0:1] = scratch[0:1, 0:1] + 1.0

            need_v = (nxt < -2048) & (qn == 0)
            n_need = jnp.sum(need_v.astype(jnp.int32))
            others_busy = jnp.any((nxt >= 0) | (qn > 0))
            do_service = (n_need >= 2 * W) | (
                (n_need > 0) & jnp.logical_not(others_busy)
            )

            @pl.when(do_service)
            def _():
                scratch[0:1, 1:2] = scratch[0:1, 1:2] + 1.0

            acc = acc + n_q.astype(jnp.float32) * 1e-12
        if arm == "install":
            # one walker's install(): 7 row moves + 3 safe-inv rows +
            # best/queue init, repeated for ONE walker per iteration
            w = 0
            for src in range(7):
                scratch[w : w + 1, :] = tree_ref[
                    pl.ds((cur[0, 0] + src) & 1023, 1), :
                ]
            row = scratch[w : w + 1, :]
            safe = 1.0 / jnp.where(
                row == 0.0, jnp.where(1.0 / row < 0.0, -1e-36, 1e-36), row
            )
            scratch[w : w + 1, :] = safe
            acc = acc + safe[0:1, 0:1] * 1e-20
        # carry a perturbation back so iterations are serialized
        scratch[0:1, 0:1] = acc[0:1, :] * 1e-20 + scratch[0:1, 0:1]
        return 0

    jax.lax.fori_loop(0, iters, body, 0)
    out_ref[...] = scratch[...]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--walkers", type=int, default=128)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--arms", nargs="*",
                    default=["full", "noroll", "roll2", "slab", "rollq", "ctl",
                             "fetch", "mt", "install"])
    args = ap.parse_args()
    W = args.walkers

    tree = jnp.asarray(
        np.random.default_rng(0).standard_normal((1024, 128), np.float32)
    )

    @jax.jit
    def floor_probe(x):
        return jnp.sum(x)

    float(floor_probe(tree))
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        float(floor_probe(tree))
        ts.append(time.perf_counter() - t0)
    floor = min(ts)
    log(f"[step] RPC floor {floor*1000:.1f} ms")

    print("| arm | ms | cycles/iter | cycles/walker-step |")
    print("|---|---|---|---|")
    for arm in args.arms:
        fn = pl.pallas_call(
            functools.partial(_kernel, arm=arm, iters=args.iters, W=W),
            out_shape=jax.ShapeDtypeStruct((W, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((W, 128), jnp.float32),
                pltpu.VMEM((W, 1), jnp.int32),
                pltpu.SMEM((W, 1), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        run = jax.jit(lambda t, fn=fn: jnp.sum(fn(t)))
        float(run(tree))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(run(tree))
            times.append(time.perf_counter() - t0)
        dt = max(min(times) - floor, 1e-9)
        cyc = dt * 940e6 / args.iters
        print(f"| {arm} | {dt*1000:7.2f} | {cyc:8.1f} | "
              f"{cyc / W:6.2f} |", flush=True)


if __name__ == "__main__":
    main()
