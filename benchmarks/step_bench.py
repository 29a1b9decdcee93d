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


def _kernel(tree_ref, out_ref, scratch, arm: str, iters: int, W: int):
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
                    default=["full", "noroll", "roll2", "slab", "rollq",
                             "fetch"])
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
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((W, 128), jnp.float32)],
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
