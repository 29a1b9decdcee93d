#!/usr/bin/env python
"""Steady-state cost of the engine's coherence sorts at headline width.

The frame profile attributes ~30% of the headline frame to lax.sort ops
plus spill slices, but xplane spans over-count overlapped async work —
this tool measures the real marginal cost: chained device-side repeats
of the exact sort shapes the engine issues per bounce (in-sort 8/9
operands, unsort 2 operands, 2,088,960 rows).

    python benchmarks/sort_bench.py [--rows 2088960] [--inner 8]
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
    ap.add_argument("--rows", type=int, default=2_088_960)
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    args = ap.parse_args()

    r = args.rows
    rng = np.random.default_rng(1)
    key = jnp.asarray(rng.integers(0, 1 << 21, r, dtype=np.int32))
    cols = [jnp.asarray(rng.random(r, dtype=np.float32)) for _ in range(10)]
    idx = jax.lax.iota(jnp.int32, r)

    @jax.jit
    def probe(x):
        return x + 1.0

    float(probe(jnp.float32(0)))
    floor = min(
        _timed(lambda: float(probe(jnp.float32(i)))) for i in range(6)
    )
    log(f"[sort] RPC floor {floor * 1e3:.1f} ms, rows {r}")

    def time_chain(name, n_payload):
        @jax.jit
        def chain(k):
            out = None
            for i in range(args.inner):
                out = jax.lax.sort(
                    (k,) + tuple(cols[:n_payload]) + (idx,), num_keys=1
                )
                # dependency chain: perturb the key with a runtime zero
                # XLA cannot fold (idx outputs are >= 0, but the compiler
                # can't prove it) and vary the key so repeats can't CSE
                k = (key + i + 1) + jnp.minimum(out[-1][0], 0)
            return out[0], out[-1]

        jax.block_until_ready(chain(key))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(key))
            times.append((time.perf_counter() - t0 - floor) / args.inner)
        dt = float(np.median(times))
        print(f"| {name} | {n_payload + 2} ops | {dt * 1e3:7.2f} ms |",
              flush=True)
        return dt

    print("| sort | operands | ms |")
    print("|---|---|---|")
    t_in9 = time_chain("in-sort (shadow: key+p3+d3+tmax+idx)", 7)
    t_in8 = time_chain("in-sort (closest: key+ro3+rd3+idx)", 6)
    t_un = time_chain("unsort (si+payload)", 0)
    time_chain("10-op (carry-compact sort half)", 8)
    time_chain("11-op (spill cliff probe)", 9)
    per_bounce = t_in9 + t_in8 + 2 * t_un
    log(f"[sort] per-bounce total {per_bounce * 1e3:.1f} ms, "
        f"x3.5 bounce-equivalents ~= {per_bounce * 3.5 * 1e3:.0f} ms/frame")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
