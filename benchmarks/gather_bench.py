#!/usr/bin/env python
"""Is the TPU random row gather bytes-bound or row-rate-bound?

The shading path gathers tri_row[tri] — [R, 64] f32 rows from a
[T, 64] table — once per bounce (~30 ms per execution on the headline
frame). Whether slimming the row (fewer columns) can win depends on the
gather's scaling law. Chained device-side repeats, RPC floor subtracted.

    python benchmarks/gather_bench.py [--rows 2088960] [--table 398336]
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
    ap.add_argument("--table", type=int, default=398_336)
    ap.add_argument("--cols", type=int, nargs="*",
                    default=[8, 16, 32, 56, 64, 128])
    ap.add_argument("--inner", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sorted", action="store_true",
                    help="use a sorted (clustered) index set instead of "
                         "uniform random")
    args = ap.parse_args()

    rng = np.random.default_rng(1)
    idx_np = rng.integers(0, args.table, args.rows).astype(np.int32)
    if args.sorted:
        idx_np = np.sort(idx_np)
    idx = jnp.asarray(idx_np)

    @jax.jit
    def probe(x):
        return x + 1.0

    float(probe(jnp.float32(0)))
    floor = min(
        _timed(lambda: float(probe(jnp.float32(i)))) for i in range(6)
    )
    log(f"[gather] RPC floor {floor * 1e3:.1f} ms, rows {args.rows}, "
        f"table {args.table}, sorted={args.sorted}")

    print("| cols | ms | Mrows/s | GB/s |")
    print("|---|---|---|---|")
    for c in args.cols:
        table = jnp.asarray(rng.random((args.table, c), dtype=np.float32))

        @jax.jit
        def chain(i0):
            out = None
            i = i0
            for _ in range(args.inner):
                out = table[i]
                # runtime-zero dependency (out >= 0, unprovable)
                i = i0 + jnp.minimum(
                    out[0, 0].astype(jnp.int32), 0
                )
            return out

        jax.block_until_ready(chain(idx))
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(idx))
            times.append((time.perf_counter() - t0 - floor) / args.inner)
        dt = float(np.median(times))
        gb = args.rows * c * 4 / dt / 1e9
        print(f"| {c} | {dt * 1e3:7.2f} | {args.rows / dt / 1e6:7.1f} | "
              f"{gb:6.1f} |", flush=True)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
