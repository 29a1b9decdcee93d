"""Subprocess body for the tree_any (HBM-table) equivalence test.

Run by tests/test_strand.py::test_persistent_tree_any_matches_strand in
a CHILD process: XLA:CPU's compiler segfaults flakily on the tree_any
interpret program when it compiles late in a long single-process pytest
run (observed twice at the same test in the full r5 suite; the same
compile is clean in a fresh process). Isolating the compile keeps a
compiler crash from killing the whole suite and lets the parent retry.

Usage: python tree_any_check.py W SERVICE_K UNROLL CTL POP ANY_HIT
Exits 0 on bit-identity, 1 on mismatch; any other status = crash.
"""

import os
import sys

sys.path.insert(
    0,
    os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ),
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    walkers, service_k, unroll, ctl, pop, any_hit = (
        int(x) for x in sys.argv[1:7]
    )
    from raytpu.accel.bvh import build_bvh
    from raytpu.accel.strandtree import build_strand_tree
    from raytpu.kernels.strand import strand_query
    from raytpu.kernels.strand_persistent import strand_query_persistent
    from tests.test_strand import _leaf_rows, _rays, _scene, _sort_octant

    p0, e1, e2 = _scene(600, seed=11)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ro, rd = _rays(4096, seed=7)
    ro, rd = _sort_octant(ro, rd)
    leaf, *_ = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(4096, 3.40282347e38, np.float32)
    tmax[::9] = -np.inf
    if any_hit:
        tmax = np.where(tmax > 0, 4.0, tmax).astype(np.float32)
    args = (jnp.asarray(tree.rows), jnp.asarray(leaf),
            *(jnp.asarray(ro[:, a]) for a in range(3)),
            *(jnp.asarray(rd[:, a]) for a in range(3)),
            jnp.asarray(tmax))
    tmin = 0.0 if any_hit else 0.001
    t_ref, tri_ref = strand_query(
        *args, tmin=tmin, any_hit=bool(any_hit), interpret=True
    )
    leaf128 = jnp.pad(
        jnp.asarray(leaf), ((0, 0), (0, 128 - leaf.shape[1]))
    )
    t_p, tri_p = strand_query_persistent(
        args[0], leaf128, *args[2:], tmin=tmin, any_hit=bool(any_hit),
        interpret=True, walkers=walkers, service_k=service_k, pipe=True,
        unroll=unroll, ctl_every=ctl, flush_pop=pop, tree_any=True,
    )
    if any_hit:
        ok = bool(
            ((np.asarray(tri_p) >= 0) == (np.asarray(tri_ref) >= 0)).all()
        )
    else:
        ok = bool(
            (np.asarray(tri_p) == np.asarray(tri_ref)).all()
            and (np.asarray(t_p) == np.asarray(t_ref)).all()
        )
    print("OK" if ok else "MISMATCH", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
