"""Strand kernel correctness: bit-identical to the brute-force sweep and
the packet kernel on random scenes and ray sets (closest + any-hit), per
the cross-engine determinism contract (lowest-slot ties)."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from raytpu.accel.bvh import build_bvh
from raytpu.accel.strandtree import build_strand_tree, validate_strand_tree
from raytpu.kernels.strand import strand_query

from .conftest import isolated


def _scene(ntri, seed=0):
    rng = np.random.default_rng(seed)
    p0 = (rng.random((ntri, 3), np.float32) - 0.5) * 10
    e1 = rng.normal(size=(ntri, 3)).astype(np.float32)
    e2 = rng.normal(size=(ntri, 3)).astype(np.float32)
    return p0, e1, e2


def _rays(n, seed=1, spread=8.0):
    rng = np.random.default_rng(seed)
    ro = (rng.random((n, 3), np.float32) - 0.5) * spread
    rd = rng.normal(size=(n, 3)).astype(np.float32)
    rd /= np.linalg.norm(rd, axis=1, keepdims=True)
    return ro, rd


def _sort_octant(ro, rd):
    """Direction-octant sort so strands share an octant (the engine's
    invariant)."""
    oct_ = (rd[:, 0] < 0) + 2 * (rd[:, 1] < 0) + 4 * (rd[:, 2] < 0)
    idx = np.argsort(oct_, kind="stable")
    return ro[idx], rd[idx]


def _leaf_rows(p0, e1, e2, bvh):
    """(leaf_tris rows, slot-ordered p0/e1/e2 arrays) for the tri order."""
    order = bvh.tri_order
    slots = order.shape[0]
    per = np.zeros((slots, 10), np.float32)
    v = order >= 0
    per[v, 0:3] = p0[order[v]]
    per[v, 3:6] = e1[order[v]]
    per[v, 6:9] = e2[order[v]]
    leaf = per.reshape(slots // bvh.leaf_size, -1)
    return leaf, per[:, 0:3], per[:, 3:6], per[:, 6:9]


def _brute(per_p0, per_e1, per_e2, ro, rd, tmin, tmax, any_hit=False):
    """Oracle: the pure-XLA brute-force sweep in slot order (same compiled
    arithmetic as the kernels — numpy reassociates/fuses differently)."""
    from raytpu.kernels.intersect import (
        intersect_any_bruteforce, intersect_bruteforce,
    )

    args = (jnp.asarray(ro), jnp.asarray(rd), jnp.asarray(per_p0),
            jnp.asarray(per_e1), jnp.asarray(per_e2), jnp.float32(tmin),
            jnp.asarray(tmax))
    if any_hit:
        blocked = intersect_any_bruteforce(*args, chunk=8)
        return None, np.where(np.asarray(blocked), 0, -1)
    hit = intersect_bruteforce(*args, chunk=8)
    return np.asarray(hit.t), np.asarray(hit.tri)


@pytest.mark.parametrize("ntri", [5, 300, 3000])
@pytest.mark.slow
def test_strand_closest_matches_brute(ntri):
    p0, e1, e2 = _scene(ntri)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    validate_strand_tree(tree, bvh)
    ro, rd = _rays(1500, seed=ntri)
    ro, rd = _sort_octant(ro, rd)
    leaf, pp0, pe1, pe2 = _leaf_rows(p0, e1, e2, bvh)

    tmax = np.full(ro.shape[0], 3.40282347e38, np.float32)
    tmax[::7] = -np.inf  # dead lanes
    t, tri = strand_query(
        jnp.asarray(tree.rows), jnp.asarray(leaf),
        *(jnp.asarray(ro[:, a]) for a in range(3)),
        *(jnp.asarray(rd[:, a]) for a in range(3)),
        jnp.asarray(tmax), tmin=0.001, interpret=True,
    )
    bt, btri = _brute(pp0, pe1, pe2, ro, rd, 0.001, tmax)
    t, tri = np.asarray(t), np.asarray(tri)
    # dead lanes must never hit
    assert (tri[::7] == -1).all()
    live = tmax >= 0
    hit = btri >= 0
    np.testing.assert_array_equal(tri[live] >= 0, hit[live])
    # SBVH duplication (native builder) may hold one triangle at several
    # slots; brute tie-breaks over ALL slots, a tree walk only over the
    # visited leaves' slots — so parity is defined at the ORIGINAL
    # triangle, not the slot (the slots carry bit-identical data, so the
    # engine shades identically either way)
    order = bvh.tri_order
    np.testing.assert_array_equal(
        order[np.maximum(tri[live], 0)] * hit[live],
        order[np.maximum(btri[live], 0)] * hit[live],
    )
    # t: interpret-mode (unfused) vs compiled (fused) arithmetic differ by
    # <= 1 ulp — same tolerance precedent as the packet-kernel tests; the
    # engine consumes tri (and recomputed barycentrics), never raw t
    np.testing.assert_allclose(t[live & hit], bt[live & hit], rtol=1e-6)


@pytest.mark.slow
def test_strand_any_hit_matches_brute():
    p0, e1, e2 = _scene(800, seed=3)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ro, rd = _rays(1024, seed=5)
    ro, rd = _sort_octant(ro, rd)
    leaf, pp0, pe1, pe2 = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(1024, 6.0, np.float32)
    tmax[::5] = -np.inf
    _, tri = strand_query(
        jnp.asarray(tree.rows), jnp.asarray(leaf),
        *(jnp.asarray(ro[:, a]) for a in range(3)),
        *(jnp.asarray(rd[:, a]) for a in range(3)),
        jnp.asarray(tmax), tmin=0.0, any_hit=True, interpret=True,
    )
    _, btri = _brute(pp0, pe1, pe2, ro, rd, 0.0, tmax, any_hit=True)
    blocked = np.asarray(tri) >= 0
    np.testing.assert_array_equal(blocked, btri >= 0)


@pytest.mark.parametrize(
    "walkers,service_k,pipe,smem_cur,smem_pend,unroll,ctl_every,flush_pop",
    [
        (8, 2, False, False, False, 1, 1, 1),
        (16, 16, False, False, False, 1, 1, 1),
        # the pipelined fetch re-stages rows on install(): tiny walker
        # counts force many refills so the install()/service restaging
        # interaction is exercised, not just the steady step path
        (8, 2, True, False, False, 1, 1, 1),
        (16, 4, True, False, False, 1, 1, 1),
        (8, 2, False, True, False, 1, 1, 1),
        (8, 2, False, False, True, 1, 1, 1),
        (8, 2, True, True, True, 1, 1, 1),  # pipe supersedes smem_cur
        # check-every-K unroll: tiny walkers + unroll exercises the
        # mid-body refetch, delayed flush/service, and the drain tail
        (8, 2, True, False, False, 4, 1, 1),
        (16, 4, True, False, False, 8, 1, 1),
        (8, 2, True, False, True, 4, 1, 1),  # unroll + deferred leaf mirror
        # control cadence + multi-pop flush: with tiny queues the
        # enqueue gate (stall at QCAP) and the deferred decision rounds
        # must still commit identical sets; unroll 16 > the old
        # "headroom 8" bound exercises the gating specifically
        (8, 2, True, False, False, 4, 4, 1),
        (8, 2, True, False, False, 16, 8, 4),
        (16, 4, True, False, False, 8, 2, 2),
        (8, 2, False, False, False, 1, 4, 2),  # cadence without unroll
    ],
)
@pytest.mark.slow
@isolated
def test_persistent_strand_matches_strand(
    walkers, service_k, pipe, smem_cur, smem_pend, unroll, ctl_every,
    flush_pop,
):
    """The persistent-refill kernel (kernels/strand_persistent.py) must
    be BIT-identical to strand_query: same tree, same per-ray math, only
    the walker->strand schedule differs. Tiny walker counts force many
    refill service events (including the drain tail); the pipe/smem
    variants cover every production fetch/mirror configuration."""
    from raytpu.kernels.strand_persistent import strand_query_persistent

    p0, e1, e2 = _scene(600, seed=11)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ro, rd = _rays(4096, seed=7)
    ro, rd = _sort_octant(ro, rd)
    leaf, *_ = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(4096, 3.40282347e38, np.float32)
    tmax[::9] = -np.inf
    args = (jnp.asarray(tree.rows), jnp.asarray(leaf),
            *(jnp.asarray(ro[:, a]) for a in range(3)),
            *(jnp.asarray(rd[:, a]) for a in range(3)),
            jnp.asarray(tmax))
    t_ref, tri_ref = strand_query(*args, tmin=0.001, interpret=True)
    t_p, tri_p = strand_query_persistent(
        *args, tmin=0.001, interpret=True, walkers=walkers,
        service_k=service_k, pipe=pipe, smem_cur=smem_cur,
        smem_pend=smem_pend, unroll=unroll, ctl_every=ctl_every,
        flush_pop=flush_pop,
    )
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_ref))
    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_ref))


@pytest.mark.parametrize(
    "walkers,service_k,unroll,ctl_every,flush_pop,dual,fsmem",
    [
        (8, 2, 1, 1, 1, True, False),   # dual halves + many refills
        (8, 2, 4, 4, 2, True, False),   # dual + unroll + cadence
        (16, 4, 8, 2, 4, True, False),
        (8, 2, 4, 1, 1, False, True),   # SMEM-mirrored mid-body fetch
        (8, 2, 4, 2, 2, True, True),    # dual + SMEM mirror
    ],
)
@pytest.mark.slow
@isolated
def test_persistent_dual_matches_strand(
    walkers, service_k, unroll, ctl_every, flush_pop, dual, fsmem
):
    """The dual interleave (two alternating walker half-pools) and the
    SMEM-mirrored mid-body fetch must be bit-identical: walkers are
    independent, the variants only change the fetch transport and the
    ordering WITHIN one body iteration's sub-steps."""
    from raytpu.kernels.strand_persistent import strand_query_persistent

    p0, e1, e2 = _scene(600, seed=11)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ro, rd = _rays(4096, seed=7)
    ro, rd = _sort_octant(ro, rd)
    leaf, *_ = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(4096, 3.40282347e38, np.float32)
    tmax[::9] = -np.inf
    args = (jnp.asarray(tree.rows), jnp.asarray(leaf),
            *(jnp.asarray(ro[:, a]) for a in range(3)),
            *(jnp.asarray(rd[:, a]) for a in range(3)),
            jnp.asarray(tmax))
    t_ref, tri_ref = strand_query(*args, tmin=0.001, interpret=True)
    t_p, tri_p = strand_query_persistent(
        *args, tmin=0.001, interpret=True, walkers=walkers,
        service_k=service_k, pipe=True, unroll=unroll,
        ctl_every=ctl_every, flush_pop=flush_pop, dual=dual,
        fetch_smem=fsmem,
    )
    np.testing.assert_array_equal(np.asarray(tri_p), np.asarray(tri_ref))
    np.testing.assert_array_equal(np.asarray(t_p), np.asarray(t_ref))


@pytest.mark.parametrize(
    "walkers,service_k,unroll,ctl_every,flush_pop,any_hit",
    [
        (8, 2, 1, 1, 1, False),    # many refills through DMA'd installs
        (8, 2, 4, 4, 2, False),    # mid-body HBM refetch + cadence
        (16, 4, 8, 2, 4, False),
        (8, 2, 4, 1, 1, True),     # any-hit early-park with HBM rows
    ],
)
@pytest.mark.slow
def test_persistent_tree_any_matches_strand(
    walkers, service_k, unroll, ctl_every, flush_pop, any_hit
):
    """tree_any (HBM node/leaf tables fetched via async copies — the
    beyond-VMEM scene route) must be bit-identical to the VMEM block
    kernel: same rows, same math, only the fetch transport differs.

    Runs in a SUBPROCESS (tests/tools/tree_any_check.py): XLA:CPU's
    compiler segfaults flakily on this interpret program when the
    compile lands late in a long single-process suite (observed twice
    at exactly this test in the full r5 run; clean in a fresh process).
    Child isolation keeps a compiler crash from killing pytest, and a
    crashed child (negative returncode) gets one retry."""
    import subprocess
    import sys

    script = os.path.join(
        os.path.dirname(__file__), "tools", "tree_any_check.py"
    )
    cmd = [sys.executable, script, str(walkers), str(service_k),
           str(unroll), str(ctl_every), str(flush_pop),
           str(int(any_hit))]
    for attempt in (1, 2):
        r = subprocess.run(cmd, capture_output=True, text=True,
                           timeout=900)
        if r.returncode == 0:
            return
        if r.returncode > 0:  # real mismatch/assert, not a crash
            break
    raise AssertionError(
        f"tree_any check rc={r.returncode}\n{r.stdout}\n{r.stderr[-2000:]}"
    )


@pytest.mark.parametrize(
    "ribbon_k,walkers,service_k,pipe",
    [
        (1, 8, 2, False),   # degenerate K: one sub-step per fetch
        (4, 8, 2, False),   # small pool forces many refills
        (4, 16, 4, True),   # production shape: ribbon + pipelined fetch
        (8, 8, 2, True),    # max sub-steps, queue-headroom stalls likely
    ],
)
@pytest.mark.slow
@isolated
def test_persistent_ribbon_matches_strand(ribbon_k, walkers, service_k,
                                          pipe):
    """The ribbon layout (per-octant pre-order renumbering, K sub-steps
    per fetched 16-node row) must stay BIT-identical to strand_query:
    the node-visit sequence per strand is the same, only fetch grouping
    and leaf-enqueue timing differ (the deferred-queue argument covers
    both)."""
    from raytpu.accel.strandtree import (
        build_ribbon_tree, validate_ribbon_tree,
    )
    from raytpu.kernels.strand_persistent import strand_query_persistent

    p0, e1, e2 = _scene(600, seed=11)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ribbon = build_ribbon_tree(bvh)
    validate_ribbon_tree(ribbon, tree, bvh)
    ro, rd = _rays(4096, seed=7)
    ro, rd = _sort_octant(ro, rd)
    leaf, *_ = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(4096, 3.40282347e38, np.float32)
    tmax[::9] = -np.inf
    rays = (*(jnp.asarray(ro[:, a]) for a in range(3)),
            *(jnp.asarray(rd[:, a]) for a in range(3)),
            jnp.asarray(tmax))
    t_ref, tri_ref = strand_query(
        jnp.asarray(tree.rows), jnp.asarray(leaf), *rays,
        tmin=0.001, interpret=True,
    )
    t_r, tri_r = strand_query_persistent(
        jnp.asarray(ribbon.rows), jnp.asarray(leaf), *rays,
        tmin=0.001, interpret=True, walkers=walkers,
        service_k=service_k, pipe=pipe,
        ribbon_rpo=ribbon.rows_per_oct, ribbon_k=ribbon_k,
    )
    np.testing.assert_array_equal(np.asarray(tri_r), np.asarray(tri_ref))
    np.testing.assert_array_equal(np.asarray(t_r), np.asarray(t_ref))


@pytest.mark.slow
@isolated
def test_persistent_ribbon_any_hit_matches_strand():
    """Ribbon any-hit (shadow) blocking must match strand_query; the
    early-park path (all lanes blocked-or-dead) interacts with sub-step
    participation masks."""
    from raytpu.accel.strandtree import build_ribbon_tree
    from raytpu.kernels.strand_persistent import strand_query_persistent

    p0, e1, e2 = _scene(800, seed=3)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ribbon = build_ribbon_tree(bvh)
    ro, rd = _rays(1024, seed=5)
    ro, rd = _sort_octant(ro, rd)
    leaf, *_ = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(1024, 6.0, np.float32)
    tmax[::5] = -np.inf
    rays = (*(jnp.asarray(ro[:, a]) for a in range(3)),
            *(jnp.asarray(rd[:, a]) for a in range(3)),
            jnp.asarray(tmax))
    _, tri_ref = strand_query(
        jnp.asarray(tree.rows), jnp.asarray(leaf), *rays,
        tmin=0.0, any_hit=True, interpret=True,
    )
    _, tri_r = strand_query_persistent(
        jnp.asarray(ribbon.rows), jnp.asarray(leaf), *rays,
        tmin=0.0, any_hit=True, interpret=True, walkers=16,
        service_k=4, ribbon_rpo=ribbon.rows_per_oct, ribbon_k=4,
    )
    np.testing.assert_array_equal(
        np.asarray(tri_r) >= 0, np.asarray(tri_ref) >= 0
    )


@pytest.mark.parametrize("pipe", [False, True])
@pytest.mark.slow
@isolated
def test_persistent_strand_small_wave_and_any_hit(pipe):
    """Waves smaller than the walker pool park the surplus walkers at
    init; any-hit blocking must match strand_query bit-for-bit."""
    from raytpu.kernels.strand_persistent import strand_query_persistent

    p0, e1, e2 = _scene(300, seed=2)
    bvh, _ = build_bvh(p0, e1, e2)
    tree = build_strand_tree(bvh)
    ro, rd = _rays(640, seed=3)  # 5 strands < 16 walkers
    ro, rd = _sort_octant(ro, rd)
    leaf, *_ = _leaf_rows(p0, e1, e2, bvh)
    tmax = np.full(640, 6.0, np.float32)
    tmax[::5] = -np.inf
    args = (jnp.asarray(tree.rows), jnp.asarray(leaf),
            *(jnp.asarray(ro[:, a]) for a in range(3)),
            *(jnp.asarray(rd[:, a]) for a in range(3)),
            jnp.asarray(tmax))
    _, tri_ref = strand_query(*args, tmin=0.0, any_hit=True,
                              interpret=True)
    _, tri_p = strand_query_persistent(
        *args, tmin=0.0, any_hit=True, interpret=True, walkers=16,
        service_k=4, pipe=pipe,
    )
    np.testing.assert_array_equal(
        np.asarray(tri_p) >= 0, np.asarray(tri_ref) >= 0
    )
