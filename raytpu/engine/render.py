"""The renderer: ray generation, bounce loop, sample accumulation, tiling.

This is the TPU-native replacement for the reference's WGSL megakernel
(src/shader.wgsl:299-419) plus its host chunk loop (src/state.rs:336-379):

* one SIMD *wavefront* of rays per framebuffer tile instead of one GPU thread
  per pixel — every per-bounce step is a dense vectorised op over the whole
  tile, with boolean masks standing in for the megakernel's divergent
  branches;
* the data-dependent material/RNG control flow is replayed exactly (masked
  RNG advances, see kernels/rng.py), so images match the reference at
  matched seed rather than merely statistically;
* the bounce loop is a static Python unroll (``bounces`` is a compile-time
  constant) and each iteration is wrapped in ``lax.cond`` so bounces where
  every lane has died cost nothing;
* per-hit data comes from exactly ONE wide row gather (tri_row packs
  geometry, corner attributes, material and object transform per
  triangle; see raytpu.types), with single-light scenes skipping the
  light gather statically;
* samples are accumulated serially per pixel (``lax.fori_loop``) because the
  reference's RNG state carries across samples (src/shader.wgsl:412-414).

Reference quirks reproduced on purpose (SURVEY.md §7 — parity is measured
against the reference's images, quirks included):

* hit point ``p = (object_to_world * vec4(pos, 0.0)).xyz + n*eps`` — w = 0
  drops the instance translation (src/shader.wgsl:345);
* the diffuse BRDF samples a cosine hemisphere around the *global* z axis,
  sign-flipped by the incoming direction, and its pdf uses the incoming
  direction's z (src/shader.wgsl:212-226);
* ``metal_brdf`` ignores roughness (src/shader.wgsl:228-239);
* ``glass_brdf`` is the reference's idiosyncratic refraction formula with
  its scalar-minus-vector broadcast (src/shader.wgsl:241-257);
* next-event light contributions are added to radiance *unattenuated*; the
  final attenuation multiplies everything once at path exit
  (src/shader.wgsl:370-380);
* pixels outside the dispatched chunk grid stay black — see
  ``_in_chunk_grid`` for the exact (asymmetric in x/y) rule the reference's
  over-dispatching chunk loop produces (src/state.rs:330-334 +
  src/shader.wgsl:400-408).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels import rng as rngk
from ..kernels.intersect import F32_MAX, barycentrics, make_intersectors
from ..kernels.texture import sample_bilinear
from ..scene.pack import _sort_min_tris
from ..types import CameraPack, RenderConfig, ScenePack

PI = jnp.float32(3.1415926)  # src/shader.wgsl:3
INV_PI = jnp.float32(0.3183098)  # src/shader.wgsl:4
F32_EPSILON = jnp.float32(1.1920929e-7)  # src/shader.wgsl:2


def _dot3(a, b):
    """Explicitly-associated 3-component dot: (ax*bx + ay*by) + az*bz, so
    CPU and TPU backends round identically (shadow rays sit one ulp off
    surfaces — see cast_rays)."""
    return a[..., 0] * b[..., 0] + a[..., 1] * b[..., 1] + a[..., 2] * b[..., 2]


def _norm3(v):
    return jnp.sqrt(_dot3(v, v))


def _normalize(v):
    return v / _norm3(v)[..., None]


def cast_rays(px_f, py_f, world, projection, width: int, height: int):
    """Pinhole ray generation, exactly src/shader.wgsl:299-310.

    clip = pixel/(w,h)*2-1 (y then negated); unproject via the inverse
    perspective at z=0; the *vec4* is normalised before truncation to xyz;
    rotate into world with w=0; origin = world @ (0,0,0,1)."""
    clip_x = px_f / jnp.float32(width) * 2.0 - 1.0
    clip_y = py_f / jnp.float32(height) * 2.0 - 1.0
    # explicit mat-vec expansion: identical f32 association on every backend
    ndc_y = -clip_y
    cam = [
        projection[i, 0] * clip_x + projection[i, 1] * ndc_y + projection[i, 3]
        for i in range(4)
    ]
    inv_len4 = 1.0 / jnp.sqrt(
        cam[0] * cam[0] + cam[1] * cam[1] + cam[2] * cam[2] + cam[3] * cam[3]
    )
    cx, cy, cz = cam[0] * inv_len4, cam[1] * inv_len4, cam[2] * inv_len4
    d = jnp.stack(
        [
            world[i, 0] * cx + world[i, 1] * cy + world[i, 2] * cz
            for i in range(3)
        ],
        axis=-1,
    )
    d = _normalize(d)
    o = jnp.broadcast_to(world[:3, 3], d.shape)
    return o, d


def _shade_inputs(pack: ScenePack, ro, rd, hit):
    """Decode the winning triangle from ONE fused tri_row gather: world
    geometry (barycentric recompute — bit-identical to the in-sweep
    values), interpolated object-space pos / normal / uv, the material
    parameters, and the object's linear transform (the shader's 5-level
    gather chain plus material/object fetches, src/shader.wgsl:259-293)."""
    tri = jnp.maximum(hit.tri, 0)
    row = pack.tri_row[tri]  # [R,64]
    u, v = barycentrics(ro, rd, row)
    w0 = (1.0 - u - v)[:, None]
    wu = u[:, None]
    wv = v[:, None]
    pos = row[:, 9:12] * w0 + row[:, 12:15] * wu + row[:, 15:18] * wv
    normal = row[:, 18:21] * w0 + row[:, 21:24] * wu + row[:, 24:27] * wv
    uv = row[:, 27:29] * w0 + row[:, 29:31] * wu + row[:, 31:33] * wv
    if pack.n_materials == 1:
        # single-material scenes read broadcast constants so XLA folds the
        # material branches away entirely (emissive/metal tests, textures)
        mrow = pack.mat_table[0]
        r = row.shape[0]
        mat = dict(
            metallic=jnp.broadcast_to(mrow[0], (r,)),
            emission=jnp.broadcast_to(mrow[2], (r,)),
            ior=jnp.broadcast_to(mrow[3], (r,)),
            tex_id=jnp.broadcast_to(
                jax.lax.bitcast_convert_type(mrow[4], jnp.int32), (r,)
            ),
            has_tex=jnp.broadcast_to(
                jax.lax.bitcast_convert_type(mrow[5], jnp.int32) == 1, (r,)
            ),
            color=jnp.broadcast_to(mrow[8:12], (r, 4)),
        )
    else:
        mat = dict(
            metallic=row[:, 42],
            emission=row[:, 43],
            ior=row[:, 44],
            tex_id=jax.lax.bitcast_convert_type(row[:, 45], jnp.int32),
            has_tex=jax.lax.bitcast_convert_type(row[:, 46], jnp.int32) == 1,
            color=row[:, 47:51],
        )
    return pos, normal, uv, mat, row


def _apply_linear(pack, row, pos):
    """p = (object_to_world * vec4(pos, 0)).xyz — only the 3x3 part
    (src/shader.wgsl:345), baked per triangle in tri_row cols 33:42;
    single-object scenes use broadcast constants (XLA folds identity
    transforms to a no-op). Explicit mat-vec keeps f32 association
    identical across backends."""
    if pack.n_objects == 1:
        lin = [pack.object_linear[0, i] for i in range(9)]
    else:
        lin = [row[:, 33 + i] for i in range(9)]
    return jnp.stack(
        [
            lin[3 * i + 0] * pos[:, 0]
            + lin[3 * i + 1] * pos[:, 1]
            + lin[3 * i + 2] * pos[:, 2]
            for i in range(3)
        ],
        axis=-1,
    )


def _in_chunk_grid(px, py, w: int, h: int, cs: int):
    """Pixels the reference actually renders. The host dispatches
    ``w*h/chunk_size`` chunks (src/state.rs:330-334 — the over-dispatch
    quirk), the shader maps each chunk to a tile ``(chunk % (w/cs),
    chunk / (w/cs))`` (src/shader.wgsl:400-404) and discards
    ``pixel.y > height`` (:406-408 — ``>`` not ``>=``; the py == h row
    passes the guard but its textureStore is out of bounds and dropped).
    Net effect: **x is truncated to whole chunks, y only to the frame** —
    partial bottom rows DO render when height % chunk_size != 0 — provided
    the pixel's chunk index is below the dispatch count."""
    cols = max(w // cs, 1)
    chunk = (py // cs) * cols + (px // cs)
    return (px // cs < w // cs) & (py < h) & (chunk < (w * h) // cs)


def _morton(q, bits: int):
    """Interleave three ``bits``-wide integer coordinates into a
    3*bits-bit Morton code (vectorised bit spreading)."""
    def spread(x):  # standard Part1By2 bit spreading (<= 10-bit inputs)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    return spread(q[0]) | (spread(q[1]) << 1) | (spread(q[2]) << 2)


def _morton_bits() -> int:
    """Origin-quantisation bits per axis for the bounce coherence key
    (<= 9 so octant << 3*bits stays in int32). RAYTPU_MORTON_BITS."""
    return min(int(os.environ.get("RAYTPU_MORTON_BITS", "6")), 9)


def _ray_sort_key(pack: ScenePack, ro, rd, alive):
    """Sort key for bounce-ray coherence: dead lanes last (free live-ray
    compaction), then direction octant (major), then Morton cell of the
    origin (scene-bounds quantised, 6 bits/axis). Direction-major grouping
    measured ~1.6x faster than origin-major on the atrium: a packet of
    same-octant rays keeps the traversal frustum narrow even when origins
    spread."""
    bits = _morton_bits()
    cells = float(1 << bits)
    ext = jnp.maximum(pack.scene_bmax - pack.scene_bmin, 1e-6)
    q = jnp.clip(
        ((ro - pack.scene_bmin) / ext * cells).astype(jnp.int32), 0,
        (1 << bits) - 1,
    )
    morton = _morton((q[:, 0], q[:, 1], q[:, 2]), bits)
    octant = (
        (rd[:, 0] < 0).astype(jnp.int32)
        | ((rd[:, 1] < 0).astype(jnp.int32) << 1)
        | ((rd[:, 2] < 0).astype(jnp.int32) << 2)
    )
    key = (octant << (3 * bits)) | morton
    return jnp.where(alive, key, jnp.int32(1 << (3 * bits + 3)))


def _sorted_query(fn, pack, ro, rd, tmin, tmax, alive, returns_hit):
    """Run an intersector on coherence-sorted rays and unsort the result.

    Permutation plumbing (RAYTPU_SORT_MODE knob, default ``payload``):
    full-payload lax.sort in, payload unsort out. The ``gather`` arm
    (argsort the key alone, move columns with gathers, invert with one
    scatter) MEASURED WORSE on the headline frame — 6.12 vs 8.67
    Mrays/s — because TPU random row gathers are slower than riding the
    sort network's streaming passes. Kept for A/B evidence. Results are
    bit-identical either way: per-ray math never depends on wave order
    (lowest-slot tie breaks), and both modes restore exact original
    positions.

    Closest-hit returns carry ``t = 0``: the engine shades from ``tri``
    alone (_shade_inputs recomputes barycentrics bit-identically), so
    unsorting the distance column would be a wasted sort operand."""
    r = ro.shape[0]
    key = _ray_sort_key(pack, ro, rd, alive)
    idx = jax.lax.iota(jnp.int32, r)
    mode = os.environ.get("RAYTPU_SORT_MODE", "payload")
    if mode == "seg":
        # Segmented coherence sort: the full-wave 9-operand sort at ~1M
        # rows spills XLA's VMEM sort path into serialized alternate-
        # memory chunk slices (docs/PROFILE_r3.md "Sort spill,
        # revisited"). Sorting SEGMENTS of the wave independently keeps
        # each sort's working set VMEM-resident. Coherence only degrades
        # across segment boundaries: rays arrive in pixel order, so a
        # 128k-ray segment is a ~68-row band of the image — bounce
        # origins inside it are already spatially local, and the key
        # still orders each band octant-major/Morton-minor. Results stay
        # bit-identical (per-ray math is order-independent; unsort
        # restores exact positions).
        L = int(os.environ.get("RAYTPU_SORT_SEG", "131072"))
        n_seg = max(1, -(-r // L))
        r_pad = n_seg * L
        DEAD = jnp.int32(1 << (3 * _morton_bits() + 3))

        def seg(a, fill):
            if r_pad != r:
                a = jnp.concatenate(
                    [a, jnp.full((r_pad - r,), fill, a.dtype)]
                )
            return a.reshape(n_seg, L)

        key2 = seg(key, 1 << (3 * _morton_bits() + 3))
        idx2 = jax.lax.iota(jnp.int32, r_pad).reshape(n_seg, L)
        tmax_r = jnp.broadcast_to(tmax, (r,))
        if returns_hit:
            # closest queries carry only the alive/dead bit in tmax
            # (F32_MAX / -inf) — derive it from the sorted key instead of
            # paying a payload column
            (key_s, ox, oy, oz, dx, dy, dz, si) = jax.lax.sort(
                (key2, seg(ro[:, 0], 0.0), seg(ro[:, 1], 0.0),
                 seg(ro[:, 2], 0.0), seg(rd[:, 0], 1.0),
                 seg(rd[:, 1], 1.0), seg(rd[:, 2], 1.0), idx2),
                num_keys=1, dimension=-1,
            )
            tm = jnp.where(key_s == DEAD, -jnp.inf, F32_MAX).reshape(r_pad)
        else:
            (key_s, ox, oy, oz, dx, dy, dz, tm, si) = jax.lax.sort(
                (key2, seg(ro[:, 0], 0.0), seg(ro[:, 1], 0.0),
                 seg(ro[:, 2], 0.0), seg(rd[:, 0], 1.0),
                 seg(rd[:, 1], 1.0), seg(rd[:, 2], 1.0),
                 seg(tmax_r, -jnp.inf), idx2),
                num_keys=1, dimension=-1,
            )
            tm = tm.reshape(r_pad)
        so = jnp.stack(
            [ox.reshape(r_pad), oy.reshape(r_pad), oz.reshape(r_pad)],
            axis=-1,
        )
        sd = jnp.stack(
            [dx.reshape(r_pad), dy.reshape(r_pad), dz.reshape(r_pad)],
            axis=-1,
        )
        out = fn(so, sd, tmin, tm)
        if returns_hit:
            _, tri_u = jax.lax.sort(
                (si, out.tri.reshape(n_seg, L)),
                num_keys=1, dimension=-1,
            )
            from ..kernels.intersect import Hit

            tri_u = tri_u.reshape(r_pad)[:r]
            return Hit(t=jnp.zeros_like(tri_u, jnp.float32), tri=tri_u,
                       valid=tri_u >= 0)
        _, blocked_u = jax.lax.sort(
            (si, out.astype(jnp.int32).reshape(n_seg, L)),
            num_keys=1, dimension=-1,
        )
        return blocked_u.reshape(r_pad)[:r] == 1
    if mode == "payload_split":
        # two <= 6-operand sorts sharing the UNIQUE (key, idx) 2-level
        # key (identical permutations) instead of one 10-operand sort:
        # at 1M rows the 10-operand working set (~44 MB) spills XLA's
        # VMEM sort path (docs/PROFILE_r3.md "Sort spill, revisited")
        _, si, ox, oy, oz = jax.lax.sort(
            (key, idx, ro[:, 0], ro[:, 1], ro[:, 2]), num_keys=2
        )
        _, _, dx, dy, dz, tm = jax.lax.sort(
            (key, idx, rd[:, 0], rd[:, 1], rd[:, 2],
             jnp.broadcast_to(tmax, (r,))),
            num_keys=2,
        )
        so = jnp.stack([ox, oy, oz], axis=-1)
        sd = jnp.stack([dx, dy, dz], axis=-1)
        out = fn(so, sd, tmin, tm)
        if returns_hit:
            _, tri_u = jax.lax.sort((si, out.tri), num_keys=1)
            from ..kernels.intersect import Hit

            return Hit(t=jnp.zeros_like(tri_u, jnp.float32), tri=tri_u,
                       valid=tri_u >= 0)
        _, blocked_u = jax.lax.sort(
            (si, out.astype(jnp.int32)), num_keys=1
        )
        return blocked_u == 1
    if mode == "payload":
        if returns_hit:
            # closest queries carry only the alive/dead bit in tmax
            # (F32_MAX / -inf, see the bounce-step callers) — derive it
            # from the sorted key instead of paying a payload column
            DEAD = jnp.int32(1 << (3 * _morton_bits() + 3))
            (key_s, ox, oy, oz, dx, dy, dz, si) = jax.lax.sort(
                (key, ro[:, 0], ro[:, 1], ro[:, 2],
                 rd[:, 0], rd[:, 1], rd[:, 2], idx),
                num_keys=1,
            )
            tm = jnp.where(key_s == DEAD, -jnp.inf, F32_MAX)
        else:
            (_, ox, oy, oz, dx, dy, dz, tm, si) = jax.lax.sort(
                (key, ro[:, 0], ro[:, 1], ro[:, 2],
                 rd[:, 0], rd[:, 1], rd[:, 2],
                 jnp.broadcast_to(tmax, (r,)), idx),
                num_keys=1,
            )
        so = jnp.stack([ox, oy, oz], axis=-1)
        sd = jnp.stack([dx, dy, dz], axis=-1)

        def run_at(p):
            """Query only the live prefix of the sorted wave (the
            in-sort parks dead lanes at the tail): a dead lane's kernel
            output is always tri = -1 / blocked = False, so padding the
            tail with exactly those values is bit-identical to tracing
            it. Each tier is a separate compiled kernel size; lax.cond
            picks one per execution (RAYTPU_COMPACT knob)."""
            res = fn(so[:p], sd[:p], tmin, tm[:p])
            if returns_hit:
                return jnp.concatenate(
                    [res.tri, jnp.full((r - p,), -1, jnp.int32)]
                ) if p < r else res.tri
            return (jnp.concatenate(
                [res.astype(jnp.int32), jnp.zeros((r - p,), jnp.int32)]
            ) if p < r else res.astype(jnp.int32))

        tiers = [
            p for p in (-(-(r // 4) // 128) * 128,
                        -(-(r // 2) // 128) * 128)
            if 0 < p < r
        ] if (os.environ.get("RAYTPU_COMPACT", "0") != "0"
              and r >= 512) else []
        if tiers:
            n_alive = jnp.sum(alive.astype(jnp.int32))
            branch = lambda: run_at(r)  # noqa: E731 — innermost: full
            for p in sorted(tiers, reverse=True):  # wrap half, then quarter
                def branch(p=p, inner=branch):
                    return jax.lax.cond(
                        n_alive <= p, lambda: run_at(p), inner
                    )
            out_i = branch()
        else:
            out_i = run_at(r)
        if returns_hit:
            _, tri_u = jax.lax.sort((si, out_i), num_keys=1)
            from ..kernels.intersect import Hit

            return Hit(t=jnp.zeros_like(tri_u, jnp.float32), tri=tri_u,
                       valid=tri_u >= 0)
        _, blocked_u = jax.lax.sort((si, out_i), num_keys=1)
        return blocked_u == 1
    _, si = jax.lax.sort((key, idx), num_keys=1)
    so = ro[si]
    sd = rd[si]
    tm = jnp.broadcast_to(tmax, (r,))[si]
    out = fn(so, sd, tmin, tm)
    # si is a permutation of iota, so the scatter hints are honest
    inv = jnp.zeros((r,), jnp.int32).at[si].set(idx, unique_indices=True)
    if returns_hit:
        tri_u = out.tri[inv]
        from ..kernels.intersect import Hit

        return Hit(t=jnp.zeros_like(tri_u, jnp.float32), tri=tri_u,
                   valid=tri_u >= 0)
    return out[inv]


def _mixed_bounce_query(
    mixed_fn, pack, ro, rd, alive, s_ro, s_rd, s_dist, s_on
):
    """One sorted mixed-packet traversal serving a bounce's continuation
    rays AND the previous bounce's deferred NEE shadow rays (they share
    origins, so one coherence sort and one tree walk cover both — the two
    separate sorted queries this replaces each walked nearly the same
    node set). Beyond-VMEM route only: on resident scenes the strand
    bounce path won the round-3 A/B and the deferred-NEE resident arm
    (round-2 ``bounce_backend="mixed"`` + capped rounds) was retired as a
    measured loss (docs/PROFILE_r2.md backend table).

    Returns (Hit for the continuation rays, blocked mask for the shadow
    rays)."""
    from ..kernels.intersect import Hit

    r = ro.shape[0]
    NEG_INF = jnp.float32(-jnp.inf)
    tmax_c = jnp.where(alive, F32_MAX, NEG_INF)
    tmax_s = jnp.where(s_on, s_dist, NEG_INF)
    aro = jnp.concatenate([ro, s_ro])
    ard = jnp.concatenate([rd, s_rd])
    atm = jnp.concatenate([tmax_c, tmax_s])
    smask = jnp.concatenate(
        [jnp.zeros((r,), jnp.float32), jnp.ones((r,), jnp.float32)]
    )
    act = jnp.concatenate([alive, s_on])
    key = _ray_sort_key(pack, aro, ard, act)
    idx = jnp.arange(2 * r, dtype=jnp.int32)
    (_, ox, oy, oz, dx, dy, dz, tm, sm, si) = jax.lax.sort(
        (key, aro[:, 0], aro[:, 1], aro[:, 2],
         ard[:, 0], ard[:, 1], ard[:, 2], atm, smask, idx),
        num_keys=1,
    )
    so = jnp.stack([ox, oy, oz], axis=-1)
    sd = jnp.stack([dx, dy, dz], axis=-1)
    t, tri = mixed_fn(so, sd, tm, sm, tmin=0.001, shadow_tmin=0.0)
    # t is not unsorted: the engine shades from tri alone (barycentric
    # recompute), so the distance column would be a wasted sort operand
    _, tri_u = jax.lax.sort((si, tri), num_keys=1)
    hit = Hit(t=jnp.zeros_like(tri_u[:r], jnp.float32), tri=tri_u[:r],
              valid=tri_u[:r] >= 0)
    blocked = tri_u[r:] >= 0
    return hit, blocked


def _shade_core(pack: ScenePack, ro, rd, hit, rng, active):
    """The megakernel's per-bounce shading body (src/shader.wgsl:339-374
    up to the shadow query): face-forward + hit point + base colour +
    material dispatch + masked RNG draws + NEE light pick. Pure per-lane
    math — safe to run on any permutation or prefix of a wave (lanes
    outside ``active`` draw no RNG and contribute nothing). Returns a
    dict with everything the caller needs to finish the bounce:
    emissive_delta [R,4], att_mult [R,4], scattered/p [R,3], bounce_on,
    ldir/dist/contrib (the deferred shadow ray), and the advanced rng."""
    r = ro.shape[0]
    pos, normal, uv, mat, row = _shade_inputs(pack, ro, rd, hit)
    metallic, emission, ior = mat["metallic"], mat["emission"], mat["ior"]
    tex_id, has_tex, m_color = mat["tex_id"], mat["has_tex"], mat["color"]

    # face-forward normal (src/shader.wgsl:339-343)
    front = _dot3(rd, normal) < 0.0
    normal = jnp.where(front[:, None], normal, -normal)

    # hit point with the w=0 translation-dropping quirk (:345)
    p = _apply_linear(pack, row, pos) + normal * F32_EPSILON

    # base colour: bilinear texture or factor (:349-353)
    if pack.has_textures:
        tex_rgba = sample_bilinear(
            pack.tex_atlas, pack.tex_size, tex_id, uv
        )
        in_color = jnp.where(has_tex[:, None], tex_rgba, m_color)
    else:
        in_color = m_color

    # --- material dispatch (:355-368) ---
    is_emissive = active & (emission > 0.0)
    is_metal = active & ~is_emissive & (metallic > 0.0)
    is_mixed = active & ~is_emissive & ~(metallic > 0.0)

    emissive_delta = jnp.where(
        is_emissive[:, None], m_color * emission[:, None], 0.0
    )

    # metal: perfect mirror, roughness unused (:228-239)
    d_dot_n = _dot3(rd, normal)[:, None]
    scat_metal = rd - 2.0 * d_dot_n * normal
    att_metal = in_color  # out_color / pdf with pdf = 1

    # 50/50 diffuse-glass mix (:362-367); one rand for the choice
    rng, r_mix = rngk.rand_masked(rng, is_mixed)
    is_diffuse = is_mixed & (r_mix > 0.5)

    # diffuse: cosine hemisphere in the quirky global-z frame (:212-226)
    rng, u1 = rngk.rand_masked(rng, is_diffuse)
    rng, u2 = rngk.rand_masked(rng, is_diffuse)
    r_disk = jnp.sqrt(u1)
    theta = 2.0 * PI * u2
    dx = r_disk * jnp.cos(theta)
    dy = r_disk * jnp.sin(theta)
    dz = jnp.sqrt(1.0 - dx * dx - dy * dy)
    dz = jnp.where(rd[:, 2] < 0.0, -dz, dz)
    scat_diffuse = jnp.stack([dx, dy, dz], axis=-1)
    pdf_diffuse = jnp.abs(rd[:, 2]) * INV_PI
    att_diffuse = (in_color / PI) / pdf_diffuse[:, None]

    # glass: the reference's refraction formula verbatim (:241-257),
    # including `-(1.0 - |out_perp| * normal)` broadcasting 1.0 - vec3
    uv_dir = _normalize(rd)
    cos_theta = jnp.minimum(-_dot3(uv_dir, normal), 1.0)
    out_perp = ior[:, None] * (uv_dir + cos_theta[:, None] * normal)
    perp_len = jnp.sqrt(jnp.abs(_dot3(out_perp, out_perp)))
    out_parallel = -(1.0 - perp_len[:, None] * normal)
    scat_glass = out_perp + out_parallel
    att_glass = in_color

    half = jnp.float32(0.5)
    att_mult = jnp.where(
        is_metal[:, None],
        att_metal,
        jnp.where(
            is_diffuse[:, None], att_diffuse * half, att_glass * half
        ),
    )
    scattered = jnp.where(
        is_metal[:, None],
        scat_metal,
        jnp.where(is_diffuse[:, None], scat_diffuse, scat_glass),
    )
    bounce_on = is_metal | is_mixed

    # --- next-event estimation setup (:370-374) ---
    rng, r_light = rngk.rand_masked(rng, bounce_on)
    if pack.n_lights == 1:
        lrow = jnp.broadcast_to(pack.light_table[0], (r, 8))
    else:
        li = jnp.clip(
            (r_light * pack.n_lights_f).astype(jnp.int32), 0,
            pack.n_lights - 1,
        )
        lrow = pack.light_table[li]
    lpos = lrow[:, 0:3]
    lcolor = lrow[:, 4:8]
    to_light = lpos - p
    dist = _norm3(to_light)
    ldir = to_light / dist[:, None]
    # radiance += (color / sqrt(dist)) / (1/N) — unattenuated (:372-374)
    contrib = (lcolor / jnp.sqrt(dist)[:, None]) / (1.0 / pack.n_lights_f)
    return dict(
        rng=rng, p=p, scattered=scattered, att_mult=att_mult,
        bounce_on=bounce_on, emissive_delta=emissive_delta,
        ldir=ldir, dist=dist, contrib=contrib,
    )


def _compact_tiers(r: int):
    """Live-prefix tier sizes for the compact/fused wave modes: multiples
    of 256 covering r/d for each divisor (RAYTPU_COMPACT_DIV), sorted
    ascending, excluding r itself. Empty below 2048 lanes (tiny waves
    never win from tiering)."""
    divs = [
        int(d) for d in os.environ.get(
            "RAYTPU_COMPACT_DIV", "16,4,2"
        ).split(",") if int(d) > 1
    ] if r >= 2048 else []
    return sorted({min(-(-(r // d) // 256) * 256, r) for d in divs} - {r})


def _bounce_work(pack: ScenePack, b_closest, b_any, sop, sdp, rngp,
                 alivep):
    """One bounce's query + shade + NEE at whatever width the caller
    chose (the live prefix of a coherence-sorted wave): closest query,
    shading, shadow query, radiance delta. Shared by the compact and
    fused wave modes — per-lane math only, so safe at any width/order.
    Returns (delta3, mult3, next_ro, next_rd, bounce_on, rng)."""
    NEG_INF = jnp.float32(-jnp.inf)
    tm = jnp.where(alivep, F32_MAX, NEG_INF)
    hit = b_closest(sop, sdp, 0.001, tm)
    active = alivep & hit.valid
    sh = _shade_core(pack, sop, sdp, hit, rngp, active)
    bounce_on = sh["bounce_on"]
    shadow_tmax = jnp.where(bounce_on, sh["dist"], NEG_INF)
    blocked = _sorted_query(
        b_any, pack, sh["p"], sh["ldir"], 0.0,
        shadow_tmax, bounce_on, False,
    )
    delta = sh["emissive_delta"][:, :3] + jnp.where(
        (bounce_on & ~blocked)[:, None], sh["contrib"][:, :3], 0.0
    )
    mult = sh["att_mult"][:, :3]
    nro = jnp.where(bounce_on[:, None], sh["p"], sop)
    nrd = jnp.where(bounce_on[:, None], sh["scattered"], sdp)
    return delta, mult, nro, nrd, bounce_on, sh["rng"]


def _trace_paths(
    pack: ScenePack, closest, any_hit, ro, rd, rng, bounces: int,
    count_mask=None, mask=None, sort_bounced=False, mixed_fn=None,
    eager: bool = False, bounce_pair=None,
):
    """One full path per lane: the reference's ``pixel_color``
    (src/shader.wgsl:321-381), vectorised with masks. ``mask`` restricts
    which lanes trace at all (lanes outside return 0 radiance). With
    ``count_mask`` also returns the number of ray queries issued by masked
    lanes (1 primary + 2 per bounce iteration entered — the reference's
    cost model, SURVEY.md §3.4).

    When ``mixed_fn`` is given (packet path on large scenes), NEE shadow
    rays are *deferred*: bounce b's shadow query rides the same mixed
    packet traversal as bounce b+1's continuation query
    (_mixed_bounce_query), with one final shadow-only query after the
    loop. Per-lane radiance additions happen in the reference's exact
    order (a bounce's NEE contribution lands before the next bounce's
    emissive term), so images are bit-identical to the immediate path up
    to packet-order triangle ties."""
    r = ro.shape[0]
    # int32 is safe per call: one tile-sample counts <= R*(1+2*bounces)
    # rays (< 2^31 for any realistic tile); cross-sample/tile accumulation
    # happens in int64 on the host (count_rays) — jnp.int64 would silently
    # wrap to int32 without jax_enable_x64
    n_rays = (
        jnp.sum(count_mask.astype(jnp.int32)) if count_mask is not None
        else None
    )
    # derive from the rays so loop carries keep shard_map varying-axis
    # types (ro alone is a broadcast pinhole origin — unvarying)
    zero_col = ((ro[:, :1] + rd[:, :1]) * 0.0).astype(jnp.float32)
    ro = ro + zero_col  # make the broadcast pinhole origin varying too
    radiance = jnp.tile(zero_col, (1, 4))
    attenuation = radiance + jnp.array([1.0, 1.0, 1.0, 0.0], jnp.float32)
    alive = zero_col[:, 0] == 0.0
    if mask is not None:
        alive = alive & mask
    NEG_INF = jnp.float32(-jnp.inf)

    # sorted bounce waves route to the strand kernel when available (it
    # wins 2.4-3.1x on captured bounce waves); primary + first-shadow
    # waves stay on the packet kernel (which wins the coherent b0s wave).
    # Results are image-identical either way: the kernels bit-agree on
    # tri, and shading never reads raw t (_shade_inputs recomputes
    # barycentrics from the committed triangle).
    b_closest, b_any = bounce_pair if bounce_pair is not None else (
        closest, any_hit,
    )

    has_cmask = count_mask is not None

    def bounce_step(
        carry, use_sort=False, use_sort_shadow=False,
        use_mixed_query=False, defer_nee=False, use_bounce_pair=False,
        persistent_sort=False,
    ):
        pend = None
        cmask = None
        pxi = None
        if persistent_sort:
            if has_cmask:
                ro, rd, rng, radiance, attenuation, alive, pxi, cmask = carry
            else:
                ro, rd, rng, radiance, attenuation, alive, pxi = carry
        elif defer_nee:
            ro, rd, rng, radiance, attenuation, alive, pend = carry
        else:
            ro, rd, rng, radiance, attenuation, alive = carry
        if persistent_sort:
            # ONE payload sort per bounce moves the whole path state into
            # coherence order (RAYTPU_WAVE_MODE=resort). Queries AND
            # shading then run in place: the shadow wave inherits the
            # continuation wave's origin clustering (its origins ARE the
            # sorted hit points), the shading tri_row gather becomes
            # spatially clustered (Morton-ordered rays commit nearby
            # triangles), and the per-query sort+unsort pairs disappear.
            # Lane order is a pure permutation: per-lane math, RNG replay
            # and the reference's per-lane radiance add order (emissive_b
            # then NEE_b) are unchanged, so images stay bit-identical;
            # original order is restored once at path exit via the carried
            # pixel index. (The gather-based variant measured 6.1 vs 8.7
            # Mrays/s — TPU random gathers lose to sort payload passes,
            # so state rides the sort.)
            key = _ray_sort_key(pack, ro, rd, alive)
            # two sorts of <= 11 operands instead of one 19-operand sort:
            # XLA's TPU sort stays on its VMEM-resident path only up to
            # ~10 columns at 1M rows — the single big sort spilled into
            # serialized alternate-memory chunk copies (profiled at
            # ~15% slower frames). (key, pxi) is a UNIQUE 2-level key
            # (pxi is a permutation of iota), so both sorts apply the
            # exact same permutation regardless of tie handling.
            ops = [key, pxi, ro[:, 0], ro[:, 1], ro[:, 2],
                   rd[:, 0], rd[:, 1], rd[:, 2], rng, alive]
            if has_cmask:
                ops.append(cmask)
            out = jax.lax.sort(tuple(ops), num_keys=2)
            (key_s, pxi_s, ox, oy, oz, dx, dy, dz, rng, alive) = out[:10]
            if has_cmask:
                cmask = out[10]
            _, _, q0, q1, q2, q3, a0, a1, a2, a3 = jax.lax.sort(
                (key, pxi, radiance[:, 0], radiance[:, 1],
                 radiance[:, 2], radiance[:, 3], attenuation[:, 0],
                 attenuation[:, 1], attenuation[:, 2],
                 attenuation[:, 3]),
                num_keys=2,
            )
            pxi = pxi_s
            ro = jnp.stack([ox, oy, oz], axis=-1)
            rd = jnp.stack([dx, dy, dz], axis=-1)
            radiance = jnp.stack([q0, q1, q2, q3], axis=-1)
            attenuation = jnp.stack([a0, a1, a2, a3], axis=-1)
            tmax = jnp.where(alive, F32_MAX, NEG_INF)
            hit = (b_closest if use_bounce_pair else closest)(
                ro, rd, 0.001, tmax
            )
        elif use_mixed_query:
            # continuation + previous bounce's deferred shadow rays in ONE
            # sorted mixed traversal; the deferred NEE contribution lands
            # here, BEFORE this bounce's emissive term (reference order)
            p_p, p_dir, p_dist, p_contrib, p_on = pend
            hit, blocked = _mixed_bounce_query(
                mixed_fn, pack, ro, rd, alive,
                p_p, p_dir, p_dist, p_on,
            )
            radiance = radiance + jnp.where(
                (p_on & ~blocked)[:, None], p_contrib, 0.0
            )
        else:
            # dead lanes get tmax = -inf: no path may produce hits for them
            # (and the packet kernel drops them from box tests entirely)
            tmax = jnp.where(alive, F32_MAX, NEG_INF)
            if use_sort:
                hit = _sorted_query(
                    b_closest if use_bounce_pair else closest,
                    pack, ro, rd, 0.001, tmax, alive,
                    True,
                )
            else:
                hit = (b_closest if use_bounce_pair else closest)(
                    ro, rd, 0.001, tmax
                )
        active = alive & hit.valid

        sh = _shade_core(pack, ro, rd, hit, rng, active)
        rng = sh["rng"]
        p, scattered = sh["p"], sh["scattered"]
        bounce_on = sh["bounce_on"]
        ldir, dist, contrib = sh["ldir"], sh["dist"], sh["contrib"]

        radiance = radiance + sh["emissive_delta"]
        attenuation = jnp.where(
            bounce_on[:, None], attenuation * sh["att_mult"], attenuation
        )

        # --- next-event estimation visibility (:370-374) ---
        if defer_nee:
            # the shadow query rides the NEXT bounce's mixed traversal (or
            # the final shadow-only query); the contribution value is fixed
            # here, only its visibility test is deferred
            new_pend = (p, ldir, dist, contrib, bounce_on)
        else:
            shadow_tmax = jnp.where(bounce_on, dist, NEG_INF)
            if use_sort_shadow:
                blocked = _sorted_query(
                    b_any if use_bounce_pair else any_hit,
                    pack, p, ldir, 0.0, shadow_tmax,
                    bounce_on, False,
                )
            else:
                # persistent_sort: the shadow wave runs in the bounce's
                # sorted order directly — its origins are the (clustered)
                # hit points, so no second sort is paid
                blocked = (b_any if use_bounce_pair else any_hit)(
                    p, ldir, 0.0, shadow_tmax
                )
            radiance = radiance + jnp.where(
                (bounce_on & ~blocked)[:, None], contrib, 0.0
            )

        # continue the path (:376-377)
        ro = jnp.where(bounce_on[:, None], p, ro)
        rd = jnp.where(bounce_on[:, None], scattered, rd)
        if persistent_sort:
            if has_cmask:
                return (ro, rd, rng, radiance, attenuation, bounce_on,
                        pxi, cmask)
            return ro, rd, rng, radiance, attenuation, bounce_on, pxi
        if defer_nee:
            return ro, rd, rng, radiance, attenuation, bounce_on, new_pend
        return ro, rd, rng, radiance, attenuation, bounce_on

    def compact_step(carry):
        """RAYTPU_WAVE_MODE=compact: the ENTIRE bounce pipeline — closest
        query, tri_row gather, shading, RNG draws, NEE shadow query — runs
        on the LIVE PREFIX of the coherence-sorted wave only.

        The reference's megakernel exits its bounce loop the moment a path
        dies, so dead rays cost zero (/root/reference/src/shader.wgsl:331);
        the wavefront engine previously paid full wave width through
        shading and gathers every bounce even when the live fraction had
        collapsed (~305 ms/frame of gathers + elementwise at the 1080p
        headline, docs/PROFILE_r3.md). Here the bounce in-sort (which
        already parks dead lanes at the tail) is reused as the compaction:
        a lax.cond tier picks the smallest prefix covering every live
        lane, everything runs at that width in sorted order, and the
        results ride two <=9-operand unsorts back (the ~10-operand VMEM
        sort-spill threshold, docs/PROFILE_r3.md "Sort spill, revisited").

        Bit-identity with the query mode:
        * per-lane math never depends on wave order or width (lowest-slot
          kernel ties; rand_masked advances only masked lanes — dead
          lanes outside the prefix would not have advanced anyway);
        * the shadow query gets its own coherence sort at prefix width
          (resort-lite — shading in the closest wave's order — was
          REJECTED by the round-3 arithmetic: shadow steps/ray 1.13 vs
          0.43, docs/PROFILE_r3.md);
        * emissive and NEE radiance terms are per-lane DISJOINT (an
          emissive hit terminates the path before NEE fires,
          src/shader.wgsl:355-357), so summing them into one delta before
          a single radiance add reassociates nothing.
        """
        ro, rd, rng, radiance, attenuation, alive = carry
        key = _ray_sort_key(pack, ro, rd, alive)
        idx = jax.lax.iota(jnp.int32, r)
        DEAD = jnp.int32(1 << (3 * _morton_bits() + 3))
        (key_s, ox, oy, oz, dx, dy, dz, rng_s, si) = jax.lax.sort(
            (key, ro[:, 0], ro[:, 1], ro[:, 2],
             rd[:, 0], rd[:, 1], rd[:, 2], rng, idx),
            num_keys=1,
        )
        so = jnp.stack([ox, oy, oz], axis=-1)
        sd = jnp.stack([dx, dy, dz], axis=-1)
        alive_s = key_s != DEAD

        def run_at(p):
            delta, mult, nro, nrd, bounce_on, rng_p = _bounce_work(
                pack, b_closest, b_any, so[:p], sd[:p], rng_s[:p],
                alive_s[:p],
            )
            cols = [delta[:, 0], delta[:, 1], delta[:, 2],
                    mult[:, 0], mult[:, 1], mult[:, 2],
                    nro[:, 0], nro[:, 1], nro[:, 2],
                    nrd[:, 0], nrd[:, 1], nrd[:, 2],
                    bounce_on.astype(jnp.int32), rng_p]
            if p < r:
                # tail lanes are dead: zero delta, mult masked by the
                # bounce flag, state passes through untouched
                tails = [jnp.zeros((r - p,), jnp.float32)] * 6 + [
                    so[p:, 0], so[p:, 1], so[p:, 2],
                    sd[p:, 0], sd[p:, 1], sd[p:, 2],
                    jnp.zeros((r - p,), jnp.int32), rng_s[p:],
                ]
                cols = [jnp.concatenate([c, t])
                        for c, t in zip(cols, tails)]
            return tuple(cols)

        # prefix tiers: multiples of 256 covering r/16, r/4, r/2, r; a
        # lax.cond chain picks the smallest tier holding every live lane
        # (each tier is its own compiled pipeline — the live fraction
        # collapses fast after bounce 1, so late bounces ride the small
        # tiers). RAYTPU_COMPACT_DIV overrides the divisor list.
        tiers = _compact_tiers(r)
        n_alive = jnp.sum(alive.astype(jnp.int32))
        if eager:
            # wave capture runs outside jit; lax.cond would trace the
            # branches (hiding real arrays from recording intersectors),
            # so pick the tier concretely
            p_pick = r
            for p in tiers:
                if bool(n_alive <= p):
                    p_pick = p
                    break
            cols = run_at(p_pick)
        else:
            branch = lambda: run_at(r)  # noqa: E731 — innermost: full
            for p in sorted(tiers, reverse=True):
                def branch(p=p, inner=branch):
                    return jax.lax.cond(
                        n_alive <= p, lambda: run_at(p), inner
                    )
            cols = branch()

        # restore original lane order: si is a permutation of iota, so
        # two sorts keyed on it apply the exact inverse; splitting keeps
        # both under the sort-spill operand threshold
        (d0, d1, d2, m0, m1, m2, r0, r1, r2, e0, e1, e2, bon, rng_n) = cols
        _, d0, d1, d2, m0, m1, m2 = jax.lax.sort(
            (si, d0, d1, d2, m0, m1, m2), num_keys=1
        )
        _, r0, r1, r2, e0, e1, e2, bon, rng_n = jax.lax.sort(
            (si, r0, r1, r2, e0, e1, e2, bon, rng_n), num_keys=1
        )
        alive_u = bon == 1
        zero = jnp.zeros_like(d0)
        radiance = radiance + jnp.stack([d0, d1, d2, zero], axis=-1)
        attenuation = jnp.where(
            alive_u[:, None],
            attenuation * jnp.stack([m0, m1, m2, zero + 1.0], axis=-1),
            attenuation,
        )
        ro = jnp.stack([r0, r1, r2], axis=-1)
        rd = jnp.stack([e0, e1, e2], axis=-1)
        return ro, rd, rng_n, radiance, attenuation, alive_u

    def fused_step(carry):
        """RAYTPU_WAVE_MODE=fused: compact's live-prefix execution
        WITHOUT the per-bounce unsort. The wave stays in coherence-sorted
        order across bounces (like resort mode): each bounce sorts only
        the PREVIOUS bounce's work-tier window (live lanes are confined
        to that prefix — everything past it was dead-parked with its
        final state by an earlier sort), runs the whole pipeline at the
        new live prefix, and leaves lane order permuted; ONE 5-operand
        unsort at path exit restores pixel order via the carried pxi.

        vs compact, per bounce this removes: two full-width unsort
        passes (7 + 9 operands), the full-width radiance/attenuation
        updates after them, and shrinks the in-sort from full width to
        the previous prefix. Bit-identity: per-lane math (RNG replay,
        radiance add order emissive_b-then-NEE_b) never depends on lane
        position or wave width; the sort pair (key, pxi) is a unique
        2-level key so both payload sorts apply the same permutation;
        the final unsort is an exact inverse (pxi is a permutation of
        iota). The reference keeps path state in registers across its
        bounce loop and pays nothing to reorder
        (/root/reference/src/shader.wgsl:321-381); this is the sorted-
        wavefront analogue.

        Carry: (ro, rd, rng, rad3, att3, alive, pxi[, cmask], tier) —
        radiance/attenuation ride as 3 columns (their w columns are
        invariant 0, see compact_step's unsort) and ``tier`` is the
        index into windows = tiers + [r] of this bounce's sort window.
        """
        if has_cmask:
            ro, rd, rng, rad, att, alive, pxi, cmask, tier_prev = carry
        else:
            ro, rd, rng, rad, att, alive, pxi, tier_prev = carry
            cmask = None
        tiers = _compact_tiers(r)
        windows = tiers + [r]
        DEAD = jnp.int32(1 << (3 * _morton_bits() + 3))

        def sort_at(wsz):
            """Coherence-sort the first ``wsz`` lanes (dead to the tail),
            pass the rest through untouched."""
            key = _ray_sort_key(pack, ro[:wsz], rd[:wsz], alive[:wsz])
            a = jax.lax.sort(
                (key, pxi[:wsz], ro[:wsz, 0], ro[:wsz, 1], ro[:wsz, 2],
                 rd[:wsz, 0], rd[:wsz, 1], rd[:wsz, 2], rng[:wsz]),
                num_keys=2,
            )
            (key_s, pxi_w, ox, oy, oz, dx, dy, dz, rng_w) = a
            b_ops = [key, pxi[:wsz], rad[:wsz, 0], rad[:wsz, 1],
                     rad[:wsz, 2], att[:wsz, 0], att[:wsz, 1],
                     att[:wsz, 2]]
            if has_cmask:
                b_ops.append(cmask[:wsz])
            b = jax.lax.sort(tuple(b_ops), num_keys=2)
            (_, _, q0, q1, q2, a0, a1, a2) = b[:8]
            cm_w = b[8] if has_cmask else None

            def full(pref, tail):
                return (jnp.concatenate([pref, tail], axis=0)
                        if wsz < r else pref)

            out = (
                full(jnp.stack([ox, oy, oz], axis=-1), ro[wsz:]),
                full(jnp.stack([dx, dy, dz], axis=-1), rd[wsz:]),
                full(rng_w, rng[wsz:]),
                full(jnp.stack([q0, q1, q2], axis=-1), rad[wsz:]),
                full(jnp.stack([a0, a1, a2], axis=-1), att[wsz:]),
                # lanes beyond the window are dead by the invariant
                full(key_s != DEAD, alive[wsz:]),
                full(pxi_w, pxi[wsz:]),
            )
            if has_cmask:
                out = out + (full(cm_w, cmask[wsz:]),)
            return out

        if eager:
            state = sort_at(windows[int(tier_prev)])
        else:
            state = jax.lax.switch(
                tier_prev, [lambda w=w: sort_at(w) for w in windows]
            )
        if has_cmask:
            ro, rd, rng, rad, att, alive, pxi, cmask = state
        else:
            ro, rd, rng, rad, att, alive, pxi = state

        n_alive = jnp.sum(alive.astype(jnp.int32))

        def run_at(p):
            delta, mult, nro, nrd, bounce_on, rng_p = _bounce_work(
                pack, b_closest, b_any, ro[:p], rd[:p], rng[:p],
                alive[:p],
            )

            def full(pref, tail):
                return (jnp.concatenate([pref, tail], axis=0)
                        if p < r else pref)

            att_p = jnp.where(
                bounce_on[:, None], att[:p] * mult, att[:p]
            )
            return (
                full(nro, ro[p:]),
                full(nrd, rd[p:]),
                full(rng_p, rng[p:]),
                full(rad[:p] + delta, rad[p:]),
                full(att_p, att[p:]),
                # the tail is all dead: n_alive <= p and the window sort
                # parked dead lanes behind the live prefix
                full(bounce_on, alive[p:]),
            )

        if eager:
            p_pick = r
            for p in tiers:
                if bool(n_alive <= p):
                    p_pick = p
                    break
            ro, rd, rng, rad, att, alive = run_at(p_pick)
        else:
            branch = lambda: run_at(r)  # noqa: E731 — innermost: full
            for p in sorted(tiers, reverse=True):
                def branch(p=p, inner=branch):
                    return jax.lax.cond(
                        n_alive <= p, lambda: run_at(p), inner
                    )
            ro, rd, rng, rad, att, alive = branch()

        # next bounce's sort window = the work tier just used (live lanes
        # live inside it): index of the first window >= n_alive
        new_tier = jnp.int32(0)
        for t in tiers:
            new_tier = new_tier + (n_alive > t).astype(jnp.int32)
        if has_cmask:
            return ro, rd, rng, rad, att, alive, pxi, cmask, new_tier
        return ro, rd, rng, rad, att, alive, pxi, new_tier

    use_mixed = mixed_fn is not None and bounces > 0
    # bounce-wave scheduling mode (RAYTPU_WAVE_MODE):
    #   query   — per-query sort in / unsort out, full-width shading
    #   resort  — one payload sort of the whole path state per bounce
    #             (measured loss at full width, kept for A/B evidence)
    #   compact — per-bounce in-sort reused as live-prefix compaction:
    #             queries AND shading run at live width
    #   fused   — compact without the per-bounce unsort: the wave stays
    #             sorted across bounces (sort window = previous work
    #             tier), ONE unsort at path exit
    # Default is wave-width gated (round-4 frame A/Bs, docs/PROFILE_r4.md):
    # fused wins on the 2.07M-lane headline (673.5 -> 588.0 ms solo,
    # 564.8 with UNROLL=4) — one unsort per path instead of one per
    # bounce; compact/fused LOSE on small waves (multi 65k lanes:
    # 19.2 -> 22.4 ms with compact+pipe) — the tier cond-chain's fixed
    # cost outweighs dead-lane savings there.
    large_wave = r >= int(os.environ.get("RAYTPU_LARGE_WAVE", str(1 << 20)))
    wave_mode = os.environ.get(
        "RAYTPU_WAVE_MODE", "fused" if large_wave else "query"
    )
    persistent = sort_bounced and not use_mixed and wave_mode == "resort"
    compact = sort_bounced and not use_mixed and wave_mode == "compact"
    fused = sort_bounced and not use_mixed and wave_mode == "fused"
    if use_mixed:
        z3 = jnp.zeros_like(ro)
        pend0 = (
            z3, z3, zero_col[:, 0], jnp.zeros_like(radiance),
            jnp.zeros_like(alive),
        )
        carry = (ro, rd, rng, radiance, attenuation, alive, pend0)
    else:
        carry = (ro, rd, rng, radiance, attenuation, alive)
    def _guarded(step, carry, n_rays, cmask_in_carry=False):
        # skip entire bounces once every lane has terminated (a pending
        # shadow query from the skipped bounce resolves after the loop).
        # ``eager`` (wave capture, benchmarks/waves.py) decides on the
        # concrete value instead so no tracing context wraps the step —
        # recording intersector wrappers then see real arrays.
        if eager:
            if bool(jnp.any(carry[5])):
                carry = step(carry)
        elif os.environ.get(
            "RAYTPU_NO_GUARD", "1" if large_wave else "0"
        ) != "0":
            # A bounce step over an all-dead carry is a bit-exact no-op
            # (tmax=-inf kills every query; rand_masked advances no lane;
            # where(bounce_on) keeps state), so the cond guard is an
            # optimisation only — and lax.cond forces operand/result
            # buffer copies every bounce (the pred[2M] memory-space
            # copies in the frame profile) while its skip almost never
            # fires on the headline frame. Default on large waves: drop
            # the guard (711 vs 726 ms solo, part of the best 675 ms
            # combo, docs/PROFILE_r4.md); small tiles keep the guard —
            # their early all-dead skips can fire. RAYTPU_NO_GUARD=0/1
            # forces either way.
            carry = step(carry)
        else:
            carry = jax.lax.cond(jnp.any(carry[5]), step, lambda c: c, carry)
        if n_rays is not None:
            # persistent steps permute lanes, so the count mask rides the
            # carry (index 7) instead of closing over the original order
            cm = carry[7] if cmask_in_carry else count_mask
            counted = carry[5] & cm
            n_rays = n_rays + 2 * jnp.sum(counted.astype(jnp.int32))
        return carry, n_rays

    if bounces > 0:
        # bounce 0: primary rays arrive pre-ordered (32x32 blocks); bounce
        # rays scatter afterwards and sort for packet coherence (in mixed/
        # binned mode the coherence machinery lives inside the query)
        step0 = partial(
            bounce_step,
            use_sort=False,
            # RAYTPU_B0S_NOSORT=1 skips the first shadow wave's coherence
            # sort: its origins are primary hits in PIXEL order (already
            # spatially local) and its directions point at the sampled
            # light, so the sort may not pay for itself (A/B knob)
            use_sort_shadow=(not use_mixed) and sort_bounced
            and not os.environ.get("RAYTPU_B0S_NOSORT"),
            use_mixed_query=False,
            defer_nee=use_mixed,
            # primary + first-shadow waves ride the strand pair too: with
            # the persistent kernel it beats the packet kernel even on
            # coherent b0 waves (1080p headline 740.5 -> 725.6 ms,
            # docs/PROFILE_r3.md). RAYTPU_B0_STRAND=0 restores the packet
            # kernel for A/Bs.
            use_bounce_pair=(
                os.environ.get("RAYTPU_B0_STRAND", "1") != "0"
            ),
        )
        carry, n_rays = _guarded(step0, carry, n_rays)
    if bounces > 1:
        # bounces 1..B-1 share one traced body: by default ROLL them into
        # a fori_loop so the (large) sorted/mixed/binned query machinery
        # appears once in the compiled program instead of once per bounce.
        # RAYTPU_UNROLL_BOUNCES=1 keeps the python unroll (A/B knob:
        # rolling shrinks compile time/size several-fold but may cost
        # runtime by blocking cross-bounce XLA optimisation).

        if persistent:
            carry = carry + (jax.lax.iota(jnp.int32, r),)
            if has_cmask:
                carry = carry + (count_mask,)
        if fused:
            # 3-col radiance/attenuation (w columns are invariant 0),
            # original pixel index, and the first sort window = full r
            # (every lane may be alive after bounce 0)
            ro_c, rd_c, rng_c, rad_c, att_c, alive_c = carry
            carry = (ro_c, rd_c, rng_c, rad_c[:, :3], att_c[:, :3],
                     alive_c, jax.lax.iota(jnp.int32, r))
            if has_cmask:
                carry = carry + (count_mask,)
            carry = carry + (jnp.int32(len(_compact_tiers(r))),)
        if compact:
            stepb = compact_step
        elif fused:
            stepb = fused_step
        else:
            stepb = partial(
                bounce_step,
                use_sort=(not use_mixed) and sort_bounced
                and not persistent,
                use_sort_shadow=(
                    (not use_mixed) and sort_bounced and not persistent
                ),
                use_mixed_query=use_mixed,
                defer_nee=use_mixed,
                use_bounce_pair=True,
                persistent_sort=persistent,
            )
        count_in_carry = (persistent or fused) and has_cmask
        if eager or os.environ.get("RAYTPU_UNROLL_BOUNCES"):
            for _ in range(1, bounces):
                carry, n_rays = _guarded(
                    stepb, carry, n_rays, cmask_in_carry=count_in_carry
                )
        else:

            def roll(_, state):
                return _guarded(
                    stepb, *state, cmask_in_carry=count_in_carry
                )

            carry, n_rays = jax.lax.fori_loop(
                1, bounces, roll, (carry, n_rays)
            )

    if use_mixed:
        _, _, rng, radiance, attenuation, _, pend = carry
        p_p, p_dir, p_dist, p_contrib, p_on = pend

        def resolve_last(rad):
            # the last bounce's deferred shadow wave is the most
            # incoherent of the frame — route it to the strand pair
            # (persistent kernel) when the pack carries one
            last_any = b_any if bounce_pair is not None else any_hit
            shadow_tmax = jnp.where(p_on, p_dist, NEG_INF)
            if sort_bounced:
                blocked = _sorted_query(
                    last_any, pack, p_p, p_dir, 0.0,
                    shadow_tmax, p_on, False,
                )
            else:
                blocked = last_any(
                    p_p, p_dir, 0.0, shadow_tmax
                )
            return rad + jnp.where(
                (p_on & ~blocked)[:, None], p_contrib, 0.0
            )

        if eager:
            if bool(jnp.any(p_on)):
                radiance = resolve_last(radiance)
        else:
            radiance = jax.lax.cond(
                jnp.any(p_on), resolve_last, lambda rad: rad, radiance
            )
    elif fused and bounces > 1:
        if has_cmask:
            _, _, rng, rad3, att3, _, pxi, _, _ = carry
        else:
            _, _, rng, rad3, att3, _, pxi, _ = carry
        # ONE unsort for the whole path: radiance*attenuation first so
        # only 3 colour columns + the RNG state ride it (w is 0 always)
        out3 = rad3 * att3
        _, o0, o1, o2, rng = jax.lax.sort(
            (pxi, out3[:, 0], out3[:, 1], out3[:, 2], rng), num_keys=1
        )
        out = jnp.stack([o0, o1, o2, jnp.zeros_like(o0)], axis=-1)
        if n_rays is not None:
            return out, rng, n_rays
        return out, rng
    elif persistent and bounces > 1:
        if has_cmask:
            _, _, rng, radiance, attenuation, _, pxi, _ = carry
        else:
            _, _, rng, radiance, attenuation, _, pxi = carry
        # restore original lane order ONCE at path exit: pxi is a
        # permutation of iota, so sorting by it is an exact inverse. The
        # radiance attenuation product happens before the unsort so only
        # 4 colour columns + the RNG state ride it.
        out = radiance * attenuation
        _, o0, o1, o2, o3, rng = jax.lax.sort(
            (pxi, out[:, 0], out[:, 1], out[:, 2], out[:, 3], rng),
            num_keys=1,
        )
        out = jnp.stack([o0, o1, o2, o3], axis=-1)
        if n_rays is not None:
            return out, rng, n_rays
        return out, rng
    else:
        _, _, rng, radiance, attenuation, _ = carry
    if n_rays is not None:
        return radiance * attenuation, rng, n_rays
    return radiance * attenuation, rng


def _flat_shade(pack: ScenePack, closest, ro, rd):
    """raytpu extension: primary-hit base colour (BASELINE config 1).
    Not a reference mode; used for intersection benchmarks and debugging."""
    hit = closest(ro, rd, 0.001, F32_MAX)
    _, _, uv, mat, _ = _shade_inputs(pack, ro, rd, hit)
    if pack.has_textures:
        tex = sample_bilinear(pack.tex_atlas, pack.tex_size, mat["tex_id"],
                              uv)
        color = jnp.where(mat["has_tex"][:, None], tex, mat["color"])
    else:
        color = mat["color"]
    return jnp.where(hit.valid[:, None], color, 0.0)


def _choose_intersectors(pack: ScenePack, config: RenderConfig):
    """Resolve config.intersector; returns ((closest, any), packet_mode,
    mixed_fn-or-None, prefer_mixed, bounce_pair-or-None).  prefer_mixed
    marks resolutions whose bounce waves should ride the deferred-NEE
    mixed query regardless of config.bounce_backend (the beyond-VMEM
    binned-everything path). bounce_pair is a (closest, any) pair the
    engine substitutes for coherence-sorted BOUNCE waves only — the
    strand kernel, which beats the packet kernel 2.4-3.1x there while
    the packet kernel keeps primary/first-shadow waves
    (benchmarks/waves.py ab).

    'auto' picks the Pallas packet kernel on TPU whenever the BVH fits its
    VMEM budget, the dense brute-force sweep for small scenes elsewhere,
    and the XLA threaded-BVH loop otherwise."""
    from ..kernels.intersect_pallas import (
        make_packet_intersectors,
        vmem_budget_ok,
    )

    which = config.intersector
    if which == "auto":
        try:
            platform = jax.devices()[0].platform.lower()
        except Exception:
            platform = "cpu"
        on_tpu = "tpu" in platform or "axon" in platform
        if on_tpu and vmem_budget_ok(pack):
            which = "packet"
        elif on_tpu and pack.bvh.strand_rows is not None:
            # beyond-VMEM scenes with a strand tree: the persistent
            # strand kernel walks it straight out of HBM (tree_any row
            # fetches via overlapped async copies) — same traversal and
            # bits as the resident path, measured ~an order of magnitude
            # above the binned treelet route (docs/PROFILE_r5.md). This
            # is how the design scales to whatever HBM holds, like the
            # reference scales to GPU memory (src/state.rs:1145-1246).
            which = "strand"
        elif on_tpu and pack.tl_nodes is not None:
            # no strand tree either (tables='stream' on tiny scenes):
            # every query runs binned with treelet windows streamed
            # HBM->VMEM per packet
            which = "binned"
        elif pack.n_triangles <= config.bruteforce_max_tris:
            which = "brute"
        else:
            which = "bvh"
    if which == "binned":
        from ..kernels.binned import (
            make_binned_intersectors,
            make_binned_query,
        )

        if pack.tl_nodes is None:
            raise ValueError(
                "intersector='binned' needs treelet tables; pack the "
                "scene with treelets='always' (or 'auto' above 4096 "
                "triangles)"
            )
        try:
            platform = jax.devices()[0].platform.lower()
        except Exception:
            platform = "cpu"
        interpret = not ("tpu" in platform or "axon" in platform)
        return (
            make_binned_intersectors(pack, interpret=interpret),
            True,
            make_binned_query(pack, interpret=interpret),
            True,
            None,
        )
    if which == "strand":
        # strand kernels for EVERY wave (primary, shadow, bounce): the
        # beyond-VMEM route (HBM strand tables), or an explicit override
        # for A/Bs on resident scenes. b0 waves arrive block-ordered,
        # bounce waves coherence-sorted — exactly the resident path's
        # wave discipline, so frame results match it bit-for-bit.
        from ..kernels.strand import (
            make_strand_intersectors,
            make_strand_mixed_query,
        )

        if pack.bvh.strand_rows is None:
            raise ValueError(
                "intersector='strand' needs a strand tree; scenes above "
                "the sort threshold pack one by default"
            )
        try:
            platform = jax.devices()[0].platform.lower()
        except Exception:
            platform = "cpu"
        interpret = not ("tpu" in platform or "axon" in platform)
        mixed = None
        if config.bounce_backend == "mixed":
            mixed = make_strand_mixed_query(pack, interpret=interpret)
        pair = make_strand_intersectors(pack, interpret=interpret)
        return (pair, True, mixed, False, pair)
    if which == "packet":
        try:
            platform = jax.devices()[0].platform.lower()
        except Exception:
            platform = "cpu"
        interpret = not ("tpu" in platform or "axon" in platform)
        mixed = None
        if config.bounce_backend == "binned":
            if pack.tl_nodes is None:
                raise ValueError(
                    "bounce_backend='binned' needs treelet tables; pack "
                    "the scene with treelets='always' (or 'auto' above "
                    "4096 triangles)"
                )
            from ..kernels.binned import make_binned_query

            mixed = make_binned_query(pack, interpret=interpret)
        elif config.bounce_backend == "mixed":
            if pack.bvh.strand_rows is None:
                raise ValueError(
                    "bounce_backend='mixed' needs a strand tree; pack "
                    "the scene with the default packed tables"
                )
            from ..kernels.strand import make_strand_mixed_query

            mixed = make_strand_mixed_query(pack, interpret=interpret)
        bounce_pair = None
        if pack.bvh.strand_rows is not None:
            from ..kernels.strand import make_strand_intersectors

            bounce_pair = make_strand_intersectors(
                pack, interpret=interpret
            )
        return (
            make_packet_intersectors(pack, interpret=interpret),
            True,
            mixed,
            False,
            bounce_pair,
        )
    return (
        make_intersectors(
            pack, bruteforce_max_tris=config.bruteforce_max_tris, which=which
        ),
        False,
        None,
        False,
        None,
    )


def _pixel_layout(w: int, tile_h: int, packet_mode: bool):
    """Pixel index layout for one tile.

    Packet mode orders rays in 32x32-pixel blocks (padded) so each Pallas
    packet covers a coherent frustum; returns (px, py_local, unpermute)
    where unpermute maps the flat [R,4] buffer back to [tile_h, w, 4]."""
    if not packet_mode:
        px = jnp.tile(jnp.arange(w, dtype=jnp.int32), tile_h)
        py = jnp.arange(tile_h, dtype=jnp.int32).repeat(w)
        return px, py, lambda img: img.reshape(tile_h, w, 4)

    B = 32
    wp = -(-w // B) * B
    hp = -(-tile_h // B) * B
    pxg, pyg = np.meshgrid(np.arange(wp), np.arange(hp))
    order = lambda a: a.reshape(hp // B, B, wp // B, B).transpose(
        0, 2, 1, 3
    ).reshape(-1)
    px = jnp.asarray(order(pxg), jnp.int32)
    py = jnp.asarray(order(pyg), jnp.int32)

    def unpermute(img):
        img = img.reshape(hp // B, wp // B, B, B, 4)
        img = img.transpose(0, 2, 1, 3, 4).reshape(hp, wp, 4)
        return img[:tile_h, :w]

    return px, py, unpermute


@partial(jax.jit, static_argnames=("config", "tile_h"))
def render_tile(
    pack: ScenePack,
    camera: CameraPack,
    y0: jnp.ndarray,
    config: RenderConfig,
    tile_h: int,
    seed=None,
) -> jnp.ndarray:
    """Render rows [y0, y0 + tile_h) of the frame; returns [tile_h, W, 4].

    One compiled program serves every tile (y0 is a traced scalar), mirroring
    how the reference re-dispatches one compute pipeline per chunk with only
    a uniform update (src/state.rs:336-379). ``seed`` optionally overrides
    config.seed with a *traced* value so callers that vary the seed per
    device shard (parallel/shard.py spp mode) still share this one compiled
    program."""
    w, h = config.width, config.height
    (closest, any_hit), packet_mode, mixed_fn, prefer_mixed, bounce_pair = (
        _choose_intersectors(pack, config)
    )
    px, py_local, unpermute = _pixel_layout(w, tile_h, packet_mode)
    py = y0 + py_local
    if seed is None:
        seed = config.seed
    rng0 = rngk.seed_pixels(px, py, w, config.chunk_size, seed)

    # pixels outside the dispatched chunk grid stay black (_in_chunk_grid)
    in_grid = _in_chunk_grid(px, py, w, h, config.chunk_size)

    pxf = px.astype(jnp.float32)
    pyf = py.astype(jnp.float32)
    sort_bounced = packet_mode and pack.n_triangles > _sort_min_tris()
    use_mixed = sort_bounced and (
        prefer_mixed or config.bounce_backend in ("binned", "mixed")
    )

    def sample_body(_, carry):
        rng, acc = carry
        # per-pixel jitter: + vec2(rand(), rand()) (src/shader.wgsl:413)
        rng, jx = rngk.rand(rng)
        rng, jy = rngk.rand(rng)
        ro, rd = cast_rays(
            pxf + jx, pyf + jy, camera.world, camera.projection, w, h
        )
        if config.mode == "flat":
            color = _flat_shade(pack, closest, ro, rd)
        else:
            color, rng = _trace_paths(
                pack, closest, any_hit, ro, rd, rng, config.bounces,
                mask=in_grid,
                sort_bounced=sort_bounced,
                mixed_fn=mixed_fn if use_mixed else None,
                bounce_pair=bounce_pair,
            )
        return rng, acc + color

    acc0 = jnp.tile((rng0[:, None] * 0).astype(jnp.float32), (1, 4))
    _, acc = jax.lax.fori_loop(0, config.samples, sample_body, (rng0, acc0))
    img = acc / jnp.float32(config.samples)
    img = jnp.where(in_grid[:, None], img, 0.0)
    return unpermute(img)


def count_rays(
    pack: ScenePack, camera: CameraPack, config: RenderConfig
) -> int:
    """Count the ray queries the reference would issue for this frame: one
    primary query per sample plus, per bounce iteration entered, one shadow
    query and one continuation query (cost model of src/shader.wgsl:321-381,
    SURVEY.md §3.4). Exact: runs the real trace loop with a counter."""
    tile_h = _auto_tile_rows(config, pack.n_triangles)
    total = 0
    for y0 in range(0, config.height, tile_h):
        rows = min(tile_h, config.height - y0)
        per_sample = _count_tile(
            pack, camera, jnp.int32(y0), config, tile_h, rows
        )
        # per-sample counts are int32 on device; the frame total can exceed
        # 2^31 (1080p at >= ~120 spp), so widen on the host
        total += int(np.asarray(per_sample, np.int64).sum())
    return total


@partial(jax.jit, static_argnames=("config", "tile_h", "valid_rows"))
def _count_tile(pack, camera, y0, config, tile_h, valid_rows):
    w, h = config.width, config.height
    (closest, any_hit), packet_mode, mixed_fn, prefer_mixed, bounce_pair = (
        _choose_intersectors(pack, config)
    )
    px, py_local, _ = _pixel_layout(w, tile_h, packet_mode)
    py = y0 + py_local
    rng0 = rngk.seed_pixels(px, py, w, config.chunk_size, config.seed)
    # (py < y0 + valid_rows) also drops packet-padding lanes that alias the
    # next tile's pixels — they must not be double counted
    in_grid = _in_chunk_grid(px, py, w, h, config.chunk_size) & (
        py < y0 + valid_rows
    )
    pxf, pyf = px.astype(jnp.float32), py.astype(jnp.float32)
    sort_bounced = packet_mode and pack.n_triangles > _sort_min_tris()
    use_mixed = sort_bounced and (
        prefer_mixed or config.bounce_backend in ("binned", "mixed")
    )

    def body(i, carry):
        rng, totals = carry
        rng, jx = rngk.rand(rng)
        rng, jy = rngk.rand(rng)
        ro, rd = cast_rays(pxf + jx, pyf + jy, camera.world,
                           camera.projection, w, h)
        # _trace_paths counts the primary query itself (its n_rays init)
        _, rng, n = _trace_paths(
            pack, closest, any_hit, ro, rd, rng, config.bounces,
            count_mask=in_grid, mask=in_grid,
            sort_bounced=sort_bounced,
            mixed_fn=mixed_fn if use_mixed else None,
            bounce_pair=bounce_pair,
        )
        return rng, totals.at[i].set(n)

    # one int32 slot per sample; the host widens to int64 when summing
    totals0 = jnp.zeros((config.samples,), jnp.int32)
    _, totals = jax.lax.fori_loop(0, config.samples, body, (rng0, totals0))
    return totals


def _auto_tile_rows(config: RenderConfig, n_tris: int) -> int:
    if config.tile_rows is not None:
        return config.tile_rows
    if n_tris <= config.bruteforce_max_tris:
        # brute force materialises [rays, tri_chunk] intermediates
        budget = 1 << 24
        rows = budget // (config.width * min(n_tris, 512))
    else:
        # BVH/packet path: per-ray state only; bigger tiles amortise sorts
        # and per-wave overheads (1080p frame: 2.9s -> 2.2s vs 2^18 rays;
        # 2^21 takes the whole 1080p frame in ONE tile: 792 -> 740 ms,
        # docs/PROFILE_r3.md — per-ray state is ~100 B so a 2M-ray tile
        # holds ~200 MB, well under HBM)
        rows = (1 << 21) // config.width
    return int(np.clip(rows, 1, config.height))


def render_frame(
    pack: ScenePack, camera: CameraPack, config: RenderConfig
) -> np.ndarray:
    """Full frame, stitched from tiles on the host; returns [H, W, 4] f32
    (the SAMPLES texture contents, src/state.rs:691-696)."""
    tile_h = _auto_tile_rows(config, pack.n_triangles)
    out = np.zeros((config.height, config.width, 4), np.float32)
    for y0 in range(0, config.height, tile_h):
        tile = render_tile(pack, camera, jnp.int32(y0), config, tile_h)
        rows = min(tile_h, config.height - y0)
        out[y0 : y0 + rows] = np.asarray(tile)[:rows]
    return out


def render_frame_tiles(pack, camera, config: RenderConfig):
    """Generator over (y0, rows, tile array) — the progressive API used by
    the GUI and checkpoint/resume (the reference's per-chunk loop,
    src/main.rs:310-317)."""
    tile_h = _auto_tile_rows(config, pack.n_triangles)
    for y0 in range(0, config.height, tile_h):
        tile = render_tile(pack, camera, jnp.int32(y0), config, tile_h)
        rows = min(tile_h, config.height - y0)
        yield y0, rows, np.asarray(tile)[:rows]
