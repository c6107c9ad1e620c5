"""Pallas TPU cluster megakernel: the full path-trace loop fused with
block-coherent BVH traversal — the large-scene engine.

Round-2's large-scene pipeline ran one ``pallas_call`` per bounce (cluster
traversal), shaded at the XLA level, and re-sorted the multi-million-ray pool
between bounces (``mcpt/render/integrator.py``) — every bounce round-tripped
the whole ray state through HBM, the exact structure whose removal took the
small-scene megakernel from 20.9 to 808 Mrays/s.  This engine applies the
same fusion to the cluster-BVH path: a block of ``SUBT``×128 rays lives in
VMEM for its entire lifetime — camera generation, every *tree-walk*
intersection (the block-coherent shared-stack traversal of
``mcpt.pallas.traverse_kernel``), BSDF sampling, NEE shadow walks, Russian
roulette, and in-kernel path regeneration — with HBM touched only for the
final per-lane radiance writeout.

The shading/estimator half *is* the megakernel's (``megakernel._render_body``
with this module's tree-walk intersectors plugged in), so the two engines
compute the same estimator by construction; the traversal half is the proven
cluster walk (closest-hit + any-hit) with material-id resolution folded into
the leaf loop (a TPU lane cannot gather its own triangle row, so normals and
material ids are where-selected during the 32-row cluster test).

Reference counterparts: the per-frame loop being fused is
``OpenCLApp.cpp:57-82`` (raygen → MAXDEPTH × {intersect, shade}); the
traversal inside it is ``objdef.h:240-275``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt.pallas._interp import interp_mode

from mcpt import types as T
from mcpt.bvh.cluster import ClusterBVH
from mcpt.pallas import megakernel as mk
from mcpt.pallas.traverse_kernel import STACK_CAP, SUBT, _slab_scalars

BLKT = SUBT * 128

_BIG = 3.0e38


class ClusterMegaScene(NamedTuple):
    """Device tables for the fused cluster engine (built once per scene)."""

    wnodes: jnp.ndarray  # (Nw, 64) f32 — 8-wide top tree (ClusterBVH.wnodes)
    tri16: jnp.ndarray  # (C·T, 16) f32 — cluster-ordered triangle rows
    matt: jnp.ndarray  # (M, 16) f32 — material constants
    lit: jnp.ndarray  # (L, 16) f32 — NEE light table
    n_clusters: int
    leaf_size: int
    n_mats: int
    n_lights: int
    eps: float
    total_light_area: float
    # scene AABB (for the hybrid pipeline's inter-bounce coherence sort keys)
    bb_lo: tuple = (0.0, 0.0, 0.0)
    bb_inv_ext: tuple = (1.0, 1.0, 1.0)


def build_cluster_megascene(scene: T.Scene, lights=None) -> ClusterMegaScene:
    """Scene (with ``scene.clusters`` built) → fused-engine tables."""
    cl: ClusterBVH = scene.clusters
    assert cl is not None, "scene has no cluster BVH (build_scene builds one)"
    matt = mk.pack_materials(scene.materials)
    lit, n_lights, total_area = mk.pack_lights(scene, lights)
    v = np.asarray(scene.geom.verts, np.float32).reshape(-1, 3)
    lo = v.min(axis=0)
    ext = np.maximum(v.max(axis=0) - lo, 1e-12)
    return ClusterMegaScene(
        wnodes=cl.wnodes,
        tri16=cl.tri16,
        matt=jnp.asarray(matt),
        lit=jnp.asarray(lit),
        n_clusters=cl.n_clusters,
        leaf_size=cl.leaf_size,
        n_mats=matt.shape[0],
        n_lights=n_lights,
        eps=float(scene.eps),
        total_light_area=total_area,
        bb_lo=tuple(float(x) for x in lo),
        bb_inv_ext=tuple(float(x) for x in 1.0 / ext),
    )


def _make_cluster_intersectors(n_wide, n_clusters, leaf_size, subt,
                               nodes_ref, tri_ref, t_ref, nx_ref, ny_ref,
                               nz_ref, mid_ref, stack_ref, flag_ref, zeros,
                               row, col, t_min):
    """Tree-walk intersectors satisfying ``_render_body``'s contract.

    One shared scalar stack per ray block (SMEM); per-lane best state lives
    in VMEM scratch refs mutated by the leaf branch so the walk's while-loop
    carry stays two scalars.  Structure is ``traverse_kernel``'s walk with
    the material id joining the in-leaf selects.
    """

    def walk(qx, qy, qz, dx, dy, dz, lim, act, any_hit):
        # inactive lanes carry a poisoned origin: the slab test can never
        # pass, so they add nothing to the block's traversal union
        ox = jnp.where(act > 0.0, qx, 2.0e38)
        oy = qy
        oz = qz

        tiny = 1e-30
        ix = 1.0 / jnp.where(jnp.abs(dx) < tiny,
                             jnp.where(dx < 0.0, -tiny, tiny), dx)
        iy = 1.0 / jnp.where(jnp.abs(dy) < tiny,
                             jnp.where(dy < 0.0, -tiny, tiny), dy)
        iz = 1.0 / jnp.where(jnp.abs(dz) < tiny,
                             jnp.where(dz < 0.0, -tiny, tiny), dz)

        # block mean direction → scalar near/far ordering keys
        live = (ox < 1.0e38).astype(jnp.float32)
        mx = jnp.sum(dx * live)
        my = jnp.sum(dy * live)
        mz = jnp.sum(dz * live)
        o_idx = ((mx > 0.0).astype(jnp.int32)
                 + 2 * (my > 0.0).astype(jnp.int32)
                 + 4 * (mz > 0.0).astype(jnp.int32))

        t_ref[:] = zeros + (0.0 if any_hit else _BIG)
        if not any_hit:
            nx_ref[:] = zeros
            ny_ref[:] = zeros
            nz_ref[:] = zeros
            mid_ref[:] = zeros

        stack_ref[0] = jnp.int32(0)

        def cond(c):
            sp, done = c
            return (sp > 0) & (done == 0)

        def body(c):
            sp, done = c
            sp = sp - 1
            node = stack_ref[sp]
            is_leaf = node >= n_wide

            for j in range(8):
                flag_ref[8 + j] = jnp.int32(0)

            @pl.when(jnp.logical_not(is_leaf))
            def _internal():
                nc = jnp.clip(node, 0, n_wide - 1)
                cur = t_ref[:]
                if any_hit:
                    prune = jnp.where(cur < 0.5, lim, -_BIG)
                else:
                    prune = cur
                # all 8 child hit masks pack into ONE int32 bitmask per lane,
                # OR-reduced across the block with a roll tree (one
                # vector→scalar round trip per pop)
                enc_k = []
                m = None
                for k in range(8):
                    bx0 = nodes_ref[nc, 6 * k + 0]
                    by0 = nodes_ref[nc, 6 * k + 1]
                    bz0 = nodes_ref[nc, 6 * k + 2]
                    bx1 = nodes_ref[nc, 6 * k + 3]
                    by1 = nodes_ref[nc, 6 * k + 4]
                    bz1 = nodes_ref[nc, 6 * k + 5]
                    h = _slab_scalars(bx0, by0, bz0, bx1, by1, bz1,
                                      ox, oy, oz, ix, iy, iz, prune)
                    hk = h.astype(jnp.int32) << k
                    m = hk if m is None else m | hk
                    enc_k.append(nodes_ref[nc, 48 + k].astype(jnp.int32))
                s_ = 1
                while s_ < 128:  # OR over lanes
                    m = m | pltpu.roll(m, s_, axis=1)
                    s_ *= 2
                s_ = 1
                while s_ < subt:  # OR over sublanes
                    m = m | pltpu.roll(m, s_, axis=0)
                    s_ *= 2
                bits = jnp.max(m)
                any_k = [
                    (jax.lax.shift_right_logical(bits, k) & 1) > 0
                    for k in range(8)
                ]

                # far-to-near child order for this block's octant
                code = nodes_ref[nc, 56].astype(jnp.int32)
                for o in range(1, 8):
                    code = jnp.where(
                        o_idx == o, nodes_ref[nc, 56 + o].astype(jnp.int32),
                        code,
                    )
                gate = jnp.logical_not(is_leaf)
                for j in range(8):
                    kj = jax.lax.shift_right_logical(code, 3 * j) & 7
                    e = enc_k[0]
                    a = any_k[0]
                    for k in range(1, 8):
                        sel = kj == k
                        e = jnp.where(sel, enc_k[k], e)
                        a = jnp.where(sel, any_k[k], a)
                    flag_ref[j] = e
                    flag_ref[8 + j] = (a & gate).astype(jnp.int32)

            @pl.when(is_leaf)
            def _leaf():
                leaf_gate = is_leaf
                cl_id = jnp.clip(node - n_wide, 0, n_clusters - 1)
                base = cl_id * leaf_size
                gf = leaf_gate.astype(jnp.float32)
                glim = lim * gf - _BIG * (1.0 - gf)  # mispredicated: no hits
                bt = t_ref[:]
                if not any_hit:
                    ax_ = nx_ref[:]
                    ay_ = ny_ref[:]
                    az_ = nz_ref[:]
                    am_ = mid_ref[:]
                for j in range(leaf_size):
                    r_ = base + j
                    a00 = tri_ref[r_, 0]
                    a01 = tri_ref[r_, 1]
                    a02 = tri_ref[r_, 2]
                    a10 = tri_ref[r_, 3]
                    a11 = tri_ref[r_, 4]
                    a12 = tri_ref[r_, 5]
                    a20 = tri_ref[r_, 6]
                    a21 = tri_ref[r_, 7]
                    a22 = tri_ref[r_, 8]
                    b0 = tri_ref[r_, 9]
                    b1 = tri_ref[r_, 10]
                    b2 = tri_ref[r_, 11]
                    opz = a20 * ox + a21 * oy + a22 * oz + b2
                    dpz = a20 * dx + a21 * dy + a22 * dz
                    th = -opz / dpz
                    opx = a00 * ox + a01 * oy + a02 * oz + b0
                    dpx = a00 * dx + a01 * dy + a02 * dz
                    u = opx + th * dpx
                    opy = a10 * ox + a11 * oy + a12 * oz + b1
                    dpy = a10 * dx + a11 * dy + a12 * dz
                    v = opy + th * dpy
                    if any_hit:
                        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                              & (th > t_min) & (th < glim))
                        bt = jnp.maximum(bt, ok.astype(jnp.float32))
                    else:
                        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                              & (th > t_min) & (th < jnp.minimum(bt, glim)))
                        bt = jnp.where(ok, th, bt)
                        ax_ = jnp.where(ok, tri_ref[r_, 12], ax_)
                        ay_ = jnp.where(ok, tri_ref[r_, 13], ay_)
                        az_ = jnp.where(ok, tri_ref[r_, 14], az_)
                        am_ = jnp.where(ok, tri_ref[r_, 15], am_)
                t_ref[:] = bt
                if not any_hit:
                    nx_ref[:] = ax_
                    ny_ref[:] = ay_
                    nz_ref[:] = az_
                    mid_ref[:] = am_

            for j in range(8):
                stack_ref[jnp.minimum(sp, STACK_CAP - 1)] = flag_ref[j]
                sp = sp + flag_ref[8 + j]

            if any_hit:
                done = jnp.where(
                    is_leaf,
                    1 - jnp.any((t_ref[:] < 0.5) & (live > 0.5)).astype(
                        jnp.int32),
                    done,
                )
            return sp, done

        jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))

    big = zeros + _BIG

    def closest(ox, oy, oz, dx, dy, dz, alive):
        walk(ox, oy, oz, dx, dy, dz, big, alive, any_hit=False)
        return t_ref[:], nx_ref[:], ny_ref[:], nz_ref[:], mid_ref[:]

    def occluded(sox, soy, soz, iwx, iwy, iwz, limit, cand):
        walk(sox, soy, soz, iwx, iwy, iwz, limit,
             cand.astype(jnp.float32), any_hit=True)
        return t_ref[:]

    return closest, occluded


def _make_cluster_kernel(n_wide, n_clusters, leaf_size, subt, static_mats,
                         use_nee, use_mis, static_lights, regen):
    def kernel(si_ref, sf_ref, nodes_ref, tri_ref, matt_ref, lit_ref,
               pix_ref, r_ref, g_ref, b_ref, seg_ref, t_s, nx_s, ny_s, nz_s,
               mid_s, stack_s, flag_s):
        make = functools.partial(
            _make_cluster_intersectors, n_wide, n_clusters, leaf_size, subt,
            nodes_ref, tri_ref, t_s, nx_s, ny_s, nz_s, mid_s, stack_s,
            flag_s,
        )
        return mk._render_body(
            static_mats, use_nee, use_mis, static_lights, regen, subt, make,
            lambda: pix_ref[:], si_ref, sf_ref, matt_ref, lit_ref, r_ref,
            g_ref, b_ref, seg_ref,
        )

    return kernel


def render_cluster_mega(cms: ClusterMegaScene, cam: T.Camera, width: int,
                        height: int, spp: int, seed, max_depth: int = 8,
                        rr: bool = False, rr_start: int = 3,
                        nee: bool = False, mis: bool = False,
                        clamp: float = 0.0, t_min: float = 1e-4,
                        interpret: bool | None = None,
                        schedule: str = "auto", subt: int = SUBT):
    """Render ``spp`` samples → ((W·H, 3) radiance sum, segments traced).

    Same contract and schedules as ``megakernel.render_mega`` (``"regen"`` —
    one lane per pixel with in-kernel next-sample restart; ``"batch"`` — one
    lane per (sample, pixel)).  Lanes are assigned pixels in square-tile
    order (``camera.tile_order``) so each traversal block walks a compact
    node union; radiance is returned in pixel order.
    """
    from mcpt.render.camera import tile_order

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if schedule == "auto":
        schedule = "regen" if spp > 1 and mk._BOUNCE_LOOP == "while" else "batch"
    if schedule == "regen" and mk._BOUNCE_LOOP != "while":
        raise RuntimeError(
            "schedule='regen' needs data-dependent while_loop support "
            f"(_BOUNCE_LOOP={mk._BOUNCE_LOOP!r}); use schedule='batch'"
        )
    assert schedule in ("regen", "batch"), schedule

    perm, inv_perm = tile_order(width, height, block=subt * 128)
    pix = jnp.asarray(perm)
    radiance_perm, segs = _render_cluster_jit(
        cms.wnodes, cms.tri16, cms.matt, cms.lit, pix, cam, width, height,
        spp, seed, max_depth, rr, rr_start, nee and cms.n_lights > 0, mis,
        clamp, t_min, interpret, cms.n_clusters, cms.leaf_size, cms.n_mats,
        cms.n_lights, cms.eps, cms.total_light_area, schedule == "regen",
        subt,
    )
    return radiance_perm[jnp.asarray(inv_perm)], segs


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "rr", "rr_start",
                     "nee", "mis", "clamp", "t_min", "interpret",
                     "n_clusters", "leaf_size", "n_mats", "n_lights", "eps",
                     "total_light_area", "regen", "subt"),
)
def _render_cluster_jit(wnodes, tri16, matt, lit, pix, cam, width, height,
                        spp, seed, max_depth, rr, rr_start, nee, mis, clamp,
                        t_min, interpret, n_clusters, leaf_size, n_mats,
                        n_lights, eps, total_light_area, regen=False,
                        subt=SUBT, sample_base=0):
    n_wide = wnodes.shape[0]
    blkt = subt * 128
    # ``pix`` holds this call's (globally-ided) pixels — the whole image
    # single-chip, or one shard's slice of the tile permutation under
    # ``mcpt.dist.render_cluster_sharded``; ``sample_base`` offsets the
    # global sample indices (samples-axis shards render disjoint slices of
    # the single-chip (sample, pixel) RNG schedule with the same seed)
    n_pixels = pix.shape[0]
    n_rays = n_pixels if regen else n_pixels * spp
    n_blocks = (n_rays + blkt - 1) // blkt

    si = jnp.array(
        [width, height, 0, max_depth, 0, int(rr), rr_start, n_pixels,
         n_mats, n_lights, 0, width * height, spp, 0],
        jnp.int32,
    )
    si = si.at[4].set(jnp.asarray(seed, jnp.int32))
    si = si.at[13].set(jnp.asarray(sample_base, jnp.int32))
    sf = jnp.concatenate(
        [
            cam.position.reshape(3),
            cam.forward.reshape(3),
            cam.right.reshape(3),
            cam.up.reshape(3),
            jnp.stack(
                [
                    cam.half_width.reshape(()),
                    cam.half_height.reshape(()),
                    jnp.float32(eps),
                    jnp.float32(t_min),
                ]
            ),
            jnp.asarray([total_light_area], jnp.float32),
            cam.is_ortho.reshape(1),
            jnp.asarray([clamp], jnp.float32),
        ]
    ).astype(jnp.float32)

    # per-lane pixel ids, tile order, sample-major; pad lanes duplicate the
    # last tile's pixels (coherent, and their radiance is sliced off below)
    pix_full = pix if regen else jnp.tile(pix, spp)
    pad = n_blocks * blkt - n_rays
    pix_full = jnp.pad(pix_full, (0, pad), mode="edge").reshape(
        n_blocks * subt, 128
    )

    grid = (n_blocks,)
    lane_spec = pl.BlockSpec((subt, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((n_blocks * subt, 128), jnp.float32)
        for _ in range(4)
    ]
    r, g, b, segs = pl.pallas_call(
        _make_cluster_kernel(n_wide, n_clusters, leaf_size, subt,
                             n_mats if n_mats <= 64 else None, nee, mis,
                             n_lights, regen),
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            lane_spec,
        ],
        out_specs=[lane_spec] * 4,
        scratch_shapes=[
            pltpu.VMEM((subt, 128), jnp.float32),  # best t / occlusion
            pltpu.VMEM((subt, 128), jnp.float32),  # normal x
            pltpu.VMEM((subt, 128), jnp.float32),  # normal y
            pltpu.VMEM((subt, 128), jnp.float32),  # normal z
            pltpu.VMEM((subt, 128), jnp.float32),  # material id
            pltpu.SMEM((STACK_CAP,), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
        ],
        # whole-array VMEM operands (triangle table ~7 MB at 108k tris)
        # exceed the default 16 MB scoped budget — raise the per-kernel cap
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp_mode(interpret),
    )(si, sf, wnodes, tri16, matt, lit, pix_full)

    rad = jnp.stack(
        [r.reshape(-1)[:n_rays], g.reshape(-1)[:n_rays],
         b.reshape(-1)[:n_rays]],
        axis=-1,
    )
    if regen:
        radiance = rad  # each lane already accumulated all spp samples
    else:
        radiance = rad.reshape(spp, n_pixels, 3).sum(axis=0)
    segments = jnp.sum(segs.reshape(-1)[:n_rays])
    return radiance, segments


# ---------------------------------------------------------------------------
# Hybrid pipeline: fused bounce kernel + inter-bounce coherence sort
# ---------------------------------------------------------------------------
#
# Measured on the 108k-tri boxfield (depth 8): the all-in-kernel bounce loop
# above runs 1.45 Mrays/s because deep-bounce ray blocks are fixed at camera
# time and traverse huge node unions, while the wavefront pipeline's
# inter-bounce re-sort reaches 4.4 Mrays/s — coherence beats fusion.  The
# hybrid takes both: ONE pallas call per bounce fuses closest-hit walk,
# material resolve, shading, the NEE shadow walk, and Russian roulette (no
# XLA-level shading, no separate shadow-traversal call, no hit-payload round
# trips), and between bounces the flat ray state is re-sorted at the XLA
# level by (coarse origin cell, direction octant) so every block stays
# coherent at every depth.  RNG ids ride the sort, so the result is the same
# estimator as the batch-schedule engines (same (sample, pixel) streams).


def _make_bounce_kernel(n_wide, n_clusters, leaf_size, subt, static_mats,
                        use_nee, use_mis, static_lights):
    def kernel(si_ref, sf_ref, nodes_ref, tri_ref, matt_ref, lit_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               tr_ref, tg_ref, tb_ref, rr_ref, rg_ref, rb_ref,
               al_ref, in_ref, ps_ref, pp_ref, id_ref,
               oox, ooy, ooz, odx, ody, odz, otr, otg, otb, orr, org, orb,
               oal, oin, ops_, opp, oseg,
               t_s, nx_s, ny_s, nz_s, mid_s, stack_s, flag_s):
        sub = ox_ref.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sub, 128), 1)
        zeros = (row + col).astype(jnp.float32) * 0.0
        seed = si_ref[4]
        t_min = sf_ref[15]

        closest_fn, occluded_fn = _make_cluster_intersectors(
            n_wide, n_clusters, leaf_size, subt, nodes_ref, tri_ref, t_s,
            nx_s, ny_s, nz_s, mid_s, stack_s, flag_s, zeros, row, col, t_min,
        )
        core = mk._make_bounce_core(
            static_mats, use_nee, use_mis, static_lights, si_ref, sf_ref,
            matt_ref, lit_ref, closest_fn, occluded_fn, zeros, seed,
        )

        depth = si_ref[13]
        salt0 = 8 * depth + 3
        pidx = id_ref[:]
        depth_ok = (depth + 1 < si_ref[3]).astype(jnp.float32)
        rr_on = ((si_ref[5] > 0) & (depth >= si_ref[6])).astype(jnp.float32)

        # all-dead blocks (the re-sort keys dead rays last, so they pile up
        # in trailing blocks) pass their state through untouched — the walk
        # would early-out anyway (poisoned origins), but this also skips the
        # few-hundred-op shade arithmetic
        ins = (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tr_ref,
               tg_ref, tb_ref, rr_ref, rg_ref, rb_ref, al_ref, in_ref,
               ps_ref, pp_ref)
        outs = (oox, ooy, ooz, odx, ody, odz, otr, otg, otb, orr, org, orb,
                oal, oin, ops_, opp)
        for i_ref, o_ref in zip(ins, outs):
            o_ref[:] = i_ref[:]
        oseg[:] = zeros

        @pl.when(jnp.any(al_ref[:] > 0.0))
        def _live_block():
            st = (ox_ref[:], oy_ref[:], oz_ref[:], dx_ref[:], dy_ref[:],
                  dz_ref[:], tr_ref[:], tg_ref[:], tb_ref[:], rr_ref[:],
                  rg_ref[:], rb_ref[:], al_ref[:], in_ref[:],
                  zeros,  # per-call segment counter
                  ps_ref[:], pp_ref[:])
            st = core(st, salt0, pidx, depth_ok, rr_on)
            (nox, noy, noz, ndx, ndy, ndz, ntr, ntg, ntb, nrr, nrg, nrb,
             nal, nin, nsegs, nps, npp) = st
            oox[:] = nox
            ooy[:] = noy
            ooz[:] = noz
            odx[:] = ndx
            ody[:] = ndy
            odz[:] = ndz
            otr[:] = ntr
            otg[:] = ntg
            otb[:] = ntb
            orr[:] = nrr
            org[:] = nrg
            orb[:] = nrb
            oal[:] = nal
            oin[:] = nin
            ops_[:] = nps
            opp[:] = npp
            oseg[:] = nsegs

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "rr", "rr_start", "nee", "mis", "clamp",
                     "t_min", "interpret", "n_clusters", "leaf_size",
                     "n_mats", "n_lights", "eps", "total_light_area",
                     "subt"),
)
def _fused_bounce_jit(wnodes, tri16, matt, lit, state, rng_id, seed, depth,
                      max_depth, rr, rr_start, nee, mis, clamp, t_min,
                      interpret, n_clusters, leaf_size, n_mats, n_lights,
                      eps, total_light_area, subt=SUBT):
    """One fused bounce over the whole (rows, 128)-blocked ray state."""
    n_wide = wnodes.shape[0]
    rows = state[0].shape[0]
    si = jnp.array(
        [0, 0, 0, max_depth, 0, int(rr), rr_start, 1, n_mats, n_lights, 0,
         1, 1, 0],
        jnp.int32,
    )
    si = si.at[4].set(jnp.asarray(seed, jnp.int32))
    si = si.at[13].set(jnp.asarray(depth, jnp.int32))
    sf = jnp.zeros((19,), jnp.float32)
    sf = sf.at[14].set(eps).at[15].set(t_min)
    sf = sf.at[16].set(total_light_area).at[18].set(clamp)

    grid = (rows // subt,)
    lane_spec = pl.BlockSpec((subt, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, 128), jnp.float32)
                 for _ in range(17)]
    outs = pl.pallas_call(
        _make_bounce_kernel(n_wide, n_clusters, leaf_size, subt,
                            n_mats if n_mats <= 64 else None, nee, mis,
                            n_lights),
        grid=grid,
        out_shape=out_shape,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [lane_spec] * 17,
        out_specs=[lane_spec] * 17,
        scratch_shapes=[
            pltpu.VMEM((subt, 128), jnp.float32),
            pltpu.VMEM((subt, 128), jnp.float32),
            pltpu.VMEM((subt, 128), jnp.float32),
            pltpu.VMEM((subt, 128), jnp.float32),
            pltpu.VMEM((subt, 128), jnp.float32),
            pltpu.SMEM((STACK_CAP,), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interp_mode(interpret),
    )(si, sf, wnodes, tri16, matt, lit, *state, rng_id)
    return tuple(outs[:16]), outs[16]


def _hybrid_sort_key(ox, oy, oz, dx, dy, dz, alive, bb_lo, bb_inv_ext,
                     coarse_bits: int, key_mode: str = "cell"):
    """Coherence key on flat component arrays, dead rays last.

    ``key_mode`` (measured knob, diningroom d8 NEE+MIS spp8 1280×720 — see
    docs/PERF_NOTES.md round 4):

    - ``"cell"``: (coarse origin cell | direction octant | fine origin) —
      the round-3 key; groups rays by where they START.  5.01 Mrays/s.
    - ``"dir"``: (direction octant | coarse cell | fine origin) — groups by
      where rays POINT first; for interior diffuse bounces the pointed-at
      geometry can predict the block's traversal union better than the
      origin cell.  5.20 Mrays/s.
    - ``"dir6"``: like ``"dir"`` with 2 direction bits per axis (a 6-bit
      direction cell that subsumes the octant).  **7.91 Mrays/s** (+58%
      over the round-3 key): interior bounce blocks become near-cone-pure,
      so the shared-stack walk's per-block cluster union collapses.
    - ``"dir9"``: 3 direction bits per axis (512 cones; fine origin bits
      shrink to keep the key in 31 bits).
    """
    from mcpt.bvh import lbvh

    u = jnp.stack([
        jnp.clip((ox - bb_lo[0]) * bb_inv_ext[0], 0.0, 0.999999),
        jnp.clip((oy - bb_lo[1]) * bb_inv_ext[1], 0.0, 0.999999),
        jnp.clip((oz - bb_lo[2]) * bb_inv_ext[2], 0.0, 0.999999),
    ], axis=-1)
    m = lbvh.morton30(u)
    octant = ((dx > 0).astype(jnp.int32) + 2 * (dy > 0).astype(jnp.int32)
              + 4 * (dz > 0).astype(jnp.int32))
    fine_bits = min(30 - coarse_bits, 12)
    coarse = m >> (30 - coarse_bits)
    fine = (m >> (30 - coarse_bits - fine_bits)) & ((1 << fine_bits) - 1)
    if key_mode == "cell":
        key = (coarse << (3 + fine_bits)) | (octant << fine_bits) | fine
    elif key_mode == "dir":
        key = ((octant << (coarse_bits + fine_bits)) | (coarse << fine_bits)
               | fine)
    elif key_mode == "dir6":
        def q2(c):  # 2-bit direction cell per axis, c in [-1, 1]
            return jnp.clip(((c + 1.0) * 2.0).astype(jnp.int32), 0, 3)
        d6 = (q2(dx) << 4) | (q2(dy) << 2) | q2(dz)
        key = ((d6 << (coarse_bits + fine_bits)) | (coarse << fine_bits)
               | fine)
    elif key_mode == "dir9":
        def q3(c):  # 3-bit direction cell per axis (512 cones)
            return jnp.clip(((c + 1.0) * 4.0).astype(jnp.int32), 0, 7)
        d9 = (q3(dx) << 6) | (q3(dy) << 3) | q3(dz)
        fb9 = min(fine_bits, 30 - 9 - coarse_bits)  # keep the key in 31 bits
        key = ((d9 << (coarse_bits + fb9)) | (coarse << fb9)
               | (fine >> (fine_bits - fb9)))
    else:  # pragma: no cover - guarded by static arg validation
        raise ValueError(f"unknown key_mode {key_mode!r}")
    return jnp.where(alive > 0.5, key, jnp.int32(0x7FFFFFFF))


def _xla_camera_rays(cam, width, height, pix, sample_idx, seed, total_px):
    """Camera rays with the megakernel's counter-hash RNG streams, at the
    XLA level — bit-compatible with the in-kernel ``cam_ray`` so the hybrid
    pipeline computes the same estimator as the batch-schedule engines."""
    idx2 = sample_idx * total_px + pix
    pxi = jax.lax.rem(pix, width)
    pyi = jax.lax.div(pix, width)
    fx = pxi.astype(jnp.float32) + mk._u01(seed, jnp.int32(1), idx2)
    fy = pyi.astype(jnp.float32) + mk._u01(seed, jnp.int32(2), idx2)
    sx = fx / jnp.float32(width) - 0.5
    sy = fy / jnp.float32(height) - 0.5
    half_w = cam.half_width.reshape(())
    half_h = cam.half_height.reshape(())
    w_ort = cam.is_ortho.reshape(())
    off = (2.0 * sx[:, None] * half_w * cam.right.reshape(1, 3)
           + 2.0 * sy[:, None] * half_h * cam.up.reshape(1, 3))
    d = cam.forward.reshape(1, 3) + (1.0 - w_ort) * off
    dd = d[:, 0] * d[:, 0] + d[:, 1] * d[:, 1] + d[:, 2] * d[:, 2]
    d = d * jax.lax.rsqrt(dd + 1e-20)[:, None]  # ≡ kernel _normalize3
    o = cam.position.reshape(1, 3) + w_ort * off
    return jnp.broadcast_to(o, d.shape), d, idx2


def resolve_key_mode(key_mode: str, compact: tuple | None) -> str:
    """``"auto"`` → ``"dir6"``/``"cell"`` from the pilot live fractions.

    Rays surviving deep (closed interiors — diningroom) → the walk is
    dominated by direction-incoherent diffuse bounces → direction-first
    keys; rays dying fast (open scenes — boxfield) → origin-first keys.
    See ``render_hybrid``'s docstring for the measured A/B.
    """
    if key_mode != "auto":
        return key_mode
    live = tuple(compact) if compact else ()
    return "dir6" if (not live or min(live) >= 0.8) else "cell"


def render_hybrid(cms: ClusterMegaScene, cam: T.Camera, width: int,
                  height: int, spp: int, seed, max_depth: int = 8,
                  rr: bool = False, rr_start: int = 3, nee: bool = False,
                  mis: bool = False, clamp: float = 0.0,
                  t_min: float = 1e-4, interpret: bool | None = None,
                  subt: int = SUBT, coarse_bits: int = 6,
                  resort_every: int = 1, compact: tuple | None = None,
                  key_mode: str = "auto"):
    """Hybrid fused-bounce render → ((W·H, 3) radiance sum, segments).

    Same contract as ``render_cluster_mega``; the pipeline is
    ``fused_bounce → coherence re-sort``, repeated ``max_depth`` times.
    ``resort_every=k`` re-sorts only every k-th bounce (coherence decays
    gradually, the 17-payload sort does not — a measured trade).

    ``compact``: per-depth live-fraction caps (entry d caps the pool
    entering bounce d+1, as in ``RenderOptions.compact`` /
    ``integrator.measure_schedule``).  The coherence sort already keys dead
    rays last, so compaction is a static prefix slice after the sort; the
    dropped tail's (radiance, rng_id) ride along to the final
    sample-reduction sort, so no radiance is lost and no scatter is paid.
    If more paths are live than a cap allows, survivors are Bernoulli
    roulette-selected (throughput scaled 1/p — unbiased; a too-tight cap
    costs variance, never bias) with a 3% margin; the astronomically
    unlikely overflow beyond the margin poisons the segment count with NaN
    rather than silently biasing the image.

    ``key_mode="auto"`` resolves from the compaction schedule (the pilot's
    per-depth live fractions, already in hand): rays surviving deep →
    closed-interior regime where direction-incoherent diffuse bounces
    dominate the walk → ``"dir6"``; rays dying fast → open-scene regime
    where early origin-coherent bounces dominate → ``"cell"``.  Measured
    (1280×720 d8 spp8/16, docs/PERF_NOTES.md round 4): diningroom
    cell 5.01 / dir6 **7.91**, boxfield-108k cell **10.90** / dir6 6.47 —
    the live-fraction proxy picks the winner on both.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    key_mode = resolve_key_mode(key_mode, compact)
    from mcpt.render.camera import tile_order

    perm, _ = tile_order(width, height, block=subt * 128)
    return _render_hybrid_jit(
        cms.wnodes, cms.tri16, cms.matt, cms.lit, jnp.asarray(perm), cam,
        width, height, spp, seed, max_depth, rr, rr_start,
        nee and cms.n_lights > 0, mis, clamp, t_min, interpret,
        cms.n_clusters, cms.leaf_size, cms.n_mats, cms.n_lights, cms.eps,
        cms.total_light_area, cms.bb_lo, cms.bb_inv_ext, subt, coarse_bits,
        resort_every, compact, key_mode=key_mode,
    )


def _compaction_schedule(rows0, max_depth, resort_every, compact, subt):
    """Static per-depth pool heights: ``rows_at[d]`` is the pool height the
    depth-d bounce runs at.  Caps quantize up to a pow2 × {1, 1.25, 1.5,
    1.75} grid — every distinct pool size compiles its own bounce-kernel
    specialization, so bound the shape count (≤2 per octave, ≤14% size
    overshoot) instead of honoring exact fractions."""
    import math as _m

    rows_at = []
    cur_rows = rows0
    for depth in range(max_depth):
        rows_at.append(cur_rows)
        if depth + 1 < max_depth and (depth + 1) % resort_every == 0:
            if compact is not None:
                frac = compact[min(depth, len(compact) - 1)]
                want = max(1.0, frac * rows0)
                oct_ = _m.floor(_m.log2(want))
                cap_rows = cur_rows
                for mult in (1.0, 1.25, 1.5, 1.75, 2.0):
                    lvl = (2 ** oct_) * mult
                    if lvl >= want:
                        cap_rows = int(lvl)
                        break
                cap_rows = max(subt, -(-cap_rows // subt) * subt)
                cur_rows = min(cur_rows, cap_rows)
    return rows_at


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "max_depth", "rr", "rr_start",
                     "nee", "mis", "clamp", "t_min", "interpret",
                     "n_clusters", "leaf_size", "n_mats", "n_lights", "eps",
                     "total_light_area", "bb_lo", "bb_inv_ext", "subt",
                     "coarse_bits", "resort_every", "compact",
                     "key_mode"),
)
def _render_hybrid_jit(wnodes, tri16, matt, lit, perm, cam, width, height,
                       spp, seed, max_depth, rr, rr_start, nee, mis, clamp,
                       t_min, interpret, n_clusters, leaf_size, n_mats,
                       n_lights, eps, total_light_area, bb_lo, bb_inv_ext,
                       subt, coarse_bits, resort_every=1, compact=None,
                       sample_base=0, key_mode="cell"):
    """The hybrid pipeline body.

    ``perm`` holds this call's (globally-ided) pixels — the full tile
    permutation single-chip, or one shard's slice under
    ``mcpt.dist.render_hybrid_sharded``; ``sample_base`` offsets the sample
    indices (a ``samples``-axis shard renders samples
    ``[sample_base, sample_base + spp)`` of the global schedule, with the
    same per-(sample, pixel) RNG streams as a single-chip render of all
    samples).  The returned (n_px, 3) radiance sum follows ascending pixel
    id *within this call's pixel set*.

    Bounces are grouped into ``lax.scan`` segments of equal pool height, so
    the Pallas bounce kernel compiles once per DISTINCT height instead of
    once per depth (round-3's 8 specializations ≈ 48 MB XLA program,
    15-18 min cold — the dominant compile cost).  The in-scan Bernoulli
    roulette runs with p = 1 (an exact no-op: u < 1 always, throughput × 1.0
    is exact in f32) except on segment-boundary steps, so interior steps
    compute bit-identical state to the round-3 unrolled loop.
    """
    blkt = subt * 128
    n_px = perm.shape[0]
    n_px_total = width * height
    n_rays = n_px * spp
    rows = ((n_rays + blkt - 1) // blkt) * subt

    # sample-major pool over tile-permuted pixels (batch-schedule layout)
    pix = jnp.tile(perm, spp)
    smp = jnp.repeat(
        sample_base + jnp.arange(spp, dtype=jnp.int32), n_px
    )
    o, d, rng_id = _xla_camera_rays(cam, width, height, pix, smp,
                                    jnp.asarray(seed, jnp.int32), n_px_total)

    def plane(x, fill=0.0):
        return jnp.pad(x, (0, rows * 128 - n_rays),
                       constant_values=fill).reshape(rows, 128)

    ones = plane(jnp.ones((n_rays,), jnp.float32))
    zer = plane(jnp.zeros((n_rays,), jnp.float32))
    state = (
        plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
        plane(d[:, 0], 1.0), plane(d[:, 1]), plane(d[:, 2]),
        ones, ones, ones,  # throughput
        zer, zer, zer,  # radiance
        plane(jnp.ones((n_rays,), jnp.float32)),  # alive (pads dead via 0 fill)
        zer,  # inside
        zer, zer,  # prev_sc, prev_pdf
    )
    # pad-lane reduce ids: start past every real (sample, pixel) id so the
    # final rid sort keeps them behind real rays (single-chip this equals the
    # legacy ``n_rays + arange`` ids; sharded it must clear the GLOBAL id
    # range, which exceeds the local n_rays)
    pad_base = (sample_base + spp) * n_px_total
    pad_ids = pad_base + jnp.arange(rows * 128 - n_rays, dtype=jnp.int32)
    rid = jnp.concatenate([rng_id, pad_ids]).reshape(rows, 128)
    segs_total = jnp.float32(0.0)
    seed_i = jnp.asarray(seed, jnp.int32)

    rows_at = _compaction_schedule(rows, max_depth, resort_every, compact,
                                   subt)

    def bounce_sort_step(carry, x):
        """One scan step: fused bounce, roulette toward the step's live cap
        (p = 1 ⇒ exact no-op), coherence re-sort (gated by resort_every)."""
        state, rid, segs_total = carry
        depth, live_cap, sort_on = x
        st16, segs = _fused_bounce_jit(
            wnodes, tri16, matt, lit, state, rid, seed, depth, max_depth,
            rr, rr_start, nee, mis, clamp, t_min, interpret, n_clusters,
            leaf_size, n_mats, n_lights, eps, total_light_area, subt,
        )
        segs_total = segs_total + jnp.sum(segs)
        alive = st16[12] > 0.0
        live = jnp.sum(alive.astype(jnp.float32))
        p = jnp.minimum(1.0, live_cap / jnp.maximum(live, 1.0))
        u = mk._u01(seed_i, jnp.int32(1009) + depth, rid)
        kf = (alive & (u < p)).astype(jnp.float32)
        inv_p = 1.0 / p
        state = (st16[:6]
                 + tuple(t * inv_p for t in st16[6:9])
                 + st16[9:12] + (kf,) + st16[13:])

        def do_sort(state, rid):
            flat = [x.reshape(-1) for x in state] + [rid.reshape(-1)]
            key = _hybrid_sort_key(flat[0], flat[1], flat[2], flat[3],
                                   flat[4], flat[5], flat[12], bb_lo,
                                   bb_inv_ext, coarse_bits, key_mode)
            srt = jax.lax.sort((key, *flat), num_keys=1)
            h = state[0].shape[0]
            return (tuple(x.reshape(h, 128) for x in srt[1:17]),
                    srt[17].reshape(h, 128))

        state, rid = jax.lax.cond(sort_on, do_sort,
                                  lambda state, rid: (state, rid),
                                  state, rid)
        return (state, rid, segs_total), None

    def run_segment(state, rid, segs_total, d0, d1):
        """Scan depths [d0, d1) at one pool height (ONE kernel compile)."""
        depths = jnp.arange(d0, d1, dtype=jnp.int32)
        # live cap for the roulette: +inf (p = 1, exact no-op) on interior
        # steps; on the last step of a shrinking segment, 97% of the next
        # segment's lane count (the 3% Bernoulli margin)
        caps = np.full(d1 - d0, np.inf, np.float32)
        nxt = rows_at[d1] if d1 < max_depth else rows_at[-1]
        if d1 < max_depth and nxt < rows_at[d0]:
            caps[-1] = 0.97 * nxt * 128
        sort_on = np.array(
            [((dd + 1) % resort_every == 0) or (dd + 1 == max_depth and
                                                nxt < rows_at[d0])
             for dd in range(d0, d1)], bool,
        )
        (state, rid, segs_total), _ = jax.lax.scan(
            bounce_sort_step, (state, rid, segs_total),
            (depths, jnp.asarray(caps), jnp.asarray(sort_on)),
        )
        return state, rid, segs_total

    tails = []  # dropped (rid, r, g, b) flats — joined at the final reduce
    d0 = 0
    while d0 < max_depth:
        d1 = d0 + 1
        while d1 < max_depth and rows_at[d1] == rows_at[d0]:
            d1 += 1
        state, rid, segs_total = run_segment(state, rid, segs_total, d0, d1)
        if d1 < max_depth and rows_at[d1] < rows_at[d0]:
            cap_rows = rows_at[d1]
            # dead rays sorted last → the dropped tail is all-dead; its
            # accumulated radiance rides to the final reduce.  A live ray
            # in the tail (possible only if the 3% Bernoulli margin is
            # blown — P < 1e-200) poisons the segment count instead of
            # silently biasing the image.
            tail_alive = jnp.sum(state[12][cap_rows:, :])
            segs_total = segs_total + jnp.where(
                tail_alive > 0.0, jnp.float32(jnp.nan), 0.0
            )
            tails.append(tuple(
                x[cap_rows:, :].reshape(-1)
                for x in (rid, state[9], state[10], state[11])
            ))
            state = tuple(x[:cap_rows, :] for x in state)
            rid = rid[:cap_rows, :]
        d0 = d1

    # restore (sample, pixel) order by rng_id, then reduce over samples
    parts = tails + [(rid.reshape(-1), state[9].reshape(-1),
                      state[10].reshape(-1), state[11].reshape(-1))]
    cat = [jnp.concatenate([p[i] for p in parts]) for i in range(4)]
    srt = jax.lax.sort(tuple(cat), num_keys=1)
    rad = jnp.stack([x[:n_rays] for x in srt[1:4]], axis=-1)
    radiance = rad.reshape(spp, n_px, 3).sum(axis=0)
    return radiance, segs_total


def profile_hybrid(cms: ClusterMegaScene, cam: T.Camera, width: int,
                   height: int, spp: int, seed, max_depth: int = 8,
                   rr: bool = False, rr_start: int = 3, nee: bool = False,
                   mis: bool = False, clamp: float = 0.0,
                   t_min: float = 1e-4, interpret: bool | None = None,
                   subt: int = SUBT, coarse_bits: int = 6,
                   resort_every: int = 1, compact: tuple | None = None,
                   key_mode: str = "auto", timer=None):
    """Stage-instrumented twin of ``render_hybrid`` → (timer, radiance, segs).

    Drives the same pipeline host-side with one jit per stage and a forced
    device sync between stages (``runtime.StageTimer``), so the per-stage
    shares the round-3/4 perf work was steered by (bounce kernel vs
    coherence sort vs compaction vs final reduce, docs/PERF_NOTES.md) are a
    CLI feature (``tools/render.py --profile``), not a session script.  The
    TPU answer to the reference's always-on profiling queue + ``timeCost``
    (``oclbasic.cpp:117,232-247``).  Computes the same estimator as
    ``render_hybrid`` (same stage math, same streams); stage-boundary jits
    may reassociate f32, so agreement is to round-off, not bitwise.
    """
    from mcpt.render.camera import tile_order
    from mcpt.runtime import StageTimer

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    nee = nee and cms.n_lights > 0
    key_mode = resolve_key_mode(key_mode, compact)
    timer = timer if timer is not None else StageTimer()

    blkt = subt * 128
    n_px_total = width * height
    perm, _ = tile_order(width, height, block=blkt)
    perm = jnp.asarray(perm)
    n_px = perm.shape[0]
    n_rays = n_px * spp
    rows0 = ((n_rays + blkt - 1) // blkt) * subt
    seed_i = jnp.asarray(seed, jnp.int32)

    @jax.jit
    def raygen():
        pix = jnp.tile(perm, spp)
        smp = jnp.repeat(jnp.arange(spp, dtype=jnp.int32), n_px)
        o, d, rng_id = _xla_camera_rays(cam, width, height, pix, smp,
                                        seed_i, n_px_total)

        def plane(x, fill=0.0):
            return jnp.pad(x, (0, rows0 * 128 - n_rays),
                           constant_values=fill).reshape(rows0, 128)

        ones = plane(jnp.ones((n_rays,), jnp.float32))
        zer = plane(jnp.zeros((n_rays,), jnp.float32))
        state = (
            plane(o[:, 0]), plane(o[:, 1]), plane(o[:, 2]),
            plane(d[:, 0], 1.0), plane(d[:, 1]), plane(d[:, 2]),
            ones, ones, ones, zer, zer, zer,
            plane(jnp.ones((n_rays,), jnp.float32)), zer, zer, zer,
        )
        pad_ids = spp * n_px_total + jnp.arange(rows0 * 128 - n_rays,
                                                dtype=jnp.int32)
        rid = jnp.concatenate([rng_id, pad_ids]).reshape(rows0, 128)
        return state, rid

    @jax.jit
    def roulette(state, rid, depth, live_cap):
        alive = state[12] > 0.0
        live = jnp.sum(alive.astype(jnp.float32))
        p = jnp.minimum(1.0, live_cap / jnp.maximum(live, 1.0))
        u = mk._u01(seed_i, jnp.int32(1009) + depth, rid)
        kf = (alive & (u < p)).astype(jnp.float32)
        inv_p = 1.0 / p
        return (state[:6] + tuple(t * inv_p for t in state[6:9])
                + state[9:12] + (kf,) + state[13:])

    @jax.jit
    def do_sort(state, rid):
        flat = [x.reshape(-1) for x in state] + [rid.reshape(-1)]
        key = _hybrid_sort_key(flat[0], flat[1], flat[2], flat[3], flat[4],
                               flat[5], flat[12], cms.bb_lo, cms.bb_inv_ext,
                               coarse_bits, key_mode)
        srt = jax.lax.sort((key, *flat), num_keys=1)
        h = state[0].shape[0]
        return (tuple(x.reshape(h, 128) for x in srt[1:17]),
                srt[17].reshape(h, 128))

    @jax.jit
    def reduce_final(parts):
        cat = [jnp.concatenate([p[i] for p in parts]) for i in range(4)]
        srt = jax.lax.sort(tuple(cat), num_keys=1)
        rad = jnp.stack([x[:n_rays] for x in srt[1:4]], axis=-1)
        return rad.reshape(spp, n_px, 3).sum(axis=0)

    with timer.stage("raygen"):
        state, rid = raygen()
        timer.sync(state)

    rows_at = _compaction_schedule(rows0, max_depth, resort_every, compact,
                                   subt)
    segs_total = 0.0
    tails = []
    for d in range(max_depth):
        with timer.stage(f"bounce[d{d}]  ({rows_at[d]}×128 pool)"):
            st16, segs = _fused_bounce_jit(
                cms.wnodes, cms.tri16, cms.matt, cms.lit, state, rid, seed,
                jnp.int32(d), max_depth, rr, rr_start, nee, mis, clamp,
                t_min, interpret, cms.n_clusters, cms.leaf_size, cms.n_mats,
                cms.n_lights, cms.eps, cms.total_light_area, subt,
            )
            timer.sync(st16)
        segs_total += float(jnp.sum(segs))
        shrink = d + 1 < max_depth and rows_at[d + 1] < rows_at[d]
        cap = 0.97 * rows_at[d + 1] * 128 if shrink else np.inf
        with timer.stage("roulette"):
            state = roulette(st16, rid, jnp.int32(d), jnp.float32(cap))
            timer.sync(state)
        if ((d + 1) % resort_every == 0 and d + 1 < max_depth) or shrink:
            with timer.stage(f"sort[d{d}]"):
                state, rid = do_sort(state, rid)
                timer.sync(state)
        if shrink:
            cap_rows = rows_at[d + 1]
            with timer.stage("compact-slice"):
                tails.append(tuple(
                    x[cap_rows:, :].reshape(-1)
                    for x in (rid, state[9], state[10], state[11])
                ))
                state = tuple(x[:cap_rows, :] for x in state)
                rid = rid[:cap_rows, :]
                timer.sync(state)

    parts = tails + [(rid.reshape(-1), state[9].reshape(-1),
                      state[10].reshape(-1), state[11].reshape(-1))]
    with timer.stage("final-reduce"):
        radiance = reduce_final(parts)
        timer.sync(radiance)
    return timer, radiance, segs_total
