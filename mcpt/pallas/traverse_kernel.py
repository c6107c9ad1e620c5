"""Pallas TPU block-coherent BVH traversal (closest-hit + any-hit kernels).

TPU-native re-design of the reference's per-work-item stack traversal
(``objdef.h:240-275``: one ray per lane, divergent ``stack[64]`` walk).  A TPU
lane cannot follow its own pointer chain — Mosaic has no per-lane gather from
VMEM — so the unit of traversal here is a whole **ray block** of
``SUBT × 128`` rays that shares ONE scalar stack:

- the top-level cluster tree (``mcpt.bvh.cluster.ClusterBVH``) is walked with
  scalar node pops; each popped node's child boxes are fetched with scalar row
  reads and slab-tested against *all* lanes at once (pure VPU work);
- a child is descended if **any** lane hits it (vector → scalar reduction), so
  the block visits the union of its rays' node sets — cheap while rays in a
  block are coherent (primary rays, shadow rays to one light), bounded by the
  dense cluster test even when they are not;
- near/far child ordering uses the block's mean ray direction (one scalar key
  per child), the block analogue of the reference's per-ray ordered descent;
- leaves are **clusters** of ``leaf_size`` Morton-adjacent triangles tested
  with the same scalar-broadcast Wald loop the megakernel uses — dense,
  fully-utilized vector work instead of one divergent triangle per lane.

Every Mosaic gotcha from the megakernel applies (no bool vectors in carries,
iota-derived zero inits, f32 masks); the scalar stack lives in SMEM scratch so
the while-loop carry stays small.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mcpt.pallas._interp import interp_mode

from mcpt.bvh.cluster import STACK_CAP, ClusterBVH
from mcpt.types import Hit

# Ray-block geometry: SUBT×128 rays share one traversal stack.  Smaller blocks
# visit tighter node unions (less speculative work for incoherent rays) but
# amortize the scalar pop/push overhead over fewer lanes.  Measured on the
# 108k-tri boxfield (tiled primary rays): S8 11.5, S16 14.2, S32 17.8 Mrays/s.
SUBT = 32
BLKT = SUBT * 128

# STACK_CAP (re-exported from mcpt.bvh.cluster): the stack can never
# overflow — ``collapse_wide`` rejects at build time any tree whose
# worst-case occupancy 7·depth + 8 exceeds it, so the clamped store at the
# push site is defence-in-depth, not a silent-corruption path.

_BIG = 3.0e38


def _slab_scalars(bx0, by0, bz0, bx1, by1, bz1, ox, oy, oz, ix, iy, iz, best):
    """AABB slab test: scalar box vs (SUBT, 128) rays → f32 hit mask + tnear."""
    t0x = (bx0 - ox) * ix
    t1x = (bx1 - ox) * ix
    t0y = (by0 - oy) * iy
    t1y = (by1 - oy) * iy
    t0z = (bz0 - oz) * iz
    t1z = (bz1 - oz) * iz
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    hit = (tf >= jnp.maximum(tn, 0.0)) & (tn < best)
    return hit


def _make_traverse_kernel(n_wide: int, n_clusters: int, leaf_size: int,
                          any_hit: bool, subt: int = SUBT):
    """Kernel over the 8-wide top tree: stack entries < n_wide are wide-node
    indices, entries >= n_wide are (cluster id + n_wide) leaf visits."""

    def kernel(sf_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
               lim_ref, nodes_ref, tri_ref, t_ref, i_ref, nx_ref, ny_ref,
               nz_ref, stack_ref, flag_ref):
        t_min = sf_ref[0]

        row = jax.lax.broadcasted_iota(jnp.int32, (subt, 128), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (subt, 128), 1)
        zeros = (row + col).astype(jnp.float32) * 0.0

        # inactive lanes carry a poisoned origin (set host-side to +2e38): the
        # slab test can never pass, so dead lanes add nothing to the union.
        ox = ox_ref[:]
        oy = oy_ref[:]
        oz = oz_ref[:]
        dx = dx_ref[:]
        dy = dy_ref[:]
        dz = dz_ref[:]
        lim = lim_ref[:]  # per-lane t upper bound (occlusion); _BIG for closest

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

        # per-lane best state lives in the output refs (mutated in place by the
        # pl.when leaf branch, so the while carry stays one scalar)
        t_ref[:] = zeros + (0.0 if any_hit else _BIG)
        i_ref[:] = zeros - 1.0
        nx_ref[:] = zeros
        ny_ref[:] = zeros
        nz_ref[:] = zeros

        # mean-direction octant selects the build-time child traversal order
        o_idx = ((mx > 0.0).astype(jnp.int32)
                 + 2 * (my > 0.0).astype(jnp.int32)
                 + 4 * (mz > 0.0).astype(jnp.int32))

        stack_ref[0] = jnp.int32(0)

        def cond(c):
            sp, done = c
            return (sp > 0) & (done == 0)

        def body(c):
            sp, done = c
            sp = sp - 1
            node = stack_ref[sp]
            is_leaf = node >= n_wide

            # push flags are zeroed every iteration; only _internal sets them,
            # so a leaf pop (or a mispredicated interpret-mode arm) pushes
            # nothing without any branch-local bookkeeping
            for j in range(8):
                flag_ref[8 + j] = jnp.int32(0)

            @pl.when(jnp.logical_not(is_leaf))
            def _internal():
                nc = jnp.clip(node, 0, n_wide - 1)
                cur = t_ref[:]
                if any_hit:
                    prune = jnp.where(cur < 0.5, lim, -_BIG)  # occluded: never
                else:
                    prune = jnp.minimum(cur, lim)
                # all 8 child hit masks pack into ONE int32 bitmask per lane,
                # OR-reduced across the block with a roll tree, so the whole
                # descent decision costs a single vector→scalar round trip —
                # measured ~500 cycles each, it was 8×/pop the kernel's
                # dominant cost
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
                bits = jnp.max(m)  # every element now holds the full bitmask
                any_k = [
                    (jax.lax.shift_right_logical(bits, k) & 1) > 0
                    for k in range(8)
                ]

                # far-to-near child order for this block's octant (3-bit
                # digits, slot j at bits 3j) — near child ends on stack top.
                # Mosaic scalar VMEM loads need a STATIC lane index, so all 8
                # octant codes are read and the block's one selected by wheres.
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
                        m = kj == k
                        e = jnp.where(m, enc_k[k], e)
                        a = jnp.where(m, any_k[k], a)
                    flag_ref[j] = e
                    flag_ref[8 + j] = (a & gate).astype(jnp.int32)

            @pl.when(is_leaf)
            def _leaf():
                # no-op-if-mispredicated discipline: the row base is clamped
                # into the table and updates carry an arithmetic leaf gate
                leaf_gate = is_leaf
                cl_id = jnp.clip(node - n_wide, 0, n_clusters - 1)
                base = cl_id * leaf_size
                gf = leaf_gate.astype(jnp.float32)
                glim = lim * gf - _BIG * (1.0 - gf)  # mispredicated: no hits
                bt = t_ref[:]
                bi = i_ref[:]
                ax_ = nx_ref[:]
                ay_ = ny_ref[:]
                az_ = nz_ref[:]
                # statically unrolled cluster test — straight-line code lets
                # the scalar core prefetch every row while the VPU works
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
                        bi = jnp.where(ok, r_.astype(jnp.float32), bi)
                        ax_ = jnp.where(ok, tri_ref[r_, 12], ax_)
                        ay_ = jnp.where(ok, tri_ref[r_, 13], ay_)
                        az_ = jnp.where(ok, tri_ref[r_, 14], az_)
                t_ref[:] = bt
                if not any_hit:
                    i_ref[:] = bi
                    nx_ref[:] = ax_
                    ny_ref[:] = ay_
                    nz_ref[:] = az_

            # apply the (far-to-near) pushes; unconditional stores into the
            # free slot are safe — sp only advances when the push is real
            for j in range(8):
                stack_ref[jnp.minimum(sp, STACK_CAP - 1)] = flag_ref[j]
                sp = sp + flag_ref[8 + j]

            if any_hit:
                # retire the block once every live lane is occluded (checked
                # after leaf visits only — internal pops can't occlude)
                done = jnp.where(
                    is_leaf,
                    1 - jnp.any((t_ref[:] < 0.5) & (live > 0.5)).astype(
                        jnp.int32),
                    done,
                )
            return sp, done

        jax.lax.while_loop(cond, body, (jnp.int32(1), jnp.int32(0)))

    return kernel


def _pad_blocks(x, n_blocks, fill, subt):
    blk = subt * 128
    r = x.shape[0]
    pad = n_blocks * blk - r
    return jnp.pad(x, (0, pad), constant_values=fill).reshape(
        n_blocks * subt, 128
    )


@functools.partial(
    jax.jit,
    static_argnames=("n_clusters", "leaf_size", "any_hit", "t_min",
                     "interpret", "subt"),
)
def _traverse_jit(wnodes, tri16, origin, direction, active, limit,
                  n_clusters, leaf_size, any_hit, t_min, interpret,
                  subt=SUBT):
    n_wide = wnodes.shape[0]
    r = origin.shape[0]
    blkt = subt * 128
    n_blocks = (r + blkt - 1) // blkt

    # poison dead-lane origins so they never hit anything (and never widen the
    # block's traversal union); padding lanes are dead by construction
    ox = jnp.where(active, origin[:, 0], 2.0e38)
    ox = _pad_blocks(ox, n_blocks, 2.0e38, subt)
    oy = _pad_blocks(origin[:, 1], n_blocks, 0.0, subt)
    oz = _pad_blocks(origin[:, 2], n_blocks, 0.0, subt)
    dx = _pad_blocks(direction[:, 0], n_blocks, 1.0, subt)
    dy = _pad_blocks(direction[:, 1], n_blocks, 0.0, subt)
    dz = _pad_blocks(direction[:, 2], n_blocks, 0.0, subt)
    lim = _pad_blocks(limit, n_blocks, 0.0, subt)

    sf = jnp.asarray([t_min], jnp.float32)

    def call(rays):
        ox, oy, oz, dx, dy, dz, lim = rays
        rows = ox.shape[0]
        grid = (rows // subt,)
        blk = lambda i: (i, 0)  # noqa: E731
        ray_spec = pl.BlockSpec((subt, 128), blk, memory_space=pltpu.VMEM)
        out_shape = [
            jax.ShapeDtypeStruct((rows, 128), jnp.float32) for _ in range(5)
        ]
        return pl.pallas_call(
            _make_traverse_kernel(n_wide, n_clusters, leaf_size, any_hit,
                                  subt),
            grid=grid,
            out_shape=out_shape,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                ray_spec, ray_spec, ray_spec, ray_spec, ray_spec, ray_spec,
                ray_spec,
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[ray_spec] * 5,
            scratch_shapes=[
                pltpu.SMEM((STACK_CAP,), jnp.int32),
                pltpu.SMEM((16,), jnp.int32),
            ],
            # whole-array VMEM operands (triangle table ~6 MB + 7 ray planes
            # + 5 outputs) exceed the default 16 MB scoped-vmem budget on
            # NEE-heavy programs (two traverse calls per bounce) — raise the
            # per-kernel cap; v5e VMEM comfortably holds it
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
            ),
            interpret=interp_mode(interpret),
        )(sf, ox, oy, oz, dx, dy, dz, lim, wnodes, tri16)

    rays = (ox, oy, oz, dx, dy, dz, lim)
    # XLA's memory-space assignment keeps some custom-call operands/results in
    # scoped VMEM; past ~1M rays that overflows the 16M scoped limit.  Bound
    # it by slicing into ≤512k-ray segments with a STATIC python loop of
    # sequential pallas calls — a lax.map/scan here stacks the segments into
    # one (k, 4096, 128) array that memory-space assignment then ALSO places
    # in scoped VMEM (16.8 MB at 3.7M rays), which aborts compilation on
    # NEE-heavy programs ("Ran out of memory in memory space vmem ...
    # scoped").  Static slices of HBM arrays don't get scoped.
    chunk_rows = 4096
    total_rows = ox.shape[0]
    if total_rows > chunk_rows:
        seg_pad = (-total_rows) % chunk_rows
        if seg_pad:
            rays = tuple(
                jnp.pad(x, ((0, seg_pad), (0, 0)),
                        constant_values=2.0e38 if k == 0 else 0.0)
                for k, x in enumerate(rays)
            )
        k = rays[0].shape[0] // chunk_rows
        outs = [
            call(tuple(x[j * chunk_rows:(j + 1) * chunk_rows] for x in rays))
            for j in range(k)
        ]
        t, i, nx, ny, nz = (
            jnp.concatenate(parts, axis=0) for parts in zip(*outs)
        )
    else:
        t, i, nx, ny, nz = call(rays)

    flat = lambda a: a.reshape(-1)[: r]  # noqa: E731
    return flat(t), flat(i), flat(nx), flat(ny), flat(nz)


def intersect_clusters(cl: ClusterBVH, origin, direction, active=None,
                       t_max=None, t_min: float = 1e-4,
                       interpret: bool | None = None,
                       subt: int = SUBT) -> Hit:
    """Closest hit through the block-coherent kernel → ``types.Hit``.

    Drop-in for ``traverse.intersect_bvh`` on clustered scenes; ``interpret``
    defaults to the TPU interpreter on CPU hosts (tests) and compiled on TPU.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = origin.shape[0]
    if active is None:
        active = jnp.ones((r,), bool)
    limit = (jnp.full((r,), _BIG, jnp.float32) if t_max is None
             else jnp.broadcast_to(t_max, (r,)).astype(jnp.float32))
    t, i, nx, ny, nz = _traverse_jit(
        cl.wnodes, cl.tri16, origin, direction, active, limit,
        cl.n_clusters, cl.leaf_size, False, t_min, interpret, subt,
    )
    valid = i >= 0.0
    row = jnp.where(valid, i, 0.0).astype(jnp.int32)
    tri = jnp.where(valid, cl.tri_map[row], -1)
    t = jnp.where(valid, t, jnp.inf)
    point = origin + direction * jnp.where(valid, t, 0.0)[:, None]
    normal = jnp.where(valid[:, None], jnp.stack([nx, ny, nz], axis=-1), 0.0)
    return Hit(t=t, tri=tri, point=point, normal=normal)


def occluded_clusters(cl: ClusterBVH, origin, direction, t_max, active=None,
                      t_min: float = 1e-4,
                      interpret: bool | None = None,
                      subt: int = SUBT) -> jnp.ndarray:
    """Any-hit query: True where some triangle lies in (t_min, t_max).

    The any-hit kernel accepts the FIRST hit per lane (no ordering), prunes
    nodes for already-occluded lanes, and retires the whole block as soon as
    every live lane is occluded — the early-out the reference's closest-hit
    shadow test lacks.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    r = origin.shape[0]
    if active is None:
        active = jnp.ones((r,), bool)
    limit = jnp.broadcast_to(t_max, (r,)).astype(jnp.float32)
    occ, _, _, _, _ = _traverse_jit(
        cl.wnodes, cl.tri16, origin, direction, active, limit,
        cl.n_clusters, cl.leaf_size, True, t_min, interpret, subt,
    )
    return (occ > 0.5) & active
