"""BVH construction-quality metrics: SAH, EPO, LCV.

The TPU-era port of the reference's research harness (``bvhtest.cpp`` +
``kernels/EPO.cl``), with identical metric *definitions* so numbers are
comparable:

- **SAH** (``bvhtest.cpp:104-115``): ``(Σ_internal Cinn·A(n) + Σ_leaf
  Ctri·A(n)) / A(root)`` with the reference's constants Cinn=1.2, Ctri=1
  (``auxiliary.h:9-11``).  One vectorized reduction here.
- **EPO** — Expected Projected Overlap (Aila et al. 2013; ``bvhtest.cpp:
  221-284``): for every leaf triangle, the surface area of the triangle clipped
  against every *non-ancestor* node's AABB, weighted Cinn/Ctri, normalized by
  total triangle area.  The reference walks one leaf at a time on the CPU (and
  one work-item per leaf on GPU, ``EPO.cl:133-197``); here all leaves traverse
  simultaneously as a batched stack walk, with a vectorized Sutherland–Hodgman
  clip over the whole (leaf, node) frontier per step.
- **LCV** — Leaf-Count Variation (``bvhtest.cpp:324-444``): the standard
  deviation of the number of leaf AABBs hit along primary camera rays (pixel
  centers, the reference's aspect-free test ray generator,
  ``bvhtest.cpp:413-424``).
"""

from __future__ import annotations

import math

import numpy as np

C_INN = 1.2  # internal-node traversal cost (auxiliary.h:9-11)
C_TRI = 1.0  # triangle-intersection cost
C_LEAF = 0.0


def _area(bbmin, bbmax):
    d = np.maximum(bbmax - bbmin, 0.0)
    return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                  + d[..., 2] * d[..., 0])


def sah(bvh) -> float:
    """Surface-area-heuristic cost (reference definition, ``bvhtest.cpp:104-115``)."""
    bbmin = np.asarray(bvh.bbmin)
    bbmax = np.asarray(bvh.bbmax)
    n_nodes = bbmin.shape[0]
    n_internal = n_nodes // 2  # == N-1 for 2N-1 nodes
    areas = _area(bbmin, bbmax)
    total = C_INN * areas[:n_internal].sum() + C_TRI * areas[n_internal:].sum()
    return float(total / max(areas[0], 1e-30))


# ---------------------------------------------------------------------------
# EPO
# ---------------------------------------------------------------------------


def _clip_areas(tris: np.ndarray, bbmin: np.ndarray, bbmax: np.ndarray):
    """Vectorized Sutherland–Hodgman: area of each triangle clipped to its AABB.

    tris (P, 3, 3), bbmin/bbmax (P, 3) → (P,) clipped surface area.
    Fixed-capacity polygon buffers (≤ 3 + 6 vertices after 6 plane clips).
    """
    p = tris.shape[0]
    cap = 10
    verts = np.zeros((p, cap, 3), np.float64)
    verts[:, :3] = tris
    count = np.full(p, 3, np.int64)

    for axis in range(3):
        for side in range(2):  # 0: keep ≥ bbmin, 1: keep ≤ bbmax
            bound = (bbmin if side == 0 else bbmax)[:, axis]
            v = verts[:, :, axis]
            if side == 0:
                inside = v >= bound[:, None]
            else:
                inside = v <= bound[:, None]
            idx = np.arange(cap)[None, :]
            valid = idx < count[:, None]
            inside = inside & valid
            nxt = idx + 1
            nxt = np.where(nxt >= count[:, None], 0, nxt)
            take = np.take_along_axis
            v_next = take(verts, nxt[..., None].repeat(3, -1), axis=1)
            in_next = take(inside, nxt, axis=1)

            # each edge emits: current vertex (if inside) + crossing point (if
            # edge crosses the plane)
            denom = v_next[:, :, axis] - verts[:, :, axis]
            t = np.where(
                np.abs(denom) > 1e-30,
                (bound[:, None] - verts[:, :, axis]) / np.where(denom == 0, 1, denom),
                0.0,
            )
            cross_pt = verts + t[..., None] * (v_next - verts)
            crossing = (inside ^ in_next) & valid

            emit = inside.astype(np.int64) + crossing.astype(np.int64)
            pos = np.cumsum(emit, axis=1) - emit  # start position per edge
            out = np.zeros_like(verts)
            new_count = emit.sum(axis=1)
            # scatter current vertices
            lane = np.arange(p)[:, None].repeat(cap, 1)
            tgt = np.where(inside, pos, cap - 1)
            safe = np.minimum(tgt, cap - 1)
            mask_v = inside
            out[lane[mask_v], safe[mask_v]] = verts[mask_v]
            # scatter crossing points (after the vertex if it was emitted)
            tgt2 = pos + inside.astype(np.int64)
            tgt2 = np.minimum(np.where(crossing, tgt2, cap - 1), cap - 1)
            out[lane[crossing], tgt2[crossing]] = cross_pt[crossing]
            verts = out
            count = new_count

    # polygon area via the cross-product sum (planar polygon in 3D)
    idx = np.arange(cap)[None, :]
    valid = idx < count[:, None]
    nxt = np.where(idx + 1 >= count[:, None], 0, idx + 1)
    v_next = np.take_along_axis(verts, nxt[..., None].repeat(3, -1), axis=1)
    v0 = verts[:, :1]
    cr = np.cross(verts - v0, v_next - v0)
    cr = np.where(valid[..., None], cr, 0.0)
    total = cr.sum(axis=1)
    area = 0.5 * np.linalg.norm(total, axis=-1)
    return np.where(count >= 3, area, 0.0)


def tri_area(verts: np.ndarray) -> np.ndarray:
    v = np.asarray(verts, np.float64).reshape(-1, 3, 3)
    return 0.5 * np.linalg.norm(
        np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1
    )


def epo(bvh, verts, chunk: int = 2048, use_native: str = "auto") -> float:
    """Expected Projected Overlap (reference semantics, ``bvhtest.cpp:221-284``).

    Dispatches to the parallel C++ walk (``mcpt/native``, seconds for a
    100k-tri scene — the counterpart of the reference's GPU EPO kernel,
    ``kernels/EPO.cl:133-197``) when available.  The numpy fallback is
    batched: all leaves walk the tree together; at each step the frontier's
    (triangle, node-AABB) clip areas are computed vectorized.  Ancestor nodes
    are excluded via subtree leaf-ranges (Karras internal nodes cover
    contiguous sorted-leaf ranges, so ancestry is an interval test)."""
    if use_native != "never":
        try:
            from mcpt import native

            if native.available():
                return native.epo_native(
                    np.asarray(verts, np.float32).reshape(-1, 9),
                    np.asarray(bvh.bbmin), np.asarray(bvh.bbmax),
                    np.asarray(bvh.left), np.asarray(bvh.right),
                    C_INN, C_TRI,
                )
        except Exception:
            if use_native == "always":
                raise
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    bbmin = np.asarray(bvh.bbmin, np.float64)
    bbmax = np.asarray(bvh.bbmax, np.float64)
    v = np.asarray(verts, np.float64).reshape(-1, 3, 3)
    n = (left.shape[0] + 1) // 2
    if n == 1:
        return 0.0
    leaf_base = n - 1

    # subtree leaf ranges (position space 0..N-1)
    lo = np.zeros(2 * n - 1, np.int64)
    hi = np.zeros(2 * n - 1, np.int64)
    lo[leaf_base:] = np.arange(n)
    hi[leaf_base:] = np.arange(n)
    # bottom-up: iterate until fixed (tree depth ≤ 64 for tie-broken Morton keys)
    internal = np.arange(leaf_base)
    for _ in range(64):
        new_lo = np.minimum(lo[left[internal]], lo[right[internal]])
        new_hi = np.maximum(hi[left[internal]], hi[right[internal]])
        if (new_lo == lo[:leaf_base]).all() and (new_hi == hi[:leaf_base]).all():
            break
        lo[:leaf_base] = new_lo
        hi[:leaf_base] = new_hi

    tri_of_leaf = left[leaf_base:]
    tmin = v.min(axis=1)
    tmax = v.max(axis=1)

    total_epo = 0.0
    for c0 in range(0, n, chunk):
        c1 = min(n, c0 + chunk)
        m = c1 - c0
        pos = np.arange(c0, c1)
        tri = tri_of_leaf[pos]
        geo = v[tri]
        gmin = tmin[tri]
        gmax = tmax[tri]

        stack = np.zeros((m, 64), np.int64)
        sp = np.ones(m, np.int64)  # root pushed
        while sp.max() > 0:
            live = sp > 0
            top = np.maximum(sp - 1, 0)
            node = stack[np.arange(m), top]
            sp = sp - live.astype(np.int64)

            is_anc = (lo[node] <= pos) & (pos <= hi[node]) & live
            # quick reject: triangle AABB vs node AABB
            overlap = (
                (gmin <= bbmax[node]).all(axis=1)
                & (gmax >= bbmin[node]).all(axis=1)
                & live
            )
            need_clip = overlap & ~is_anc
            if need_clip.any():
                ids = np.nonzero(need_clip)[0]
                areas = _clip_areas(geo[ids], bbmin[node[ids]], bbmax[node[ids]])
                w = np.where(node[ids] >= leaf_base, C_TRI, C_INN)
                total_epo += float((areas * w).sum())
                pos_clip = np.zeros(m, bool)
                pos_clip[ids[areas > 0]] = True
            else:
                pos_clip = np.zeros(m, bool)

            # descend: ancestors always; non-ancestors only with positive clip
            # (reference TopDown, bvhtest.cpp:222-244)
            descend = live & (node < leaf_base) & (is_anc | pos_clip)
            for ch in (left, right):
                idx = np.nonzero(descend)[0]
                stack[idx, np.minimum(sp[idx], 63)] = ch[node[idx]]
                sp[idx] += 1

    total_area = float(tri_area(verts).sum())
    return total_epo / max(total_area, 1e-30)


# ---------------------------------------------------------------------------
# LCV
# ---------------------------------------------------------------------------


def lcv(bvh, camera, width: int, height: int) -> float:
    """σ of leaf-AABB hit counts along primary rays (``bvhtest.cpp:324-444``).

    Rays use the reference's LCV generator: pixel centers, NO aspect scaling
    (``bvhtest.cpp:413-424`` — unlike the render ray generator)."""
    import jax
    import jax.numpy as jnp

    bbmin = jnp.asarray(bvh.bbmin)
    bbmax = jnp.asarray(bvh.bbmax)
    left = jnp.asarray(bvh.left)
    right = jnp.asarray(bvh.right)
    n = (left.shape[0] + 1) // 2
    leaf_base = n - 1

    i = (jnp.arange(width * height) % width).astype(jnp.float32)
    j = (jnp.arange(width * height) // width).astype(jnp.float32)
    t1 = (i + 0.5) / width - 0.5
    t2 = (j + 0.5) / height - 0.5
    fwd, rgt, up = camera.forward, camera.right, camera.up
    dist = 0.5 / camera.half_height  # = 0.5 / tan(fov/2)
    d = dist * fwd[None] + t1[:, None] * rgt[None] + t2[:, None] * up[None]
    o = jnp.broadcast_to(camera.position, d.shape)

    tiny = 1e-30
    inv = 1.0 / jnp.where(jnp.abs(d) < tiny, jnp.where(d < 0, -tiny, tiny), d)
    r = d.shape[0]
    arange = jnp.arange(r)

    def slab_hit(node, t_eps=0.001):
        t0 = (bbmin[node] - o) * inv
        t1_ = (bbmax[node] - o) * inv
        tn = jnp.max(jnp.minimum(t0, t1_), axis=-1)
        tf = jnp.min(jnp.maximum(t0, t1_), axis=-1)
        return tf >= jnp.maximum(tn, t_eps)

    def body(state):
        stack, sp, count = state
        live = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.where(live, stack[arange, top], 0)
        sp = jnp.where(live, sp - 1, sp)
        hit = slab_hit(node) & live
        is_leaf = node >= leaf_base
        count = count + (hit & is_leaf).astype(jnp.int32)
        push = hit & ~is_leaf
        slot = jnp.minimum(sp, 63)
        stack = stack.at[arange, slot].set(
            jnp.where(push, right[node], stack[arange, slot])
        )
        sp = sp + push.astype(jnp.int32)
        slot = jnp.minimum(sp, 63)
        stack = stack.at[arange, slot].set(
            jnp.where(push, left[node], stack[arange, slot])
        )
        sp = sp + push.astype(jnp.int32)
        return stack, sp, count

    def cond(state):
        return jnp.any(state[1] > 0)

    stack0 = jnp.zeros((r, 64), jnp.int32)
    init = (stack0, jnp.ones((r,), jnp.int32), jnp.zeros((r,), jnp.int32))
    if n == 1:
        counts = slab_hit(jnp.zeros((r,), jnp.int32)).astype(jnp.int32)
    else:
        _, _, counts = jax.lax.while_loop(cond, body, init)
    c = np.asarray(counts, np.float64)
    return float(math.sqrt(max((c * c).mean() - c.mean() ** 2, 0.0)))
