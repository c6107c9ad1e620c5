"""Treelet-based SAH restructuring (Karras & Aila, HPG 2013).

Re-implementation of the reference's treelet optimizer (CPU:
``BVH/treeletBVH.cpp:15-365``; GPU warp-cooperative kernel:
``kernels/treeletBVH.cl:230-531``) with the same algorithm semantics:

- bottom-up sweep over internal nodes (the reference uses atomic ready-flags,
  ``treeletBVH.cl:259-277``; here a height-ordered sweep — nodes of equal
  height own disjoint subtrees, so the order is equivalent and race-free);
- per treelet root, greedy max-surface-area expansion to ≤ 7 treelet leaves
  (``treeletBVH.cpp:42-91``, MAX_NODE=7);
- optimal re-partition by dynamic programming over all 2^n subsets in
  popcount order, ``cost[s] = Cinn·A(s) + min_{p⊂s} (cost[p] + cost[s\\p])``
  (``treeletBVH.cpp:123-208``) — evaluated with precomputed partition index
  tables (the vectorized analogue of the kernel's __constant popcount tables,
  ``treeletBVH.cl:193-228``);
- reconstruction reusing the freed internal nodes, parent/child rewiring and
  AABB/cost refit (``treeletBVH.cpp:210-295``).

The treelet's leaf *set* is invariant, so the root AABB never changes and no
update propagates above the treelet.  Unlike the reference (which notes
unresolved bugs for treelets with fewer than MAX_NODE leaves,
``treeletBVH.cpp:84``), any treelet size n ≥ 3 is handled.

This host-side implementation is deliberately numpy (it IS the "CPU treelet"
component, C15); the batched device-side variant is the natural follow-up for
C16 and shares the partition tables.
"""

from __future__ import annotations

import numpy as np

from mcpt.bvh.metrics import C_INN, C_TRI
from mcpt.types import BVH

MAX_LEAVES = 7  # treelet size, reference MAX_NODE (treeletBVH.cpp:15-16)


def _partition_tables(n: int):
    """For each subset s of n bits (popcount ≥ 2), the list of canonical
    partitions (p, s^p) with p < s^p.  Returns flat (idx_s, idx_p) arrays and
    a by-popcount ordering of subsets."""
    subsets_by_size = [[] for _ in range(n + 1)]
    for s in range(1, 1 << n):
        subsets_by_size[bin(s).count("1")].append(s)
    idx_s, idx_p = [], []
    for s in range(1, 1 << n):
        if bin(s).count("1") < 2:
            continue
        p = (s - 1) & s
        while p:
            c = s ^ p
            if p < c:
                idx_s.append(s)
                idx_p.append(p)
            p = (p - 1) & s
    return (
        np.asarray(idx_s, np.int64),
        np.asarray(idx_p, np.int64),
        subsets_by_size,
    )


_TABLES = {n: _partition_tables(n) for n in range(2, MAX_LEAVES + 1)}


def _node_heights(left, right, leaf_base, n_nodes):
    h = np.zeros(n_nodes, np.int64)
    changed = True
    # height ≤ 64 for tie-broken Morton radix trees
    for _ in range(n_nodes):
        new_h = np.zeros_like(h)
        new_h[:leaf_base] = 1 + np.maximum(h[left[:leaf_base]],
                                           h[right[:leaf_base]])
        if (new_h == h).all():
            break
        h = new_h
    return h


def optimize_treelets(bvh: BVH, max_leaves: int = MAX_LEAVES,
                      eps: float = 1e-7, use_native: str = "auto",
                      rounds: int = 1) -> BVH:
    """Restructure the BVH to (locally) minimal SAH; returns a new BVH with the
    same leaf set and layout contract.

    Dispatches to the C++ implementation (``mcpt/native``, ~200 ms for 200k
    triangles) when available; this numpy implementation is the always-available
    reference.  ``rounds > 1`` re-sweeps — a second pass typically gains a few
    extra % SAH (the reference sweeps once)."""
    import jax.numpy as jnp

    for _ in range(rounds - 1):
        bvh = optimize_treelets(bvh, max_leaves, eps, use_native, rounds=1)

    if use_native != "never":
        try:
            from mcpt import native

            if native.available():
                # owned, C-ORDER copies: jax CPU arrays expose zero-copy
                # READ-ONLY views, and np.array's default order='K' copy of a
                # 2-D jax array is NOT C-contiguous (which used to trip the
                # binding's layout assert and silently fall back to the slow
                # numpy path); the native optimizer mutates in place
                bbmin = np.array(bvh.bbmin, np.float32, order="C")
                bbmax = np.array(bvh.bbmax, np.float32, order="C")
                left = np.array(bvh.left, np.int32, order="C")
                right = np.array(bvh.right, np.int32, order="C")
                parent = np.array(bvh.parent, np.int32, order="C")
                native.treelet_optimize_native(bbmin, bbmax, left, right,
                                               parent)
                return BVH(
                    bbmin=jnp.asarray(bbmin), bbmax=jnp.asarray(bbmax),
                    left=jnp.asarray(left), right=jnp.asarray(right),
                    parent=jnp.asarray(parent),
                )
        except Exception:
            if use_native == "always":
                raise

    left = np.asarray(bvh.left).astype(np.int64).copy()
    right = np.asarray(bvh.right).astype(np.int64).copy()
    parent = np.asarray(bvh.parent).astype(np.int64).copy()
    bbmin = np.asarray(bvh.bbmin, np.float64).copy()
    bbmax = np.asarray(bvh.bbmax, np.float64).copy()
    n_nodes = left.shape[0]
    n = (n_nodes + 1) // 2
    if n < 4:
        return bvh
    leaf_base = n - 1

    def area(i):
        d = np.maximum(bbmax[i] - bbmin[i], 0.0)
        return 2.0 * (d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2]
                      + d[..., 2] * d[..., 0])

    # subtree SAH costs, bottom-up (reference recurseGet, treeletBVH.cpp:301-325)
    cost = np.zeros(n_nodes, np.float64)
    cost[leaf_base:] = C_TRI * area(np.arange(leaf_base, n_nodes))
    heights = _node_heights(left, right, leaf_base, n_nodes)
    order = np.argsort(heights[:leaf_base], kind="stable")
    for r in order:
        cost[r] = C_INN * area(r) + cost[left[r]] + cost[right[r]]

    # bottom-up sweep (ascending height ⇒ children already final)
    for r in order:
        # --- greedy treelet expansion (treeletBVH.cpp:42-91) ---
        leaves = [left[r], right[r]]
        internals = [r]
        while len(leaves) < max_leaves:
            best, best_a = -1, -1.0
            for li, node in enumerate(leaves):
                if node < leaf_base:
                    a = area(node)
                    if a > best_a:
                        best, best_a = li, a
            if best < 0:
                break
            x = leaves.pop(best)
            internals.append(x)
            leaves.extend((left[x], right[x]))
        tn = len(leaves)
        if tn < 3:
            continue

        idx_s, idx_p, _ = _TABLES[tn]
        full = (1 << tn) - 1

        # subset AABBs + areas
        lmin = bbmin[leaves]
        lmax = bbmax[leaves]
        smin = np.empty((full + 1, 3))
        smax = np.empty((full + 1, 3))
        smin[0] = np.inf
        smax[0] = -np.inf
        for s in range(1, full + 1):
            low = s & (-s)
            bit = low.bit_length() - 1
            rest = s ^ low
            smin[s] = np.minimum(smin[rest], lmin[bit]) if rest else lmin[bit]
            smax[s] = np.maximum(smax[rest], lmax[bit]) if rest else lmax[bit]
        d = np.maximum(smax - smin, 0.0)
        s_area = 2.0 * (d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2]
                        + d[:, 2] * d[:, 0])

        # DP over subsets in popcount order (vectorized per level via tables)
        csub = np.full(full + 1, np.inf)
        part = np.zeros(full + 1, np.int64)
        for i, node in enumerate(leaves):
            csub[1 << i] = cost[node]
        # all partition pairs share one sweep per popcount level; since
        # idx arrays are sorted by s and popcount(p) < popcount(s), iterating
        # levels guarantees operands are final
        pc = np.array([bin(s).count("1") for s in idx_s])
        for k in range(2, tn + 1):
            sel = pc == k
            if not sel.any():
                continue
            ss = idx_s[sel]
            pp = idx_p[sel]
            cand = csub[pp] + csub[ss ^ pp]
            # segment-min by subset id
            np.minimum.at(csub, ss, cand + C_INN * s_area[ss])
            # recover argmin partition
            best_for = {}
            for s_, p_, c_ in zip(ss, pp, cand + C_INN * s_area[ss]):
                if c_ <= csub[s_] + 1e-12 and (
                    s_ not in best_for or c_ < best_for[s_][0]
                ):
                    best_for[s_] = (c_, p_)
            for s_, (c_, p_) in best_for.items():
                part[s_] = p_

        if csub[full] >= cost[r] - eps:
            continue  # no improvement

        # --- reconstruction (treeletBVH.cpp:210-284) ---
        def build_rec(s):
            s = int(s)
            if s & (s - 1) == 0:
                return leaves[s.bit_length() - 1]
            nid = pool.pop()
            p = int(part[s])
            lch = build_rec(p)
            rch = build_rec(s ^ p)
            left[nid] = lch
            right[nid] = rch
            parent[lch] = nid
            parent[rch] = nid
            bbmin[nid] = smin[s]
            bbmax[nid] = smax[s]
            cost[nid] = C_INN * s_area[s] + cost[lch] + cost[rch]
            return nid

        # pool is a stack (pop from end): r on top → the rebuilt root IS r, so
        # r's parent link and the ancestors' AABBs stay valid
        pool = [x for x in internals if x != r] + [r]
        build_rec(full)

    return BVH(
        bbmin=jnp.asarray(bbmin, jnp.float32),
        bbmax=jnp.asarray(bbmax, jnp.float32),
        left=jnp.asarray(left, jnp.int32),
        right=jnp.asarray(right, jnp.int32),
        parent=jnp.asarray(parent, jnp.int32),
    )
