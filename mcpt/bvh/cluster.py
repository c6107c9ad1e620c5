"""Clustered two-level BVH for the device-native traversal kernel.

The reference's hot traversal is a per-work-item stack walk over a binary BVH
down to one-triangle leaves (``objdef.h:240-275``) — per-lane divergent memory
access that the TPU's vector units (and Mosaic's no-per-lane-gather rule)
cannot express.  The TPU-native shape is a *two-level* structure instead:

- triangles are sorted by Morton code and chunked into fixed-size **clusters**
  of ``leaf_size`` consecutive triangles (spatially coherent by construction);
- a top-level Karras LBVH is built **over the cluster AABBs** — it has
  ``N / leaf_size`` leaves, so it is ~``leaf_size``× shallower and smaller
  than a per-triangle tree;
- the traversal kernel (``mcpt.pallas.traverse_kernel``) walks the top tree
  once per *ray block* with a shared scalar stack, and tests whole clusters of
  triangles against all lanes with dense vector ops — every memory access is a
  scalar-indexed row read, which Mosaic supports.

The cluster triangle table reuses the megakernel's packed row layout
(Wald transform + normal + material id, ``mcpt/pallas/megakernel.py`` row
contract) so the leaf test is the same proven code shape.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mcpt.bvh import lbvh as lbvh_mod
from mcpt.types import BVH

DEFAULT_LEAF_SIZE = 32

# Shared traversal-stack capacity contract between this builder and the
# Pallas walk kernels (``mcpt.pallas.traverse_kernel`` /
# ``cluster_megakernel`` import it from here).  The walk pops one entry and
# pushes ≤8 children per iteration, with the near child popped first, so
# while a depth-``d`` wide node's push group lands the stack holds at most
# 7 not-yet-taken siblings per ancestor level plus this group's 8:
# ``sp ≤ 7·d + 8``.  ``collapse_wide`` REJECTS any tree deep enough to break
# that bound (the loud build-time canary) — the kernels' push sites clamp
# their store index as pure defence-in-depth, never as the contract.  The
# reference's counterpart, a silent fixed ``stack[64]`` per work item
# (``objdef.h:240-275``), has no such guarantee.
STACK_CAP = 128
MAX_WIDE_DEPTH = (STACK_CAP - 8) // 7  # deepest legal internal wide node


class ClusterBVH(NamedTuple):
    """Device tables for the block-coherent traversal kernel.

    ``nodes`` packs the top-level binary tree (over C clusters, 2C-1 nodes,
    same layout contract as ``types.BVH``: internals [0, C-2], leaves
    [C-1, 2C-2], leaf left == right == cluster id) into one f32 row per node:
    [bbmin xyz, bbmax xyz, left, right] (child ids as f32 — exact to 2^24).

    ``wnodes`` is the 8-wide collapse the traversal kernel actually walks —
    wide nodes amortize the vector→scalar descent decision (the kernel's
    latency bottleneck) over 8 children per pop.  Row layout (64 f32):

    - ``[6k : 6k+6]``  child k AABB (empty slots: +BIG/-BIG, never hit);
    - ``[48 + k]``     child k stack encoding: wide-node index if internal,
      ``Nw + cluster_id`` if a leaf cluster, 0 if empty (never pushed);
    - ``[56 + o]``     traversal order for mean-direction octant ``o``: the 8
      child slots packed far-to-near as 3-bit digits (slot j at bits 3j) —
      the build-time analogue of the reference's per-ray near-child-first
      descent (``objdef.h:240-275``), amortized to one permutation per pop.
    """

    nodes: jnp.ndarray  # (2C-1, 8) f32
    wnodes: jnp.ndarray  # (Nw, 64) f32
    tri16: jnp.ndarray  # (C·T, 16) f32 — megakernel tri-row layout, cluster order
    tri_map: jnp.ndarray  # (C·T,) int32 — kernel row → original triangle id (pad: 0)

    # cluster count / leaf size are derived from array shapes so they stay
    # STATIC when a Scene carrying this pytree crosses a jit boundary
    @property
    def n_clusters(self) -> int:
        return (self.nodes.shape[0] + 1) // 2

    @property
    def leaf_size(self) -> int:
        return self.tri16.shape[0] // self.n_clusters

    @property
    def n_rows(self) -> int:
        return self.tri16.shape[0]


class ClusterPlan(NamedTuple):
    """Cheap cluster-topology plan: enough to score a candidate clustering by
    top-tree SAH (``plan_sah``) WITHOUT the expensive Wald-table build, so
    ``build_scene`` can plan both candidates and materialize only the winner."""

    nodes: np.ndarray  # (2C-1, 8) f32 binary top tree
    order_p: np.ndarray  # (C·T,) int32 cluster-ordered triangle ids (padded)
    valid: np.ndarray  # (C·T,) bool — False on padding rows


def plan_clusters(
    verts: np.ndarray,
    leaf_size: int = DEFAULT_LEAF_SIZE,
    bvh=None,
    optimize_top: bool = True,
    packed: bool = False,
    dp: bool = False,
) -> ClusterPlan:
    """Topology-only half of ``build_clusters`` (see its docstring).

    With ``bvh``: ``packed=False`` cuts maximal ≤leaf_size subtrees (tight
    boxes, partial fill); ``packed=True`` chunks the tree's DFS leaf order
    into always-full clusters (``_cut_packed``); ``dp=True`` picks the
    SAH-optimal cut by dynamic programming (``_cut_tree_dp``)."""
    v = np.asarray(verts, np.float32).reshape(-1, 3, 3)
    n = v.shape[0]
    t = int(leaf_size)
    tri_min = v.min(axis=1)
    tri_max = v.max(axis=1)
    if bvh is not None and n > 1:
        if packed:
            nodes, order_p, valid = _cut_merged(bvh, tri_min, tri_max, n, t,
                                                optimize_top)
        elif dp:
            ratio = DEFAULT_DP_RATIO if dp is True else float(dp)
            nodes, order_p, valid = _cut_tree_dp(bvh, n, t, ratio)
        else:
            nodes, order_p, valid = _cut_tree(bvh, n, t)
    else:
        nodes, order_p, valid = _morton_chunks(tri_min, tri_max, n, t,
                                               optimize_top)
    return ClusterPlan(nodes=nodes, order_p=order_p, valid=valid)


def plan_sah(plan: ClusterPlan) -> float:
    """Top-tree SAH of a plan (same definition as ``cluster_sah``)."""
    return _nodes_sah(plan.nodes)


def build_clusters(
    verts: np.ndarray,
    normals: np.ndarray,
    mat_id: np.ndarray,
    leaf_size: int = DEFAULT_LEAF_SIZE,
    bvh=None,
    optimize_top: bool = True,
    plan: ClusterPlan | None = None,
) -> ClusterBVH:
    """Triangle soup → ClusterBVH (host build, like ``scene.build_wald``).

    With ``bvh`` (the scene's per-triangle binary LBVH), clusters are the
    maximal subtrees holding ≤ ``leaf_size`` triangles — tight SAH-shaped
    boxes, and the top tree is the contraction of the same LBVH above the cut
    (so a treelet-optimized tree yields a better traversal hierarchy too).
    Without it, clusters are fixed Morton chunks (used by unit tests).
    ``plan`` skips the topology stage (see ``plan_clusters``).

    Padding rows (clusters under ``leaf_size`` members) carry the never-hit
    Wald transform (A = 0, b = (0,0,1) ⇒ d'_w = 0 ⇒ t = -inf) so the kernel
    needs no bounds check inside the cluster loop.
    """
    from mcpt.scene import build_wald

    v = np.asarray(verts, np.float32).reshape(-1, 3, 3)
    t = int(leaf_size)
    if plan is None:
        plan = plan_clusters(verts, leaf_size, bvh, optimize_top)
    nodes, order_p, valid = plan.nodes, plan.order_p, plan.valid
    c = order_p.shape[0] // t

    # cluster-ordered triangle rows (megakernel layout; see module docstring)
    wald = build_wald(v[order_p])
    a = np.transpose(np.asarray(wald.w), (1, 2, 0))  # (C·T, 3, 3) = A
    b = np.asarray(wald.b)
    tri16 = np.zeros((c * t, 16), np.float32)
    tri16[:, 0:9] = a.reshape(c * t, 9)
    tri16[:, 9:12] = b
    tri16[:, 12:15] = np.asarray(normals, np.float32).reshape(-1, 3)[order_p]
    tri16[:, 15] = np.clip(np.asarray(mat_id).reshape(-1), 0, None)[
        order_p
    ].astype(np.float32)
    if not valid.all():
        tri16[~valid, 0:9] = 0.0
        tri16[~valid, 9:12] = np.array([0.0, 0.0, 1.0], np.float32)

    return ClusterBVH(
        nodes=jnp.asarray(nodes),
        wnodes=jnp.asarray(collapse_wide(nodes, c)),
        tri16=jnp.asarray(tri16),
        tri_map=jnp.asarray(np.where(valid, order_p, 0), jnp.int32),
    )


def _morton_chunks(tri_min, tri_max, n, t, optimize_top: bool = True):
    """Fixed Morton chunks of ``t`` triangles + Karras top tree over them.

    ``optimize_top`` runs the treelet SAH restructurer on the top tree — the
    render-path analogue of the reference always tracing its treelet-optimized
    BVH (``scenebuild.cpp:80-95`` falls through to the GPU treelet build).
    The top tree is tiny (N/t leaves), so the native optimizer costs ~ms."""
    import jax

    centroid = 0.5 * (tri_min + tri_max)
    cmin = centroid.min(axis=0)
    extent = np.maximum(centroid.max(axis=0) - cmin, 1e-20)
    with jax.default_device(jax.devices("cpu")[0]):
        codes = np.asarray(
            lbvh_mod.morton30(jnp.asarray((centroid - cmin) / extent))
        )
    order = np.argsort(codes, kind="stable").astype(np.int32)
    return _top_over_chunks(order, tri_min, tri_max, n, t, optimize_top)


def _cut_merged(bvh, tri_min, tri_max, n, t, optimize_top: bool = True):
    """Fine subtree cut + greedy packing of DFS-adjacent granules.

    The plain subtree cut (``_cut_tree``) averages ~2/3 fill (a 40-triangle
    subtree splits 25+15, never 32+8), and the traversal kernel tests every
    row of a popped cluster — padding rows cost exactly what real rows cost.
    Siblings can never be re-merged (their parent would have been the cut),
    so: cut at granule ``t/2`` (tighter boxes than a ``t``-cut), then greedily
    pack *consecutive* granules of the cut's DFS order — spatial cousins —
    into ≤``t`` clusters.  Fill rises toward ~90% with near-subtree-tight
    union boxes; the top tree is a treelet-optimized Karras build over the
    merged boxes (the contraction no longer applies — merged clusters are
    not subtrees).  Measured on the 96k-tri diningroom interior (66.5% cut
    fill)."""
    left = np.asarray(bvh.left)
    leaf_base = n - 1
    counts = _subtree_counts(bvh, n)
    g = max(1, t // 2)
    # fine cut: preorder DFS, granule = maximal subtree with ≤ t/2 tris
    granules = []  # triangle-id lists, DFS order
    st = [0]
    while st:
        v = st.pop()
        if counts[v] <= g:
            tris = []
            s2 = [v]
            while s2:
                u = s2.pop()
                if u >= leaf_base or n == 1:
                    tris.append(left[u])
                else:
                    s2.append(np.asarray(bvh.right)[u])
                    s2.append(left[u])
            granules.append(tris)
        else:
            st.append(np.asarray(bvh.right)[v])
            st.append(left[v])
    # greedy consecutive packing to ≤ t
    groups = []
    cur = []
    for tris in granules:
        if cur and len(cur) + len(tris) > t:
            groups.append(cur)
            cur = []
        cur = cur + tris
    if cur:
        groups.append(cur)
    return _top_over_groups(groups, tri_min, tri_max, t, optimize_top)


def _subtree_counts(bvh, n):
    """Per-node subtree triangle counts of a (possibly restructured) LBVH."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    leaf_base = n - 1
    counts = np.zeros(2 * n - 1, np.int64)
    stack = [(0, False)]
    while stack:
        v, expanded = stack.pop()
        if v >= leaf_base:
            counts[v] = 1
            continue
        if expanded:
            counts[v] = counts[left[v]] + counts[right[v]]
        else:
            stack.append((v, True))
            stack.append((left[v], False))
            stack.append((right[v], False))
    return counts


def _top_over_groups(groups, tri_min, tri_max, t, optimize_top: bool):
    """Variable-fill cluster groups → (nodes, order_p, valid) with a
    treelet-optimized Karras top tree over the group AABBs."""
    import jax

    c = len(groups)
    order_p = np.zeros(c * t, np.int32)
    valid = np.zeros(c * t, bool)
    cl_min = np.full((c, 3), np.inf, np.float32)
    cl_max = np.full((c, 3), -np.inf, np.float32)
    for ci, tris in enumerate(groups):
        idx = np.asarray(tris, np.int32)
        order_p[ci * t : ci * t + len(tris)] = idx
        valid[ci * t : ci * t + len(tris)] = True
        cl_min[ci] = tri_min[idx].min(axis=0)
        cl_max[ci] = tri_max[idx].max(axis=0)
    with jax.default_device(jax.devices("cpu")[0]):
        top = lbvh_mod.build_lbvh_boxes(jnp.asarray(cl_min), jnp.asarray(cl_max))
    if optimize_top and c > 3:
        from mcpt.bvh import treelet as treelet_mod

        top = treelet_mod.optimize_treelets(top)
    top = jax.tree.map(np.asarray, top)
    m = top.n_nodes
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = top.bbmin
    nodes[:, 3:6] = top.bbmax
    nodes[:, 6] = top.left.astype(np.float32)
    nodes[:, 7] = top.right.astype(np.float32)
    return nodes, order_p, valid


def _top_over_chunks(order, tri_min, tri_max, n, t, optimize_top: bool):
    """Chunk a triangle order into ``t``-sized clusters + Karras top tree
    over the chunk AABBs (shared tail of the chunking planners)."""
    import jax

    c = (n + t - 1) // t
    pad = c * t - n
    order_p = np.concatenate([order, np.zeros(pad, np.int32)])
    valid = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])

    # cluster AABBs over real members only
    cl_min = np.where(valid[:, None], tri_min[order_p], np.inf).reshape(c, t, 3)
    cl_max = np.where(valid[:, None], tri_max[order_p], -np.inf).reshape(c, t, 3)
    cl_min = cl_min.min(axis=1)
    cl_max = cl_max.max(axis=1)

    # build on the host CPU backend (latency-bound on a tunnelled chip), then
    # pull to numpy — the final device tables are created UNCOMMITTED so they
    # live on the render device instead of being re-transferred per call
    with jax.default_device(jax.devices("cpu")[0]):
        top = lbvh_mod.build_lbvh_boxes(jnp.asarray(cl_min), jnp.asarray(cl_max))
    if optimize_top and c > 3:
        from mcpt.bvh import treelet as treelet_mod

        top = treelet_mod.optimize_treelets(top)
    top = jax.tree.map(np.asarray, top)
    m = top.n_nodes
    nodes = np.zeros((m, 8), np.float32)
    nodes[:, 0:3] = top.bbmin
    nodes[:, 3:6] = top.bbmax
    nodes[:, 6] = top.left.astype(np.float32)
    nodes[:, 7] = top.right.astype(np.float32)
    return nodes, order_p, valid


def _node_areas(bvh) -> np.ndarray:
    bbmin = np.asarray(bvh.bbmin)
    bbmax = np.asarray(bvh.bbmax)
    d = np.maximum(bbmax - bbmin, 0.0)
    return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]


# C_visit/C_node ratio for the DP cut: how much a cluster *visit* (a full
# 32-row Wald test over the block) costs relative to one binary top-tree
# internal node's share of the walk.  With the plain SAH constants
# (1 : 1.2 < 1) the DP provably reduces to the maximal cut (splitting a node
# charges C_INN·A(v) > C_TRI·A(v) before the children's leaf costs are even
# added), so the kernel-calibrated ratio must be > 1 for the DP to differ.
DEFAULT_DP_RATIO = 3.0


def _cut_tree_dp(bvh, n, t, ratio: float = DEFAULT_DP_RATIO):
    """Cost-*optimal* cut of the per-triangle BVH into ≤t-triangle clusters.

    ``_cut_tree`` cuts at *maximal* ≤t subtrees — the coarsest legal cut.
    But the kernel tests every popped cluster's 32 rows at constant cost, so
    total leaf cost ∝ Σ A(cluster) (the measured cost model,
    docs/PERF_NOTES.md round-3 §8): when a subtree holds two well-separated
    clumps, cutting *finer* shrinks Σ A(leaf) by more than the added
    top-tree internals cost.  Bottom-up DP over the plan-SAH objective with
    a kernel-calibrated leaf weight ``C_LEAF = ratio · C_INN``:

        cost[v] = min( C_LEAF·A(v)                       [if count(v) ≤ t]
                     , C_INN·A(v) + cost[l] + cost[r] )  [if internal]

    then the cut is the argmin frontier.  O(N), host numpy.
    """
    from mcpt.bvh.metrics import C_INN

    c_leaf = float(ratio) * C_INN
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    leaf_base = n - 1
    counts = _subtree_counts(bvh, n)
    area = _node_areas(bvh)

    cost = np.zeros(2 * n - 1, np.float64)
    cut_here = np.zeros(2 * n - 1, bool)
    cut_here[leaf_base:] = True
    cost[leaf_base:] = c_leaf * area[leaf_base:]
    # bottom-up over internals (postorder via explicit stack)
    stack = [(0, False)]
    while stack:
        v, expanded = stack.pop()
        if v >= leaf_base:
            continue
        if not expanded:
            stack.append((v, True))
            stack.append((left[v], False))
            stack.append((right[v], False))
            continue
        c_split = C_INN * area[v] + cost[left[v]] + cost[right[v]]
        c_cut = c_leaf * area[v] if counts[v] <= t else np.inf
        if c_cut <= c_split:
            cost[v] = c_cut
            cut_here[v] = True
        else:
            cost[v] = c_split
    return _materialize_cut(bvh, n, t, lambda v: cut_here[v])


def _cut_tree(bvh, n, t):
    """Cut the per-triangle binary LBVH at maximal ≤t-triangle subtrees.

    Clusters inherit the tree's tight subtree boxes (vs. raw Morton chunks),
    and the top tree is the contraction of the same LBVH above the cut,
    re-packed into the standard [internals, leaves] layout so
    ``collapse_wide`` consumes it unchanged.
    """
    counts = _subtree_counts(bvh, n)
    return _materialize_cut(bvh, n, t, lambda v: counts[v] <= t)


def _materialize_cut(bvh, n, t, cut_pred):
    """Collect the cut frontier (preorder, ``cut_pred(v)`` decides) and emit
    (nodes, order_p, valid): the contracted top tree + cluster triangle
    lists.  Shared tail of ``_cut_tree`` / ``_cut_tree_dp``."""
    left = np.asarray(bvh.left)
    right = np.asarray(bvh.right)
    bbmin = np.asarray(bvh.bbmin)
    bbmax = np.asarray(bvh.bbmax)
    leaf_base = n - 1

    cut = []  # binary node id per cluster
    inner = []  # contracted internal nodes, preorder (root first)
    stack = [0]
    while stack:
        v = stack.pop()
        if cut_pred(v):
            cut.append(v)
        else:
            inner.append(v)
            stack.append(right[v])
            stack.append(left[v])
    c = len(cut)
    assert len(inner) == c - 1, (len(inner), c)

    # collect each cluster's triangles (subtree leaves)
    order_p = np.zeros(c * t, np.int32)
    valid = np.zeros(c * t, bool)
    for ci, root in enumerate(cut):
        tris = []
        st = [root]
        while st:
            v = st.pop()
            if v >= leaf_base or n == 1:
                tris.append(left[v])
            else:
                st.append(right[v])
                st.append(left[v])
        order_p[ci * t : ci * t + len(tris)] = tris
        valid[ci * t : ci * t + len(tris)] = True

    # contracted binary tree in the standard layout
    new_id = {}
    for i, v in enumerate(inner):
        new_id[v] = i
    for ci, v in enumerate(cut):
        new_id[v] = (c - 1) + ci
    nodes = np.zeros((2 * c - 1, 8), np.float32)
    for v, i in new_id.items():
        nodes[i, 0:3] = bbmin[v]
        nodes[i, 3:6] = bbmax[v]
        if i < c - 1:
            nodes[i, 6] = float(new_id[left[v]])
            nodes[i, 7] = float(new_id[right[v]])
        else:
            nodes[i, 6] = nodes[i, 7] = float(i - (c - 1))
    return nodes, order_p, valid


_WIDE = 8


def collapse_wide(nodes: np.ndarray, n_clusters: int) -> np.ndarray:
    """Collapse the binary top tree into 8-wide nodes (host, numpy).

    Greedy: each wide node starts as {binary root of its subtree} and
    repeatedly replaces the largest-surface-area internal member with its two
    children until 8 members (or all leaves) — the standard BVH8 collapse,
    picked because child-test cost in the kernel is flat (all 8 slots are
    slab-tested regardless).  Also emits, per wide node, the 8 octant
    traversal orders (see ``ClusterBVH.wnodes``).
    """
    c = n_clusters
    leaf_base = c - 1
    bbmin = nodes[:, 0:3]
    bbmax = nodes[:, 3:6]
    left = nodes[:, 6].astype(np.int32)
    right = nodes[:, 7].astype(np.int32)

    def area(i):
        d = np.maximum(bbmax[i] - bbmin[i], 0.0)
        return d[0] * d[1] + d[0] * d[2] + d[1] * d[2]

    def is_bin_leaf(i):
        return c == 1 or i >= leaf_base

    # BFS over wide nodes; members of each wide node are binary node ids
    rows = []
    queue = [0]  # binary roots of pending wide nodes
    wide_index = {0: 0}  # binary root id → wide node index
    wide_depth = {0: 0}  # wide node index → depth (root = 0)
    max_depth = 0
    while queue:
        root = queue.pop(0)
        members = [root]
        while len(members) < _WIDE:
            inner = [m for m in members if not is_bin_leaf(m)]
            if not inner:
                break
            grow = max(inner, key=area)
            members.remove(grow)
            members.extend([left[grow], right[grow]])
        row = np.zeros(64, np.float32)
        centers = np.zeros((_WIDE, 3), np.float32)
        for k in range(_WIDE):
            if k < len(members):
                m = members[k]
                row[6 * k : 6 * k + 3] = bbmin[m]
                row[6 * k + 3 : 6 * k + 6] = bbmax[m]
                centers[k] = 0.5 * (bbmin[m] + bbmax[m])
                if is_bin_leaf(m):
                    cluster = left[m] if c > 1 else 0
                    row[48 + k] = float(_WIDE_LEAF_BIAS + cluster)
                else:
                    if m not in wide_index:
                        wide_index[m] = len(wide_index)
                        wide_depth[wide_index[m]] = (
                            wide_depth[wide_index[root]] + 1
                        )
                        max_depth = max(max_depth,
                                        wide_depth[wide_index[m]])
                        queue.append(m)
                    row[48 + k] = float(wide_index[m])
            else:
                # NaN box: every slab comparison is false, so an empty slot
                # can never be hit (an inverted ±BIG box would NOT work — the
                # slab test's per-axis min/max erases box orientation and
                # turns it into an always-hit box)
                row[6 * k : 6 * k + 6] = np.nan
                centers[k] = _BIG_BOX  # sorts to the far end, never pushed
        # octant orders: children far-to-near along each signed direction
        for o in range(8):
            d = np.array(
                [1.0 if o & 1 else -1.0,
                 1.0 if o & 2 else -1.0,
                 1.0 if o & 4 else -1.0], np.float32
            )
            keys = centers @ d
            order = np.argsort(-keys, kind="stable")  # far first
            code = 0
            for j, k in enumerate(order):
                code |= int(k) << (3 * j)
            row[56 + o] = float(code)  # < 2^24: exact in f32
        rows.append((wide_index[root], row))
    if max_depth > MAX_WIDE_DEPTH:
        # loud build-time failure instead of a silently corrupted traversal:
        # the kernels' SMEM stack can hold 7·depth + 8 entries worst-case
        raise ValueError(
            f"8-wide top tree depth {max_depth} exceeds the traversal-stack "
            f"bound ({MAX_WIDE_DEPTH}: worst-case stack 7·depth + 8 > "
            f"STACK_CAP={STACK_CAP}).  The top tree is pathologically "
            f"unbalanced ({n_clusters} clusters need depth "
            f"~log8 = {max(1, int(np.ceil(np.log2(max(n_clusters, 2)) / 3)))}"
            f"); rebuild with a different clustering or raise STACK_CAP."
        )
    out = np.zeros((len(rows), 64), np.float32)
    for idx, row in rows:
        out[idx] = row
    # leaf encodings need Nw, which is only known now: rebase the bias
    nw = out.shape[0]
    refs = out[:, 48:56]
    is_cluster = refs >= _WIDE_LEAF_BIAS
    out[:, 48:56] = np.where(is_cluster, refs - _WIDE_LEAF_BIAS + nw, refs)
    return out


_BIG_BOX = np.float32(3.0e37)
_WIDE_LEAF_BIAS = 1 << 23  # temporary leaf tag during collapse (≥ any Nw)


def cluster_sah(c: ClusterBVH) -> float:
    """SAH cost of the top tree (reference definition, host numpy — no device
    round trip).  Comparable across builds of the SAME scene at the same
    leaf_size: lower SAH has picked the measured-faster traversal hierarchy
    on both the uniform (boxfield) and irregular (diningroom) workloads."""
    return _nodes_sah(np.asarray(c.nodes))


def _nodes_sah(n: np.ndarray) -> float:
    from mcpt.bvh.metrics import C_INN, C_TRI

    d = np.maximum(n[:, 3:6] - n[:, 0:3], 0.0)
    area = d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]
    n_internal = n.shape[0] // 2
    total = C_INN * area[:n_internal].sum() + C_TRI * area[n_internal:].sum()
    return float(total / max(area[0], 1e-30))


def clusters_as_bvh(cl: ClusterBVH) -> BVH:
    """Top-level tree as a ``types.BVH`` over cluster boxes (for the quality
    metrics harness and structural tests)."""
    nodes = np.asarray(cl.nodes)
    return BVH(
        bbmin=jnp.asarray(nodes[:, 0:3]),
        bbmax=jnp.asarray(nodes[:, 3:6]),
        left=jnp.asarray(nodes[:, 6].astype(np.int32)),
        right=jnp.asarray(nodes[:, 7].astype(np.int32)),
        parent=jnp.full((nodes.shape[0],), -1, jnp.int32),
    )
