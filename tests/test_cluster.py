"""Clustered two-level BVH + block-coherent traversal kernel tests.

The oracle is the brute-force Wald intersector (exact same hit set).  The
Pallas kernel runs under the TPU interpreter on the CPU test host (same code
path Mosaic compiles on the chip, minus compilation).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mcpt.bvh import cluster as cluster_mod
from mcpt.render import camera as cm
from mcpt.render import integrator as integ
from mcpt.render import traverse
from mcpt.render.integrator import RenderOptions
from mcpt.scene import build_scene
from mcpt.scenes import boxfield


@pytest.fixture(scope="module")
def bf():
    loaded, camcfg = boxfield(400)
    scene, lights = build_scene(loaded)
    camcfg = dataclasses.replace(camcfg, resolution=(32, 24))
    return scene, lights, cm.make_camera(camcfg), loaded


def test_builder_invariants(bf):
    scene, _, _, loaded = bf
    cl = scene.clusters
    assert cl is not None
    n = scene.n_tris
    t = cl.leaf_size
    c = cl.n_clusters
    # the SAH-picked plan may cut finer than full-fill Morton chunks, but
    # never needs fewer clusters than perfect packing
    assert c >= (n + t - 1) // t
    assert cl.tri16.shape == (c * t, 16)
    # every triangle appears in exactly one valid row
    tri_map = np.asarray(cl.tri_map)
    never_hit = np.asarray(cl.tri16)[:, 0:9].sum(axis=1) == 0.0
    real = ~never_hit
    assert np.array_equal(np.sort(tri_map[real]), np.arange(n))

    # top tree: leaves cover every cluster once; parents contain children
    nodes = np.asarray(cl.nodes)
    left = nodes[:, 6].astype(np.int32)
    right = nodes[:, 7].astype(np.int32)
    leaf = nodes[c - 1 :]
    assert np.array_equal(np.sort(leaf[:, 6].astype(np.int32)), np.arange(c))
    for k in range(c - 1):
        for ch in (left[k], right[k]):
            assert (nodes[k, 0:3] <= nodes[ch, 0:3] + 1e-5).all()
            assert (nodes[k, 3:6] >= nodes[ch, 3:6] - 1e-5).all()

    # cluster AABBs contain their member triangles
    v = np.asarray(loaded.verts).reshape(-1, 3, 3)
    rows = v[tri_map].reshape(c, t, 3, 3)
    real_rows = real.reshape(c, t)
    for ci in range(0, c, 17):  # sampled
        leaf_node = nodes[c - 1 + np.nonzero(leaf[:, 6].astype(int) == ci)[0][0]]
        member = rows[ci][real_rows[ci]]
        if member.size == 0:
            continue
        assert (member.reshape(-1, 3).min(0) >= leaf_node[0:3] - 1e-4).all()
        assert (member.reshape(-1, 3).max(0) <= leaf_node[3:6] + 1e-4).all()


def test_closest_hit_matches_brute(bf):
    scene, _, cam, _ = bf
    from mcpt.pallas import traverse_kernel as tk

    pool = cm.generate_rays(cam, 32, 24, key=jax.random.key(0), jitter=True)
    hit_b = traverse.intersect_wald(
        scene.wald, scene.geom, pool.origin, pool.direction
    )
    hit_c = tk.intersect_clusters(
        scene.clusters, pool.origin, pool.direction, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_b.tri), np.asarray(hit_c.tri))
    tb = np.asarray(hit_b.t)
    tc = np.asarray(hit_c.t)
    m = np.isfinite(tb)
    np.testing.assert_allclose(tb[m], tc[m], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(hit_b.normal)[m], np.asarray(hit_c.normal)[m], atol=1e-6
    )


def test_cut_merged_closest_hit_matches_brute(bf):
    """The packed (fine-cut + greedy DFS-merge) clustering is a different
    triangle partition; traversal over it must still reproduce the brute
    hit set exactly."""
    scene, _, cam, loaded = bf
    from mcpt.pallas import traverse_kernel as tk

    plan = cluster_mod.plan_clusters(loaded.verts, bvh=scene.bvh, packed=True)
    fill = float(plan.valid.mean())
    assert fill > 0.66  # packs tighter than the plain cut on this scene
    cl = cluster_mod.build_clusters(
        loaded.verts, np.asarray(scene.geom.normals), loaded.mat_id,
        bvh=scene.bvh, plan=plan,
    )
    pool = cm.generate_rays(cam, 32, 24, key=jax.random.key(2), jitter=True)
    hit_b = traverse.intersect_wald(
        scene.wald, scene.geom, pool.origin, pool.direction
    )
    hit_c = tk.intersect_clusters(
        cl, pool.origin, pool.direction, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_b.tri), np.asarray(hit_c.tri))
    tb = np.asarray(hit_b.t)
    tc = np.asarray(hit_c.t)
    m = np.isfinite(tb)
    np.testing.assert_allclose(tb[m], tc[m], rtol=1e-6)


def test_active_mask_and_any_hit(bf):
    scene, _, cam, _ = bf
    from mcpt.pallas import traverse_kernel as tk

    pool = cm.generate_rays(cam, 32, 24, key=jax.random.key(1), jitter=True)
    active = jnp.arange(pool.count) % 3 != 0
    hit = tk.intersect_clusters(
        scene.clusters, pool.origin, pool.direction, active=active,
        interpret=True,
    )
    assert (np.asarray(hit.tri)[~np.asarray(active)] == -1).all()

    hit_b = traverse.intersect_wald(
        scene.wald, scene.geom, pool.origin, pool.direction
    )
    tmax = jnp.where(jnp.isfinite(hit_b.t), hit_b.t, 100.0)
    occ_far = tk.occluded_clusters(
        scene.clusters, pool.origin, pool.direction, tmax * 1.2, interpret=True
    )
    occ_near = tk.occluded_clusters(
        scene.clusters, pool.origin, pool.direction, tmax * 0.8, interpret=True
    )
    ref = np.asarray(hit_b.t) < np.asarray(tmax * 1.2) * (1 - 1e-6)
    np.testing.assert_array_equal(np.asarray(occ_far), ref)
    assert int(np.asarray(occ_near).sum()) == 0


def test_render_cluster_matches_bvh(bf):
    """Same image through the Pallas cluster path and the XLA stack walk."""
    scene, lights, cam, _ = bf
    opts_c = RenderOptions(max_depth=2, method="cluster", jitter=False)
    opts_b = RenderOptions(max_depth=2, method="bvh", jitter=False)
    key = jax.random.key(7)
    rad_c = integ.render_batch(scene, lights, cam, 32, 24, key, opts_c, spp=1)
    rad_b = integ.render_batch(scene, lights, cam, 32, 24, key, opts_b, spp=1)
    np.testing.assert_allclose(
        np.asarray(rad_c), np.asarray(rad_b), atol=1e-5
    )


@pytest.mark.slow
def test_leaf_size_64_matches(bf):
    scene, _, cam, loaded = bf
    from mcpt.pallas import traverse_kernel as tk

    cl64 = cluster_mod.build_clusters(
        loaded.verts, np.asarray(scene.geom.normals), loaded.mat_id,
        leaf_size=64,
    )
    pool = cm.generate_rays(cam, 16, 12, key=jax.random.key(2), jitter=True)
    hit_b = traverse.intersect_wald(
        scene.wald, scene.geom, pool.origin, pool.direction
    )
    hit_c = tk.intersect_clusters(
        cl64, pool.origin, pool.direction, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_b.tri), np.asarray(hit_c.tri))


def test_tile_order_is_permutation():
    perm, inv = cm.tile_order(48, 20)
    assert np.array_equal(np.sort(perm), np.arange(48 * 20))
    assert np.array_equal(perm[inv], np.arange(48 * 20))
    # first block of a 1024-block tiling on a wide image stays compact
    perm2, _ = cm.tile_order(256, 256)
    first = perm2[:1024]
    xs, ys = first % 256, first // 256
    assert xs.max() - xs.min() <= 32 and ys.max() - ys.min() <= 32


def test_sah_subtree_cut_matches(bf):
    """The LBVH subtree-cut clustering (tight boxes, variable fill) must
    produce identical hits to the Morton-chunk default."""
    scene, _, cam, loaded = bf
    from mcpt.pallas import traverse_kernel as tk

    cl_cut = cluster_mod.build_clusters(
        loaded.verts, np.asarray(scene.geom.normals), loaded.mat_id,
        bvh=scene.bvh,
    )
    # every triangle appears exactly once in a valid row
    never = np.asarray(cl_cut.tri16)[:, 0:9].sum(axis=1) == 0.0
    tm = np.asarray(cl_cut.tri_map)
    assert np.array_equal(np.sort(tm[~never]), np.arange(scene.n_tris))

    pool = cm.generate_rays(cam, 16, 12, key=jax.random.key(3), jitter=True)
    hit_b = traverse.intersect_wald(
        scene.wald, scene.geom, pool.origin, pool.direction
    )
    hit_c = tk.intersect_clusters(
        cl_cut, pool.origin, pool.direction, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(hit_b.tri), np.asarray(hit_c.tri))


def test_pathological_deep_top_tree_fails_loudly():
    """A top tree deep enough to overflow the kernels' traversal stack must
    be REJECTED at build time (``collapse_wide``'s 7·depth + 8 bound), not
    silently clamp-corrupt pushes mid-render.  The reference has the same
    hazard and no canary (silent ``stack[64]``, ``objdef.h:240-275``)."""
    # degenerate binary chain over C clusters: internal i = (leaf i, internal
    # i+1); the greedy 8-wide collapse of a chain descends ~7 binary levels
    # per wide node, so wide depth ≈ C/7 — far past MAX_WIDE_DEPTH for C=200
    c = 200
    nodes = np.zeros((2 * c - 1, 8), np.float32)
    nodes[:, 0:3] = 0.0
    nodes[:, 3:6] = 1.0  # equal boxes: greedy growth order is irrelevant
    for i in range(c - 1):
        leaf = (c - 1) + i
        nodes[i, 6] = float(leaf)
        nodes[i, 7] = float(i + 1) if i < c - 2 else float(2 * c - 2)
    for j in range(c):
        nodes[(c - 1) + j, 6] = nodes[(c - 1) + j, 7] = float(j)
    with pytest.raises(ValueError, match="traversal-stack bound"):
        cluster_mod.collapse_wide(nodes, c)


def test_balanced_top_tree_passes_depth_check(bf):
    """Real scenes sit far under the stack bound (depth ~log8 C)."""
    scene, _, _, _ = bf
    w = np.asarray(scene.clusters.wnodes)
    assert w.shape[0] >= 1  # built without raising
