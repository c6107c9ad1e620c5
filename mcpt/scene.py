"""Scene assembly: geometry + materials + BVH + light table.

Mirrors the reference's ``SceneCL`` construction (``scenebuild.cpp:50-101``): bake
per-triangle normals and material ids, build the BVH selected by ``bvhtype``
(``scenebuild.cpp:66-79``), upload everything device-side.  We do *not* replicate
the reference's fall-through quirk where a CPU-built BVH is silently overwritten by
a fresh GPU-treelet build (``scenebuild.cpp:80-95``) — ``bvhtype`` here selects
exactly one builder.

The light table is new: the reference has no light sampling (no NEE); we
precompute the emissive-triangle list + area CDF host-side for ``mcpt.render``'s
next-event estimation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from mcpt import types
from mcpt.io.objloader import LoadedObject
from mcpt.types import Geometry, Materials, Scene, WaldTris


class Lights(NamedTuple):
    """Emissive-triangle table for next-event estimation (area-uniform sampling)."""

    tri: jnp.ndarray  # (L,) int32 triangle ids
    cdf: jnp.ndarray  # (L,) f32 cumulative area distribution (last == 1)
    emission: jnp.ndarray  # (L, 3) f32
    total_area: jnp.ndarray  # () f32

    @property
    def count(self) -> int:
        return self.tri.shape[0]


def build_lights(verts: np.ndarray, mat_id: np.ndarray, mtype: np.ndarray,
                 ka: np.ndarray) -> Lights:
    v = np.asarray(verts, np.float32).reshape(-1, 3, 3)
    mat_id = np.asarray(mat_id).reshape(-1)
    valid = mat_id >= 0
    is_light = np.zeros(v.shape[0], bool)
    is_light[valid] = np.asarray(mtype)[mat_id[valid]] == types.LIGHT
    ids = np.nonzero(is_light)[0].astype(np.int32)
    if len(ids) == 0:
        return Lights(
            tri=jnp.zeros((0,), jnp.int32),
            cdf=jnp.zeros((0,), jnp.float32),
            emission=jnp.zeros((0, 3), jnp.float32),
            total_area=jnp.float32(0.0),
        )
    lv = v[ids]
    areas = 0.5 * np.linalg.norm(
        np.cross(lv[:, 1] - lv[:, 0], lv[:, 2] - lv[:, 0]), axis=1
    )
    total = float(areas.sum())
    cdf = np.cumsum(areas) / max(total, 1e-30)
    emission = np.asarray(ka)[mat_id[ids]]
    return Lights(
        tri=jnp.asarray(ids),
        cdf=jnp.asarray(cdf, jnp.float32),
        emission=jnp.asarray(emission, jnp.float32),
        total_area=jnp.float32(total),
    )


def build_wald(verts: np.ndarray) -> WaldTris:
    """Precompute per-triangle unit-triangle affine transforms (host, float64
    inverse for accuracy).  See ``types.WaldTris``.  Degenerate triangles get a
    transform that can never report a hit (d'_w = 0 ⇒ t = -inf)."""
    v = np.asarray(verts, np.float64).reshape(-1, 3, 3)
    t_count = v.shape[0]
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    n = np.cross(e1, e2)
    m = np.stack([e1, e2, n], axis=-1)  # (T, 3, 3), columns e1|e2|n
    det = np.linalg.det(m)
    ok = np.abs(det) > 1e-18
    m_safe = np.where(ok[:, None, None], m, np.eye(3)[None])
    a = np.linalg.inv(m_safe)  # (T, 3, 3): p' = A (p - v0)
    b = -np.einsum("tjk,tk->tj", a, v[:, 0])  # (T, 3)
    # degenerate: zero transform, offset puts o'_w = 1 and d'_w = 0 → miss
    a = np.where(ok[:, None, None], a, 0.0)
    b = np.where(ok[:, None], b, np.array([0.0, 0.0, 1.0]))
    w = np.transpose(a, (2, 0, 1))  # w[k, t, j] = A[t, j, k]
    return WaldTris(
        w=jnp.asarray(w, jnp.float32), b=jnp.asarray(b, jnp.float32)
    )


def build_scene(loaded: LoadedObject, bvhtype: str = "hlbvh"):
    """LoadedObject → (Scene, Lights) with the BVH selected by ``bvhtype``
    (reference ``Config::BVHTYPE()`` dispatch, ``scenebuild.cpp:66-79``).

    ``bvhtype``: ``hlbvh`` (LBVH), ``treelet``/``treeletGPU`` (LBVH + treelet SAH
    restructuring — both map to the same device-side optimizer here).
    """
    import jax

    from mcpt.bvh import lbvh as lbvh_mod

    geom, mats = loaded.to_device()
    # Build-time work runs on the host CPU backend: the build is argsort +
    # short scans over ~N elements, and on the tunnelled chip the many small
    # readbacks are latency-bound (measured 123 s vs <2 s for a 108k-tri scene).
    # The resulting arrays transfer to the accelerator on first render use.
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        bvh = lbvh_mod.build_lbvh(jnp.asarray(np.asarray(loaded.verts)))
        if bvhtype in ("treelet", "treelet_opt"):
            from mcpt.bvh import treelet as treelet_mod

            bvh = treelet_mod.optimize_treelets(bvh)
        elif bvhtype not in ("", "hlbvh", "lbvh", "treeletGPU"):
            raise ValueError(f"unknown bvhtype {bvhtype!r}")
    # re-materialize UNCOMMITTED (default-device) — arrays committed to the CPU
    # device would be re-transferred through the tunnel on every render call
    bvh = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), bvh)
    if bvhtype == "treeletGPU":
        # accelerator-side batched treelet DP (mcpt.bvh.treelet_device) — runs
        # on the default backend, i.e. the TPU when one is attached
        from mcpt.bvh import treelet_device

        bvh = treelet_device.optimize_treelets_device(bvh, verbose=True)
    lights = build_lights(loaded.verts, loaded.mat_id, loaded.mtype, loaded.ka)
    # scale-aware epsilon: 1e-4 of the scene diagonal (see types.Scene.eps)
    v = loaded.verts.reshape(-1, 3)
    diag = float(np.linalg.norm(v.max(axis=0) - v.min(axis=0)))
    clusters = None
    if geom.count > 512:
        # past the brute cutoff the hot intersector is the Pallas
        # block-coherent traversal over the clustered two-level BVH
        from mcpt.bvh import cluster as cluster_mod

        # Two candidate clusterings, picked by top-tree SAH (which predicts
        # the measured winner on both workload shapes): fixed Morton chunks
        # (full 32-row fill — wins on uniform scenes: boxfield 16.1 vs 14.1
        # Mrays/s primary) vs the SAH-subtree cut of the per-triangle BVH
        # (tighter boxes — wins on irregular interiors: diningroom 2.06 vs
        # 1.69 Mrays/s end-to-end).
        # The SAH is decided from cheap topology-only plans; the Wald-table
        # materialization (the expensive half) runs once, for the winner.
        nrm = np.asarray(geom.normals)
        p_morton = cluster_mod.plan_clusters(loaded.verts)
        # Plan the cut on a treelet-OPTIMIZED copy of the tree: restructuring
        # tightens the ≤32-tri subtrees the cut inherits (diningroom cut SAH
        # 39.1 → 31.5, −19% total box area at equal cluster count — round-4
        # measurement).  Planning-only: scene.bvh keeps the configured
        # bvhtype.  Native-gated (the numpy fallback costs minutes at 100k
        # tris on a 1-CPU host; the native optimizer costs ~0.15 s).
        plan_bvh = bvh
        if bvhtype in ("", "hlbvh", "lbvh"):
            try:
                from mcpt import native
                from mcpt.bvh import treelet as treelet_mod

                if native.available():
                    plan_bvh = treelet_mod.optimize_treelets(
                        bvh, use_native="always"
                    )
            except Exception:
                plan_bvh = bvh
        p_cut = cluster_mod.plan_clusters(loaded.verts, bvh=plan_bvh, dp=True)
        best = (
            p_morton
            if cluster_mod.plan_sah(p_morton) <= cluster_mod.plan_sah(p_cut)
            else p_cut
        )
        clusters = cluster_mod.build_clusters(loaded.verts, nrm,
                                              loaded.mat_id, plan=best)
    scene = Scene(
        geom=geom, materials=mats, bvh=bvh,
        eps=jnp.float32(max(1e-4 * diag, 1e-6)),
        wald=build_wald(loaded.verts),
        clusters=clusters,
    )
    return scene, lights


def loaded_from_arrays(verts, mat_id, mtype, kd, ks, ka, ns, ni,
                       names=None) -> LoadedObject:
    """Convenience for procedural scenes (mcpt.scenes) and tests."""
    return LoadedObject(
        verts=np.asarray(verts, np.float32).reshape(-1, 3, 3),
        mat_id=np.asarray(mat_id, np.int32).reshape(-1),
        mtype=np.asarray(mtype, np.int32).reshape(-1),
        kd=np.asarray(kd, np.float32).reshape(-1, 3),
        ks=np.asarray(ks, np.float32).reshape(-1, 3),
        ka=np.asarray(ka, np.float32).reshape(-1, 3),
        ns=np.asarray(ns, np.float32).reshape(-1),
        ni=np.asarray(ni, np.float32).reshape(-1),
        mat_names=list(names or []),
    )
