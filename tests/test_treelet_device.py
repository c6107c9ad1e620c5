"""Device-side (treeletGPU) treelet optimizer vs the CPU reference optimizer.

The two implementations share the algorithm (greedy 7-leaf treelets, subset
DP) but nothing else — the device version is a batched tensor program — so
SAH agreement within tolerance plus structural validation is a strong
cross-check (the reference has no such test; its GPU/CPU builders disagree
silently, ``scenebuild.cpp:80-95``).
"""

import jax.numpy as jnp
import numpy as np

from mcpt.bvh import lbvh as lbvh_mod
from mcpt.bvh import treelet as tl
from mcpt.bvh import treelet_device as tld
from mcpt.bvh.lbvh import validate_bvh
from mcpt.bvh.metrics import sah
from mcpt.scenes import boxfield


def test_device_matches_cpu_sah():
    loaded, _ = boxfield(400)
    verts = jnp.asarray(loaded.verts)
    bvh0 = lbvh_mod.build_lbvh(verts)
    s0 = float(sah(bvh0))
    s_cpu = float(sah(tl.optimize_treelets(bvh0, use_native="never")))
    bvh_dev = tld.optimize_treelets_device(bvh0)
    s_dev = float(sah(bvh_dev))
    assert s_dev < s0 * 0.9, (s_dev, s0)  # real improvement
    # within 3% of the CPU optimizer (measured: slightly better, 35.69% vs
    # 35.62% improvement — the device pool assignment breaks DP ties
    # differently)
    assert s_dev <= s_cpu * 1.03, (s_dev, s_cpu)

    v = validate_bvh(bvh_dev, verts)
    assert v["ok"], v["errors"][:5]


def test_device_small_tree_passthrough():
    rng = np.random.default_rng(0)
    verts = jnp.asarray(rng.normal(size=(5, 3, 3)).astype(np.float32))
    bvh0 = lbvh_mod.build_lbvh(verts)
    out = tld.optimize_treelets_device(bvh0)
    assert out.n_tris == 5
    assert validate_bvh(out, verts)["ok"]


def test_build_scene_treeletgpu_dispatch():
    from mcpt.scene import build_scene

    loaded, _ = boxfield(60)
    scene_g, _ = build_scene(loaded, bvhtype="treeletGPU")
    scene_0, _ = build_scene(loaded, bvhtype="hlbvh")
    assert float(sah(scene_g.bvh)) <= float(sah(scene_0.bvh)) + 1e-3
    assert validate_bvh(scene_g.bvh, scene_g.geom.verts)["ok"]
