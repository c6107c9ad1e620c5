#!/usr/bin/env python
"""High-spp precision gate for the PRODUCTION engines (run ON the TPU).

The committed goldens (``tests/goldens/*.exr``, 2048 spp) were rendered by
the dense megakernel (cbox) and by ``render_hybrid`` itself (diningroom —
so that row is a self-consistency gate, not a cross-engine one; the
independent diningroom cross-check is docs/VALIDATION.md §5b);
``docs/VALIDATION.md`` §2b evidences the ≤1% BASELINE bar for the dense
megakernel only.  This script closes the gap for the engine users actually
get on large scenes: it renders cbox and diningroom at ≥512 spp through
``render_hybrid`` (fused bounce + coherence re-sort + pilot compaction —
the CLI's auto engine past the measured ~1.5k-tri crossover) and gates the
rel-RMSE against the goldens at the measured-noise level.  Mirrors the
reference's golden-comparison workflow (``Scene/README.md:19``).

Recorded runs live in docs/VALIDATION.md §5.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "goldens")

# (scene, W, H, spp, depth, gate) — W/H must match the committed golden.
# Gates: combined MC noise of (test, golden) renders × ~1.4 headroom.
#   cbox: 16-spp noise ≈ 0.11 ⇒ 1024-spp ≈ 1.4%, golden 2048 ≈ 1.0%,
#         combined ≈ 1.7% ⇒ gate 2.5%.
#   diningroom: 8-spp noise ≈ 0.30 ⇒ 1024-spp ≈ 2.7%, golden ≈ 1.9%,
#         combined ≈ 3.3% ⇒ gate 4.5%.
GATES = [
    ("cornell_box", 128, 128, 1024, 16, 0.025),
    ("diningroom", 160, 90, 1024, 8, 0.045),
]


def main() -> int:
    import jax
    import numpy as np

    from mcpt import runtime, scenes
    from mcpt.bvh import cluster as cluster_mod
    from mcpt.io import image as im
    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.render import camera as camera_mod
    from mcpt.render import integrator as integ
    from mcpt.scene import build_scene
    from tools.compare import compare

    runtime.enable_compile_cache()
    if jax.default_backend() != "tpu":
        print("WARNING: not on TPU — this will be extremely slow",
              file=sys.stderr)

    failures = 0
    for name, w, h, spp, depth, tol in GATES:
        golden = im.read_exr_rgb(
            os.path.join(_GOLDEN_DIR, f"{name}.exr"))[::-1]
        loaded, camcfg = getattr(scenes, name)()
        camcfg = dataclasses.replace(camcfg, resolution=(w, h))
        scene, lights = build_scene(loaded)
        if scene.clusters is None:
            # small scenes (cbox) get no cluster BVH from build_scene; the
            # hybrid engine still runs on a Morton-chunk clustering
            nrm = np.asarray(scene.geom.normals)
            scene = scene._replace(clusters=cluster_mod.build_clusters(
                loaded.verts, nrm, loaded.mat_id))
        cam = camera_mod.make_camera(camcfg)
        cms = cmk.build_cluster_megascene(scene, lights)
        sched = integ.measure_schedule(
            scene, lights, cam,
            integ.RenderOptions(max_depth=depth, nee=True, mis=True,
                                method="bvh"),
        )
        t0 = time.time()
        acc = np.zeros((w * h, 3), np.float64)
        segs = 0.0
        # 64-spp batches: bounded pool memory, distinct seeds per batch
        step = 64
        for s0 in range(0, spp, step):
            rad, seg = cmk.render_hybrid(
                cms, cam, w, h, spp=step, seed=1000 + s0, max_depth=depth,
                nee=True, mis=True, compact=sched,
            )
            acc += np.asarray(rad, np.float64)
            segs += float(seg)
        img = (acc / spp).reshape(h, w, 3)
        dt = time.time() - t0
        stats = compare(img, golden.astype(np.float64))
        ok = stats["rel_rmse"] < tol
        failures += 0 if ok else 1
        print(
            f"{name:12s} {w}x{h} spp={spp} depth={depth} "
            f"rel_rmse={stats['rel_rmse']:.4f} (gate {tol}) "
            f"mean={img.mean():.4f} golden_mean={golden.mean():.4f} "
            f"{segs/dt/1e6:6.2f} Mrays/s {dt:6.1f}s "
            f"{'OK' if ok else 'FAIL'}",
            flush=True,
        )
    return failures


if __name__ == "__main__":
    sys.exit(main())
