#!/usr/bin/env python
"""Headline benchmark: path-tracing throughput on the Cornell box at 1024².

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md) — the self-established north
star is ≥500 Mrays/s per chip on cbox 1024².  "Rays" counts *live* ray segments
actually traced (closest-hit queries on live paths + NEE shadow rays), measured
by the integrator itself, not the W·H·depth upper bound — dead lanes don't count.
``vs_baseline`` is value / 500 Mrays/s (ratio vs. the target).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import sys
import time


def main() -> int:
    import jax
    import numpy as np

    from mcpt.render import camera as camera_mod
    from mcpt.render import integrator as integ
    from mcpt.render.integrator import RenderOptions
    from mcpt.scene import build_scene
    from mcpt.scenes import cornell_box

    width = height = 1024
    spp_per_batch = 32
    n_batches = 2
    max_depth = 16  # the reference cbox workload depth (config.json:14)

    loaded, camcfg = cornell_box()
    camcfg = dataclasses.replace(camcfg, resolution=(width, height))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    # reference-parity estimator semantics: pure BSDF sampling (no NEE) so the
    # traced-segment count is directly comparable with the reference's kernel
    # launches; RR off.  Small scenes render through the Pallas megakernel
    # (mcpt/pallas/megakernel.py); the wavefront path covers everything else.
    from mcpt.pallas import megakernel as mk

    mega = mk.build_megascene(scene)

    def step(seed):
        return mk.render_mega(
            mega, cam, width, height, spp=spp_per_batch, seed=seed,
            max_depth=max_depth,
        )

    # warmup + compile
    rad, seg = step(0)
    jax.block_until_ready(rad)

    t0 = time.time()
    total_segments = 0.0
    for i in range(n_batches):
        rad, seg = step(i + 1)
        total_segments += float(seg)  # readback forces completion of this batch
    elapsed = time.time() - t0

    mrays = total_segments / elapsed / 1e6
    result = {
        "metric": "cbox 1024x1024 depth-16 path tracing throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 3),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
