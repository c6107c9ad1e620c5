#!/usr/bin/env python
"""Headline benchmarks: path-tracing throughput on one TPU chip.

Three regimes, one JSON line each (the driver records the LAST line):

1. ``boxfield`` — 108k-triangle large-BVH scene (the reference diningroom
   workload shape, ``config.json:58-84``): wavefront pipeline + Pallas
   block-coherent BVH traversal, depth 8, inter-bounce resort.
2. ``veach_mis`` 768×512 depth 16 NEE+MIS (the reference veach workload
   shape, ``config.json:31-56``) — the megakernel's chunked fori tier.
3. ``cbox`` 1024² depth 16 — the fused Pallas megakernel (VMEM-sized scene).

The reference publishes no numbers (BASELINE.md) — the self-established north
star is ≥500 Mrays/s per chip on cbox 1024².  "Rays" counts *live* ray segments
actually traced (closest-hit queries on live paths + NEE shadow rays), measured
by the integrator itself, not the W·H·depth upper bound — dead lanes don't
count.  ``vs_baseline`` is value / 500 Mrays/s (ratio vs. that target).

Each regime reports the MEDIAN over ``n_batches`` timed batches (the tunnelled
chip varies ±10% run to run); every batch is forced to completion by a scalar
readback.
"""

from __future__ import annotations

import dataclasses
import json
import statistics
import sys
import time


def _enable_cache() -> None:
    # persistent XLA compile cache: the depth-16 megakernel and the depth-8
    # boxfield program each take minutes to compile cold; cached reloads are
    # ~100 ms, so driver re-runs of this script skip straight to measurement
    from mcpt.runtime import enable_compile_cache

    enable_compile_cache()


def _bench_cbox(n_batches: int = 6) -> dict:
    import jax

    from mcpt.render import camera as camera_mod
    from mcpt.scene import build_scene
    from mcpt.scenes import cornell_box

    width = height = 1024
    spp_per_batch = 32
    max_depth = 16  # the reference cbox workload depth (config.json:14)

    loaded, camcfg = cornell_box()
    camcfg = dataclasses.replace(camcfg, resolution=(width, height))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    # reference-parity estimator semantics: pure BSDF sampling (no NEE) so the
    # traced-segment count is directly comparable with the reference's kernel
    # launches; RR off.
    from mcpt.pallas import megakernel as mk

    mega = mk.build_megascene(scene)

    def step(seed):
        return mk.render_mega(
            mega, cam, width, height, spp=spp_per_batch, seed=seed,
            max_depth=max_depth,
        )

    rad, seg = step(0)  # warmup + compile
    jax.block_until_ready(rad)

    rates = []
    for i in range(n_batches):
        t0 = time.time()
        _, seg = step(i + 1)
        seg_f = float(seg)  # readback forces completion of this batch
        rates.append(seg_f / (time.time() - t0))
    mrays = statistics.median(rates) / 1e6
    return {
        "metric": "cbox 1024x1024 depth-16 path tracing throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 3),
    }


def _bench_veach(n_batches: int = 5) -> dict:
    """The reference veach_mis workload shape (config.json:31-56: 768×512,
    depth 16) with the north-star NEE+MIS estimator — 332 tris runs the
    megakernel's chunk-unrolled fori tier (UNROLL cap is 128)."""
    import jax

    from mcpt.pallas import megakernel as mk
    from mcpt.render import camera as camera_mod
    from mcpt.scene import build_scene
    from mcpt.scenes import veach_mis

    width, height = 768, 512
    spp_per_batch = 8

    loaded, camcfg = veach_mis()
    camcfg = dataclasses.replace(camcfg, resolution=(width, height))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    mega = mk.build_megascene(scene, lights)

    def step(seed):
        return mk.render_mega(mega, cam, width, height, spp=spp_per_batch,
                              seed=seed, max_depth=16, nee=True, mis=True)

    rad, _ = step(0)  # warmup + compile
    jax.block_until_ready(rad)
    rates = []
    for i in range(n_batches):
        t0 = time.time()
        _, seg = step(i + 1)
        seg_f = float(seg)
        rates.append(seg_f / (time.time() - t0))
    mrays = statistics.median(rates) / 1e6
    return {
        "metric": "veach_mis 768x512 depth-16 NEE+MIS throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 3),
    }


def _bench_boxfield(n_batches: int = 5) -> dict:
    import jax

    from mcpt.render import camera as camera_mod
    from mcpt.render import integrator as integ
    from mcpt.render.integrator import RenderOptions
    from mcpt.scene import build_scene
    from mcpt.scenes import boxfield

    width, height = 1280, 720
    max_depth = 8  # the reference diningroom workload depth (config.json:70)
    spp_per_batch = 4

    loaded, camcfg = boxfield(9000)  # 108k triangles
    camcfg = dataclasses.replace(camcfg, resolution=(width, height))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    opts = RenderOptions(max_depth=max_depth, method="auto", resort=True)

    import functools

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=())
    def step(key):
        keys = jax.random.split(key, spp_per_batch)
        perm, _ = camera_mod.tile_order(width, height)
        pix = jnp.asarray(perm)
        pools = jax.vmap(
            lambda k: camera_mod.generate_rays_for_pixels(
                cam, width, height, pix, key=k, jitter=True
            )
        )(keys)
        flat = jax.tree.map(
            lambda x: x.reshape((spp_per_batch * width * height,)
                                + x.shape[2:]), pools
        )
        _, segs = integ.trace(scene, lights, flat, key, opts, with_stats=True)
        return segs

    seg = step(jax.random.key(0))  # warmup + compile
    jax.block_until_ready(seg)

    rates = []
    for i in range(n_batches):
        t0 = time.time()
        seg_f = float(step(jax.random.key(i + 1)))
        rates.append(seg_f / (time.time() - t0))
    mrays = statistics.median(rates) / 1e6
    return {
        "metric": "boxfield 108k-tri 1280x720 depth-8 BVH path tracing",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 500.0, 3),
    }


def main() -> int:
    _enable_cache()
    print(json.dumps(_bench_boxfield()), flush=True)
    print(json.dumps(_bench_veach()), flush=True)
    print(json.dumps(_bench_cbox()), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
