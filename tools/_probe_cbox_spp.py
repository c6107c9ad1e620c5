"""One-off probe: cbox megakernel spp/batch 64 (shipped) vs 128.

Replicates bench.py:_bench_cbox exactly; one process so the chip is
claimed once.  Run from the repo root on the TPU.
"""
import dataclasses
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mcpt.runtime import enable_compile_cache

enable_compile_cache()

import jax

from mcpt.pallas import megakernel as mk
from mcpt.render import camera as camera_mod
from mcpt.scene import build_scene
from mcpt.scenes import cornell_box

width = height = 1024
loaded, camcfg = cornell_box()
camcfg = dataclasses.replace(camcfg, resolution=(width, height))
scene, lights = build_scene(loaded)
cam = camera_mod.make_camera(camcfg)
mega = mk.build_megascene(scene)

for spp in (64, 128, 256):
    def step(seed):
        return mk.render_mega(mega, cam, width, height, spp=spp, seed=seed,
                              max_depth=16)

    t0 = time.time()
    rad, _ = step(0)
    jax.block_until_ready(rad)
    print(f"spp={spp}: warmup {time.time()-t0:.1f}s", flush=True)
    rates = []
    for i in range(6):
        t0 = time.time()
        _, seg = step(i + 1)
        rates.append(float(seg) / (time.time() - t0))
    print(f"spp={spp}: median {statistics.median(rates)/1e6:.1f} Mrays/s",
          flush=True)
