"""One-off probe #2: cbox spp=512 tail + veach spp 128/256 (shipped=128).

Same methodology as tools/_probe_cbox_spp.py; one process, one chip claim.
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
from mcpt.scenes import cornell_box, veach_mis


def bench(tag, mega, cam, width, height, spp, max_depth, nee):
    def step(seed):
        return mk.render_mega(mega, cam, width, height, spp=spp, seed=seed,
                              max_depth=max_depth, nee=nee, mis=nee)

    t0 = time.time()
    rad, _ = step(0)
    jax.block_until_ready(rad)
    print(f"{tag} spp={spp}: warmup {time.time()-t0:.1f}s", flush=True)
    rates = []
    for i in range(6):
        t0 = time.time()
        _, seg = step(i + 1)
        rates.append(float(seg) / (time.time() - t0))
    print(f"{tag} spp={spp}: median {statistics.median(rates)/1e6:.1f} Mrays/s",
          flush=True)


loaded, camcfg = cornell_box()
camcfg = dataclasses.replace(camcfg, resolution=(1024, 1024))
scene, _ = build_scene(loaded)
cam = camera_mod.make_camera(camcfg)
mega = mk.build_megascene(scene)
bench("cbox", mega, cam, 1024, 1024, 512, 16, nee=False)

loaded, camcfg = veach_mis()
camcfg = dataclasses.replace(camcfg, resolution=(768, 512))
scene, lights = build_scene(loaded)
cam = camera_mod.make_camera(camcfg)
mega = mk.build_megascene(scene, lights)
for spp in (128, 256):
    bench("veach", mega, cam, 768, 512, spp, 16, nee=True)
