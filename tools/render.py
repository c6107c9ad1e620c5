#!/usr/bin/env python
"""Progressive render driver — the framework's main entry point.

TPU-era replacement for the reference's GLUT window + frame loop
(``main.cpp:21-23``, ``openglapp.cpp:40-63``, ``OpenCLApp.cpp:57-82``): there is no
GL on a TPU host, so the "display" is a progressive PNG/HDR/EXR snapshot sink plus
a live samples/sec + Mrays/s line (the reference prints FPS in the window title,
``openglapp.cpp:52-56``).  Modes mirror ``main.cpp:11-25``: ``testbvh``/``testall``
dispatch to the BVH-metrics harness (``tools/bvh_bench.py``), otherwise render.

Usage:
    python tools/render.py [--config PATH] [--configid N] [--spp N] [--out DIR]
                           [--snapshot-every N] [--resume]

The config schema is the reference's ``config.json`` (``mcpt.config``).  When the
scene ``.obj`` is missing (the reference repo gitignores all geometry), an
``objname`` of the form ``procedural:<name>`` renders a built-in scene
(``mcpt.scenes``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_from_config(cfg):
    from mcpt import scenes as procedural
    from mcpt.io.objloader import load_object
    from mcpt.scene import build_scene

    name = cfg.objname if isinstance(cfg.objname, str) else cfg.objnames[0]
    if name.startswith("procedural:"):
        builder = getattr(procedural, name.split(":", 1)[1])
        loaded, cam_default = builder()
        cam_cfg = cfg.camera or cam_default
    else:
        loaded = load_object(cfg.directory, name)
        cam_cfg = cfg.camera
        if cam_cfg is None:
            raise SystemExit("config has no camera block")
    scene, lights = build_scene(loaded, cfg.bvhtype)
    return scene, lights, cam_cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--config", default="config.json")
    ap.add_argument("--configid", type=int, default=None)
    ap.add_argument("--spp", type=int, default=None, help="override 'attempt'")
    ap.add_argument("--width", type=int, default=None)
    ap.add_argument("--height", type=int, default=None)
    ap.add_argument("--out", default=".", help="output directory")
    ap.add_argument("--snapshot-every", type=int, default=0,
                    help="write a progressive PNG every N samples")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save (sum, count) every N samples for --resume")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the checkpoint in --out")
    ap.add_argument("--resort", choices=["auto", "on", "off"], default="auto",
                    help="inter-bounce ray re-sorting (Morton/octant) for the "
                         "wavefront BVH path; auto = on for clustered scenes")
    ap.add_argument("--profile", action="store_true",
                    help="per-stage timing report at exit (runtime.StageTimer"
                         " — the reference's profiling queue + timeCost, "
                         "oclbasic.cpp:117,232-247); the hybrid engine also "
                         "prints a per-bounce kernel/sort/compaction "
                         "breakdown from one instrumented step")
    args = ap.parse_args(argv)

    from mcpt.config import load_config

    cfg = load_config(args.config, args.configid)

    if cfg.testall or cfg.testbvh:
        # mode dispatch parity with main.cpp:12-19.  The metrics harness is
        # host-side analysis — run it on CPU (device readbacks through the
        # tunnelled TPU are pathologically slow).
        import jax

        jax.config.update("jax_platforms", "cpu")
        from tools import bvh_bench

        return bvh_bench.run_from_config(cfg)

    import jax

    from mcpt import runtime

    runtime.enable_compile_cache()
    from mcpt.io import image as im
    from mcpt.render import camera as camera_mod
    from mcpt.render import integrator as integ
    from mcpt.types import Framebuffer, make_framebuffer

    scene, lights, cam_cfg = build_from_config(cfg)
    width = args.width or cfg.width or cam_cfg.resolution[0]
    height = args.height or cfg.height or cam_cfg.resolution[1]
    if cam_cfg.resolution != (width, height):
        import dataclasses

        cam_cfg = dataclasses.replace(cam_cfg, resolution=(width, height))
    spp = args.spp or cfg.attempt or 64
    cam = camera_mod.make_camera(cam_cfg)

    opts = integ.RenderOptions(
        max_depth=cfg.maxdepth or 16,
        nee=cfg.integrator.nee,
        mis=cfg.integrator.mis,
        russian_roulette=cfg.integrator.russian_roulette,
        rr_start_depth=cfg.integrator.rr_start_depth,
        method=cfg.intersector,
    )
    stem = cfg.output_stem or "render"
    stem = stem.replace("procedural:", "")
    os.makedirs(args.out, exist_ok=True)
    ckpt_path = os.path.join(args.out, f"{stem}.ckpt.npz")

    fb = make_framebuffer(width * height)
    start_s = 0
    if args.resume and os.path.exists(ckpt_path):
        import jax.numpy as jnp

        z = np.load(ckpt_path)
        fb = Framebuffer(sum=jnp.asarray(z["sum"]), count=jnp.asarray(z["count"]))
        start_s = int(z["done"])
        print(f"resumed at {start_s} spp from {ckpt_path}")

    print(
        f"scene: {scene.n_tris} tris, {lights.count} light tris | "
        f"{width}x{height} @ {spp} spp, depth {opts.max_depth}, "
        f"nee={opts.nee} mis={opts.mis} rr={opts.russian_roulette} "
        f"intersector={opts.method} bvh={cfg.bvhtype} | devices={jax.devices()}"
    )

    engine = cfg.engine
    if engine == "auto":
        # measured crossover (docs/PERF_NOTES.md round-4 sweep, boxfield d8
        # spp16): mega 66.8/42.6/20.4/7.8 vs hybrid 29.6/28.5/25.6/20.0
        # Mrays/s at 724/1204/2404/6004 tris — the curves cross at ~1.7k, so
        # the dense megakernel keeps only the truly small scenes and the
        # hybrid fused-bounce engine takes the rest
        engine = "mega" if scene.n_tris <= 1500 else "hybrid"

    # multi-chip: the config's ``mesh`` key ({"samples": s, "pixels": p})
    # routes every engine through its shard_map twin in mcpt.dist — the
    # sharded-rendering path BASELINE.md targets ("progressive 4 spp/step
    # sharded over v5p-8 mesh"); the reference is single-queue
    # (oclbasic.cpp:14,117)
    mesh = None
    if cfg.mesh and len(jax.devices()) > 1:
        from mcpt import dist

        mesh = dist.make_mesh(
            samples=int(cfg.mesh.get("samples", 1)),
            pixels=int(cfg.mesh.get("pixels", 0)) or None,
        )
        print(f"mesh: {dict(mesh.shape)} over {mesh.devices.size} devices")
    elif cfg.mesh:
        print("config requests a device mesh but only one device is "
              "visible — rendering single-chip")
    if engine != "mega":
        from mcpt.render import traverse as trv

        resort = (args.resort == "on"
                  or (args.resort == "auto"
                      and trv.resolve_method(scene, opts.method) == "cluster"))
        if resort:
            opts = opts._replace(resort=True)
    if engine == "mega":
        from mcpt.pallas import megakernel as mk

        mega = mk.build_megascene(scene, lights)
        interp = jax.default_backend() != "tpu"  # CPU hosts: TPU interpreter

        if mesh is not None:
            from mcpt import dist

            def render_step(seed_step, step):
                return dist.render_mega_sharded(
                    mega, cam, width, height, spp=step, mesh=mesh,
                    seed=seed_step, max_depth=opts.max_depth,
                    nee=opts.nee, mis=opts.mis, rr=opts.russian_roulette,
                    clamp=cfg.integrator.clamp, interpret=interp,
                )
        else:
            def render_step(seed_step, step):
                return mk.render_mega(
                    mega, cam, width, height, spp=step, seed=seed_step,
                    max_depth=opts.max_depth, rr=opts.russian_roulette,
                    rr_start=opts.rr_start_depth, nee=opts.nee, mis=opts.mis,
                    clamp=cfg.integrator.clamp, interpret=interp,
                )
    elif engine in ("cluster-mega", "hybrid"):
        # the fused large-scene engines (mcpt.pallas.cluster_megakernel):
        # "cluster-mega" keeps whole paths in one kernel; "hybrid" fuses one
        # bounce per kernel with the inter-bounce coherence re-sort (faster
        # on deep incoherent workloads — the production large-scene engine)
        from mcpt.pallas import cluster_megakernel as cmk

        cms = cmk.build_cluster_megascene(scene, lights)
        interp = jax.default_backend() != "tpu"
        extra = {}
        if engine == "hybrid" and not interp:
            # pilot-measured unbiased pool compaction (shrinks the
            # inter-bounce sort/pool as paths die; ~no-op on closed scenes)
            extra["compact"] = integ.measure_schedule(
                scene, lights, cam,
                opts._replace(method="bvh"),
            )

        if mesh is not None and engine == "hybrid":
            from mcpt import dist

            cam_r = dist.replicate(cam, mesh)

            def render_step(seed_step, step):
                return dist.render_hybrid_sharded(
                    cms, cam_r, width, height, spp=step, mesh=mesh,
                    seed=seed_step, max_depth=opts.max_depth,
                    nee=opts.nee, mis=opts.mis, rr=opts.russian_roulette,
                    interpret=interp, **extra,
                )
        elif mesh is not None:
            from mcpt import dist

            def render_step(seed_step, step):
                return dist.render_cluster_sharded(
                    cms, cam, width, height, spp=step, mesh=mesh,
                    seed=seed_step, max_depth=opts.max_depth,
                    nee=opts.nee, mis=opts.mis, rr=opts.russian_roulette,
                    interpret=interp,
                )
        else:
            render_one = (cmk.render_hybrid if engine == "hybrid"
                          else cmk.render_cluster_mega)

            def render_step(seed_step, step):
                return render_one(
                    cms, cam, width, height, spp=step, seed=seed_step,
                    max_depth=opts.max_depth, rr=opts.russian_roulette,
                    rr_start=opts.rr_start_depth, nee=opts.nee, mis=opts.mis,
                    clamp=cfg.integrator.clamp, interpret=interp, **extra,
                )
    else:
        if mesh is not None:
            from mcpt import dist

            def render_step(seed_step, step):
                return dist.render_batch_sharded(
                    scene, lights, cam, width, height,
                    jax.random.fold_in(jax.random.key(cfg.seed), seed_step),
                    opts, step, mesh, with_stats=True,
                )
        else:
            def render_step(seed_step, step):
                return integ.render_batch(
                    scene, lights, cam, width, height,
                    jax.random.fold_in(jax.random.key(cfg.seed), seed_step),
                    opts, spp=step, with_stats=True,
                )

    print(f"engine: {engine}")
    base = jax.random.key(cfg.seed)
    t0 = time.time()
    t_last, s_last = t0, start_s
    step_size = max(1, cfg.spp_per_step)
    if mesh is not None:
        # every sharded step renders a samples-axis multiple
        d_s = mesh.shape["samples"]
        step_size = max(d_s, (step_size // d_s) * d_s)
        if spp % d_s:
            spp = ((spp + d_s - 1) // d_s) * d_s
            print(f"spp rounded up to {spp} (samples axis = {d_s})")
    done = start_s
    timer = runtime.StageTimer() if args.profile else None
    # measured Mrays/s: every engine, single-chip or sharded, counts live
    # segments (closest-hit queries on live paths + NEE shadow rays) — the
    # honest number the reference shows as FPS (openglapp.cpp:52-56); the
    # ``≤`` upper-bound fallback remains only for a future engine without a
    # counter
    segs_done, segs_last = 0.0, 0.0
    # interval triggers track the last fire (done advances in spp_per_step
    # strides, which may never land on an exact multiple of the interval)
    snap_last, ckpt_last = done, done
    while done < spp:
        step = min(step_size, spp - done)
        if timer is not None:
            with timer.stage("render_step"):
                radiance, segs = render_step(cfg.seed + done * 7919, step)
                timer.sync(radiance)
            with timer.stage("accumulate"):
                fb = integ.accumulate(fb, radiance, spp=step)
                timer.sync(fb.sum)
        else:
            radiance, segs = render_step(cfg.seed + done * 7919, step)
            fb = integ.accumulate(fb, radiance, spp=step)
        done += step
        if segs is not None:
            segs_done += float(segs)  # forces the step (device scalar read)
        now = time.time()
        if now - t_last > 2.0 or done == spp:
            jax.block_until_ready(fb.sum)
            now = time.time()
            sps = (done - s_last) / max(now - t_last, 1e-9)
            if segs is not None:
                rays = (segs_done - segs_last) / max(now - t_last, 1e-9)
                rays_s = f"{rays/1e6:8.2f} Mrays/s"
            else:
                rays = sps * width * height * opts.max_depth  # upper bound
                rays_s = f"≤{rays/1e6:7.2f} Mrays/s"
            print(
                f"  {done}/{spp} spp | {sps:6.2f} spp/s | "
                f"{rays_s} | {now - t0:6.1f}s elapsed",
                flush=True,
            )
            t_last, s_last = now, done
            segs_last = segs_done
        if (args.snapshot_every and done - snap_last >= args.snapshot_every
                and done < spp):
            snap_last = done
            img = integ.framebuffer_image(fb, width, height)
            im.write_png(
                os.path.join(args.out, f"{stem}.png"), im.tonemap_srgb(img[::-1])
            )
        if args.checkpoint_every and done - ckpt_last >= args.checkpoint_every:
            ckpt_last = done
            np.savez(
                ckpt_path, sum=np.asarray(fb.sum), count=np.asarray(fb.count),
                done=done,
            )

    img = integ.framebuffer_image(fb, width, height)
    # final outputs: .hdr like the reference (colorout.cpp:63-68) + png + exr
    if timer is not None:
        with timer.stage("image_io"):
            im.write_hdr(os.path.join(args.out, f"{stem}.hdr"), img)
            im.write_png(os.path.join(args.out, f"{stem}.png"),
                         im.tonemap_srgb(img[::-1]))
            im.write_exr(os.path.join(args.out, f"{stem}.exr"), img[::-1])
    else:
        im.write_hdr(os.path.join(args.out, f"{stem}.hdr"), img)
        im.write_png(os.path.join(args.out, f"{stem}.png"),
                     im.tonemap_srgb(img[::-1]))
        im.write_exr(os.path.join(args.out, f"{stem}.exr"), img[::-1])
    print(f"Finished Attempting")  # parity with colorout.cpp:65
    print(f"wrote {stem}.hdr/.png/.exr in {args.out}")
    if timer is not None:
        print("\nprofile: CLI stage totals (first render_step includes "
              "compile)")
        print(timer.report())
        if engine == "hybrid" and mesh is None:
            from mcpt.pallas import cluster_megakernel as cmk

            print("\nprofile: hybrid per-bounce breakdown "
                  "(one instrumented step, stage-level jits)")
            prof_kw = dict(
                spp=min(step_size, spp),
                seed=cfg.seed + (spp + 1) * 7919, max_depth=opts.max_depth,
                rr=opts.russian_roulette, rr_start=opts.rr_start_depth,
                nee=opts.nee, mis=opts.mis, clamp=cfg.integrator.clamp,
                interpret=interp, **extra,
            )
            # warmup pass compiles every stage jit so the reported pass is
            # pure execution (stage-level compiles otherwise dominate)
            cmk.profile_hybrid(cms, cam, width, height, **prof_kw)
            t2, _, _ = cmk.profile_hybrid(cms, cam, width, height, **prof_kw)
            print(t2.report())
    return 0


if __name__ == "__main__":
    sys.exit(main())
