#!/usr/bin/env python
"""Headline benchmarks: path-tracing throughput on one TPU chip.

Four regimes (the reference's three workload shapes + the large-BVH stress
scene), one JSON line each, then a summary line — the driver records the
LAST line, so the summary carries every regime (the round-2 verdict's
fix: the weakest regime must be visible in round-over-round tracking, like
the reference printing every metric it measures, ``bvhtest.cpp:476-494``).

**This run can never record nothing** (the round-4 failure: one cold-compile
cascade overran the driver's timeout before the first regime printed, and
``BENCH_r04.json`` recorded ``parsed: null`` — the reference never has this
problem, its FPS is on screen every frame, ``openglapp.cpp:52-56``):

- regimes run cheapest-compile-first (veach ~5 s cold, cbox minutes, the
  two hybrid scenes worst — docs/PERF_NOTES.md cold-compile table);
- each regime runs under a ``signal.alarm`` wall budget
  (``MCPT_BENCH_REGIME_BUDGET``, default 480 s) — an overrun or error is
  recorded as skipped, and the next regime still runs;
- the running summary line is re-printed after EVERY regime, and a
  SIGTERM/atexit handler prints it one final time — so however this process
  dies, the last stdout line is a valid summary of whatever completed,
  with the casualties named in ``skipped``.

1. ``veach_mis`` 768×512 depth 16 NEE+MIS (the reference veach workload
   shape, ``config.json:31-56``) — the megakernel's chunked fori tier.
2. ``cbox`` 1024² depth 16 — the fused Pallas megakernel (VMEM-sized scene).
3. ``boxfield`` — 108k-triangle large-BVH scene (the reference diningroom
   workload shape, ``config.json:58-84``), depth 8.
4. ``diningroom`` — procedural interior ~96k tris, 1280×720 depth-8 NEE+MIS
   (the reference's actual third workload, ``config.json:58-84``).

The reference publishes no numbers (BASELINE.md).  Per-regime ``vs_baseline``:
cbox is measured against the self-established ≥500 Mrays/s north star; the
other regimes have no cross-workload target (ADVICE r2), so their ratio is
against THIS REPO'S round-2 recorded value (README perf table) — i.e. it reads
as round-over-round progress, ``1.0`` = no change since round 2.

"Rays" counts *live* ray segments actually traced (closest-hit queries on live
paths + NEE shadow rays), measured by the integrator itself, not the
W·H·depth upper bound — dead lanes don't count.  Each regime reports the
MEDIAN over ``n_batches`` timed batches (the tunnelled chip varies ±10% run to
run); every batch is forced to completion by a scalar readback.

MFU model (the summary's ``mfu_*`` keys): achieved useful FLOP/s over the
*measured* f32 VPU FMA peak of the attached chip
(``mcpt.runtime.measure_vpu_peak`` — a VMEM-resident FMA-chain kernel at
~128 flop/byte, so it reads the vector units, not HBM).  Useful flops per
segment are a static count of the work the estimator requires:

- one Wald triangle test = 18 FMA + 1 div + ~8 cmp/select ≈ 44 VPU ops;
- dense tiers test every (padded) triangle row per segment, so
  ``flops/seg = 44·T_rows + 300`` (≈300 = shade: BSDF sample, ONB, RNG);
- NEE adds a shadow-ray pass over the same rows + ~200 light-sampling ops,
  counted on the shadow segments the integrator already reports.

Exact for cbox (every row genuinely tested) AND for veach: one instrumented
batch (``render_mega(count_rows=True)``) counts the live-lane rows actually
tested after chunk-AABB culling, replacing the static 44·T_rows upper bound
with the measured rows-tested-per-segment (round-3 verdict weak-#3).  The BVH
regimes have no static model (data-dependent node pops), so no mfu is
reported for them.
"""

from __future__ import annotations

import atexit
import dataclasses
import json
import math
import os
import signal
import statistics
import sys
import time

# Round-2 recorded per-regime numbers (README perf table) — the
# round-over-round denominators for regimes without an absolute target.
R2_BASELINE = {"boxfield": 2.83, "diningroom": 2.06, "veach_mis": 36.4}
NORTH_STAR_CBOX = 500.0

# VPU ops per Wald triangle test (18 FMA + div + compares/selects).
_FLOPS_WALD = 44.0
_FLOPS_SHADE = 300.0


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
    # spp/batch sweep (r5): 32 -> 819, 64 -> 942, 128 -> 1023, 256 -> 1077,
    # 512 -> 1113 Mrays/s (tools/_probe_cbox_spp.py / _probe_spp2.py) — the
    # regen schedule's per-lane sample loop amortizes the block-retire tail
    # and per-call dispatch; memory is spp-independent (lanes = pixels)
    spp_per_batch = 512
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
        "vs_baseline": round(mrays / NORTH_STAR_CBOX, 3),
        "_flops_per_seg": _FLOPS_WALD * mega.tri.shape[0] + _FLOPS_SHADE,
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
    # spp/batch sweep (r5, the round-5 veach fix — the flat 36.4 was a
    # batching artifact, not a kernel ceiling): 8 -> 36.9, 32 -> 51.5,
    # 64 -> 56.5, 128 -> 60.3, 256 -> 62.9 Mrays/s.  regen lanes = pixels,
    # so at spp=8 each lane traces only 8 short paths and the whole-block
    # retire tail (lanes idle until the slowest lane in the block finishes)
    # plus per-call dispatch dominate; at spp=256 the tail amortizes 32x
    # (tools/_probe_spp2.py; the curve is ~flat past here).
    spp_per_batch = 256

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

    # EXACT flops/seg: one instrumented batch counts the live-lane triangle
    # rows actually tested after chunk-AABB culling (mk.render_mega
    # count_rows=True) — the static 44·T_rows model is an upper bound by
    # the skip rate, which this replaces (round-3 verdict weak-#3)
    _, seg_i, trows = mk.render_mega(
        mega, cam, width, height, spp=spp_per_batch, seed=n_batches + 1,
        max_depth=16, nee=True, mis=True, count_rows=True,
    )
    flops_per_seg = _FLOPS_WALD * float(trows) / float(seg_i) + _FLOPS_SHADE
    return {
        "metric": "veach_mis 768x512 depth-16 NEE+MIS throughput",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / R2_BASELINE["veach_mis"], 3),
        # shadow segments are included in the seg count already
        "_flops_per_seg": flops_per_seg,
        "_rows_tested_per_seg": round(float(trows) / float(seg_i), 1),
        "_rows_total": mega.tri.shape[0],
    }


def _bench_large(scene, lights, cam, metric: str, baseline_key: str,
                 width: int, height: int, max_depth: int, nee: bool,
                 spp_per_batch: int, n_batches: int = 5) -> dict:
    """Shared large-BVH end-to-end bench — the hybrid fused-bounce engine
    (one Pallas call per bounce fusing closest walk + shade + NEE shadow
    walk + RR, inter-bounce coherence re-sort; the CLI's ``auto`` engine for
    scenes past the measured ~1.5k-tri crossover, tools/render.py)."""
    import jax

    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.render import integrator as integ

    cms = cmk.build_cluster_megascene(scene, lights)
    # pilot-measured unbiased pool-compaction schedule (shrinks the
    # inter-bounce sort + pool as paths die; ≈no-op caps on closed scenes)
    sched = integ.measure_schedule(
        scene, lights, cam,
        # method="bvh": the XLA stack walk needs no Pallas compile for the
        # small pilot shapes (live fractions are intersector-independent)
        integ.RenderOptions(max_depth=max_depth, nee=nee, mis=nee,
                            method="bvh"),
    )

    def step(seed):
        return cmk.render_hybrid(
            cms, cam, width, height, spp=spp_per_batch, seed=seed,
            max_depth=max_depth, nee=nee, mis=nee, compact=sched,
        )

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
        "metric": metric,
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / R2_BASELINE[baseline_key], 3),
    }


def _bench_boxfield(n_batches: int = 5) -> dict:
    import dataclasses as dc

    from mcpt.render import camera as camera_mod
    from mcpt.scene import build_scene
    from mcpt.scenes import boxfield

    width, height = 1280, 720
    loaded, camcfg = boxfield(9000)  # 108k triangles
    camcfg = dc.replace(camcfg, resolution=(width, height))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    # spp/batch sweep (r5): 16 -> 11.1, 32 -> 12.8, 64 -> 14.0 Mrays/s —
    # bigger pools pack coherence-sort buckets better and amortize
    # per-bounce pipeline cost (same lever as r3's dead-block-skip scaling)
    return _bench_large(
        scene, lights, cam,
        metric="boxfield 108k-tri 1280x720 depth-8 BVH path tracing",
        baseline_key="boxfield", width=width, height=height,
        max_depth=8, nee=False, spp_per_batch=64, n_batches=n_batches,
    )


def _bench_diningroom(n_batches: int = 5) -> dict:
    import dataclasses as dc

    from mcpt.render import camera as camera_mod
    from mcpt.scene import build_scene
    from mcpt.scenes import diningroom

    width, height = 1280, 720
    loaded, camcfg = diningroom()
    camcfg = dc.replace(camcfg, resolution=(width, height))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    # spp/batch sweep (r5): 8 -> 7.95, 16 -> 9.50, 32 -> 10.90 Mrays/s
    # (same pool-packing lever as boxfield; 32 spp ~= 2 GB pool)
    return _bench_large(
        scene, lights, cam,
        metric="diningroom 96k-tri 1280x720 depth-8 NEE+MIS path tracing",
        baseline_key="diningroom", width=width, height=height,
        max_depth=8, nee=True, spp_per_batch=32, n_batches=n_batches,
    )


class _RegimeTimeout(Exception):
    pass


def _summary(results: dict, skipped: dict, vpu_peak: float | None,
             extras: dict | None = None) -> dict:
    """A valid driver-recordable summary of whatever has completed so far."""
    vals = [results[k]["value"] for k in results]
    ratios = [results[k]["vs_baseline"] for k in results]
    n = max(len(vals), 1)
    geomean = math.exp(sum(math.log(max(v, 1e-9)) for v in vals) / n) \
        if vals else 0.0
    geo_ratio = math.exp(
        sum(math.log(max(v, 1e-9)) for v in ratios) / n
    ) if ratios else 0.0
    summary = {
        "metric": "all-regime throughput (geomean of "
                  f"{'/'.join(results) or 'none'} Mrays/s; "
                  f"{len(results)}/4 regimes completed)",
        "value": round(geomean, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(geo_ratio, 3),
    }
    if vpu_peak:
        summary["vpu_peak_tflops"] = round(vpu_peak / 1e12, 2)
    for k, r in results.items():
        summary[k] = r["value"]
        if vpu_peak and "_flops_per_seg" in r:
            mfu = r["value"] * 1e6 * r["_flops_per_seg"] / vpu_peak
            summary[f"mfu_{k}"] = round(mfu, 3)
    if extras:
        summary.update(extras)
    if skipped:
        summary["skipped"] = skipped
    return summary


def main() -> int:
    _enable_cache()

    state = {"results": {}, "skipped": {}, "vpu_peak": None, "done": False,
             "extras": {}}

    def flush(*_args):
        if not state["done"]:
            print(json.dumps(_summary(state["results"], state["skipped"],
                                      state["vpu_peak"], state["extras"])),
                  flush=True)

    def on_term(_sig, _frm):
        # the driver's `timeout` sends SIGTERM: land the partial summary as
        # the final stdout line, then die with the conventional exit code
        flush()
        state["done"] = True
        os._exit(124)

    atexit.register(flush)
    signal.signal(signal.SIGTERM, on_term)
    signal.signal(signal.SIGALRM,
                  lambda *_: (_ for _ in ()).throw(_RegimeTimeout()))

    # 720 s: a hybrid regime that misses the compile cache pays ~4-6 min of
    # remote compiles (r5 measured: boxfield ~360 s, diningroom ~260 s per
    # spp specialization) + ~2 min of timed batches; 480 s lost the regime
    budget = int(os.environ.get("MCPT_BENCH_REGIME_BUDGET", "720"))

    # attach phase: the tunnelled chip takes MINUTES to reclaim if another
    # process touched it recently (verify SKILL.md gotcha — this, not cold
    # compiles, is what ate the round-4 run: the first device op blocks
    # inside one long native call that even signal.alarm can't interrupt
    # until it returns).  Pay that wait HERE, on a trivial op with its own
    # generous budget, so every regime budget below measures work.
    # measured reclaims on this tunnel: ~660 s and >900 s (after a prior
    # process held the chip for ~15 min) — 1800 s costs nothing when the
    # chip is free, and an attach overrun is survivable anyway (the first
    # regime's own device op absorbs the residual wait under its budget)
    attach_budget = int(os.environ.get("MCPT_BENCH_ATTACH_BUDGET", "1800"))
    t_attach = time.time()
    try:
        import jax
        import jax.numpy as jnp

        signal.alarm(attach_budget)
        float(jnp.zeros((8, 128)).sum())
    except Exception as e:  # noqa: BLE001
        state["skipped"]["attach"] = f"{type(e).__name__}: {e}"[:120]
    finally:
        signal.alarm(0)
    state["extras"]["attach_s"] = round(time.time() - t_attach, 1)

    from mcpt.runtime import (load_cached_vpu_peak, measure_vpu_peak,
                              save_cached_vpu_peak)

    try:
        signal.alarm(budget)
        state["vpu_peak"] = measure_vpu_peak()
        save_cached_vpu_peak(state["vpu_peak"])
    except Exception as e:  # noqa: BLE001 - fall back to the cached constant
        cached = load_cached_vpu_peak()
        if cached:
            state["vpu_peak"] = cached
            state["extras"]["vpu_peak_cached"] = True
        else:
            state["skipped"]["vpu_peak"] = f"{type(e).__name__}: {e}"[:120]
    finally:
        signal.alarm(0)

    # cheapest cold compile first (PERF_NOTES cold-compile table): a timeout
    # mid-compile then costs the expensive regimes, never the cheap ones
    for name, fn in (
        ("veach_mis", _bench_veach),
        ("cbox", _bench_cbox),
        ("boxfield", _bench_boxfield),
        ("diningroom", _bench_diningroom),
    ):
        signal.alarm(budget)
        try:
            r = fn()
            state["results"][name] = r
            pub = {k: v for k, v in r.items() if not k.startswith("_")}
            print(json.dumps(pub), flush=True)
        except Exception as e:  # noqa: BLE001 - skip-and-record, keep going
            state["skipped"][name] = f"{type(e).__name__}: {e}"[:120]
        finally:
            signal.alarm(0)
        flush()  # the last line is ALWAYS a current, valid summary

    state["done"] = True  # atexit: don't print a duplicate
    print(json.dumps(_summary(state["results"], state["skipped"],
                              state["vpu_peak"], state["extras"])), flush=True)
    return 0 if state["results"] else 1


if __name__ == "__main__":
    sys.exit(main())
