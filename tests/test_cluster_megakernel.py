"""Fused cluster megakernel vs the dense-table megakernel.

The two engines share ``megakernel._render_body`` (camera, RNG, materials,
NEE/MIS/RR, regeneration) and differ ONLY in the intersector closures —
dense triangle loops vs the block-coherent cluster-BVH walk — so on any
scene both fit, their radiance must agree *bit-for-bit* per pixel (same RNG
streams, same estimator, same Wald row data; the walk merely skips triangle
rows that cannot be hit).  This is the strongest cross-check available: a
traversal bug (missed cluster, wrong normal/material select, bad any-hit
pruning) breaks exact equality immediately.

Reference counterpart being validated: the fused per-frame loop of
``OpenCLApp.cpp:57-82`` with the traversal of ``objdef.h:240-275``.
"""

import dataclasses

import numpy as np
import pytest

from mcpt.pallas import cluster_megakernel as cmk
from mcpt.pallas import megakernel as mk
from mcpt.render import camera as camera_mod
from mcpt.scene import build_scene
from mcpt.scenes import boxfield


@pytest.fixture(scope="module")
def small_clustered():
    loaded, camcfg = boxfield(60)  # 724 tris → clusters are built
    camcfg = dataclasses.replace(camcfg, resolution=(32, 32))
    scene, lights = build_scene(loaded)
    cam = camera_mod.make_camera(camcfg)
    return (
        mk.build_megascene(scene, lights),
        cmk.build_cluster_megascene(scene, lights),
        cam,
    )


@pytest.mark.slow
def test_cluster_mega_matches_tri_mega_plain(small_clustered):
    mega, cms, cam = small_clustered
    r1, s1 = mk.render_mega(mega, cam, 32, 32, spp=1, seed=7, max_depth=3,
                            interpret=True, schedule="batch")
    r2, s2 = cmk.render_cluster_mega(cms, cam, 32, 32, spp=1, seed=7,
                                     max_depth=3, interpret=True,
                                     schedule="batch")
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    assert float(s1) == float(s2)


@pytest.mark.slow
def test_cluster_mega_matches_tri_mega_nee_regen(small_clustered):
    """Full estimator stack (NEE+MIS+RR) under path regeneration."""
    mega, cms, cam = small_clustered
    kw = dict(spp=2, seed=11, max_depth=3, nee=True, mis=True, rr=True,
              interpret=True, schedule="regen")
    r1, s1 = mk.render_mega(mega, cam, 32, 32, **kw)
    r2, s2 = cmk.render_cluster_mega(cms, cam, 32, 32, **kw)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    assert float(s1) == float(s2)


@pytest.mark.slow
def test_hybrid_compact_loose_caps_bit_equal(small_clustered):
    """Compaction with caps that never bind (p stays 1) is a pure pool
    shrink over all-dead sorted tails — the radiance must be BIT-equal to
    the uncompacted hybrid (same blocks, same RNG, same reduce set)."""
    mega, cms, cam = small_clustered
    kw = dict(spp=2, seed=7, max_depth=4, interpret=True)
    r1, s1 = cmk.render_hybrid(cms, cam, 32, 32, **kw)
    r2, s2 = cmk.render_hybrid(cms, cam, 32, 32,
                               compact=(1.0, 1.0, 1.0), **kw)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    assert float(s1) == float(s2)


@pytest.mark.slow
def test_hybrid_compact_tight_caps_unbiased(small_clustered):
    """Caps below the live count trigger Bernoulli roulette (1/p throughput
    scaling): the mean radiance must agree with the uncompacted render
    within Monte-Carlo tolerance, and the segment count must stay finite
    (the NaN canary only fires if a live ray is dropped)."""
    mega, cms, cam = small_clustered
    kw = dict(spp=4, seed=3, max_depth=4, interpret=True)
    r1, s1 = cmk.render_hybrid(cms, cam, 32, 32, **kw)
    # boxfield(60) at 32² is an open scene: most rays miss at depth 1, so a
    # 0.25 cap genuinely subselects the survivors
    r2, s2 = cmk.render_hybrid(cms, cam, 32, 32,
                               compact=(0.25, 0.25, 0.25), **kw)
    assert np.isfinite(float(s2))
    m1 = float(np.mean(np.asarray(r1)))
    m2 = float(np.mean(np.asarray(r2)))
    assert abs(m2 - m1) / max(m1, 1e-9) < 0.15
    # fewer pool rows traced → compacted render must not trace MORE segments
    assert float(s2) <= float(s1)


@pytest.mark.slow
def test_hybrid_matches_cluster_mega_batch(small_clustered):
    """The hybrid fused-bounce pipeline (one kernel per bounce + XLA
    coherence re-sort) must reproduce the batch-schedule cluster megakernel
    bit-for-bit: the camera rays use the same counter-hash streams (replayed
    at the XLA level), RNG ids ride the sorts, and the bounce core is the
    same ``_make_bounce_core`` closure."""
    mega, cms, cam = small_clustered
    kw = dict(spp=2, seed=7, max_depth=3, nee=True, mis=True, rr=True,
              interpret=True)
    r1, s1 = cmk.render_cluster_mega(cms, cam, 32, 32, schedule="batch", **kw)
    r2, s2 = cmk.render_hybrid(cms, cam, 32, 32, **kw)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    assert float(s1) == float(s2)


@pytest.mark.slow
def test_mosaic_interpreter_matches_classic(small_clustered):
    """CPU hosts default to the classic (traced/XLA) Pallas interpreter;
    the Mosaic TPU interpreter stays reachable via ``interpret="mosaic"``
    (see ``mcpt/pallas/_interp.py`` for why).  The two must agree
    bit-for-bit on the fused engine — this is the faithfulness check that
    licenses the fast default.  Single-device and tiny on purpose: the
    Mosaic interpreter's cross-device barrier deadlocks under shard_map
    with ≥128 KiB operands (jax 0.9.0), so only the classic flavor runs in
    the sharded tests."""
    mega, cms, cam = small_clustered
    kw = dict(spp=1, seed=5, max_depth=2, nee=True, mis=True)
    r1, s1 = cmk.render_hybrid(cms, cam, 16, 16, interpret=True, **kw)
    r2, s2 = cmk.render_hybrid(cms, cam, 16, 16, interpret="mosaic", **kw)
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r1))
    assert float(s1) == float(s2)


@pytest.mark.slow
def test_profile_hybrid_matches_render_hybrid(small_clustered):
    """The stage-instrumented profiler twin (tools/render.py --profile) must
    compute the same estimator as the production scan pipeline — same stage
    math, same streams; only f32 reassociation across the stage-level jit
    boundaries is allowed."""
    _, cms, cam = small_clustered
    kw = dict(spp=2, seed=3, max_depth=3, nee=True, mis=True,
              interpret=True, subt=8, compact=(0.9, 0.6))
    r1, s1 = cmk.render_hybrid(cms, cam, 16, 16, **kw)
    timer, r2, s2 = cmk.profile_hybrid(cms, cam, 16, 16, **kw)
    np.testing.assert_allclose(np.asarray(r2), np.asarray(r1), rtol=1e-5,
                               atol=1e-6)
    assert float(s1) == float(s2)
    rep = timer.report()
    assert "bounce[d0]" in rep and "raygen" in rep and "final-reduce" in rep
