"""Multi-device sharded rendering on the virtual 8-CPU mesh (SURVEY §4: test
multi-node without a cluster).  The sharded result must agree with single-device
rendering in expectation, and the furnace identity must hold exactly per shard."""

import jax
import numpy as np
import pytest

from mcpt import dist
from mcpt.render import camera as cm
from mcpt.render import integrator as integ
from mcpt.render.integrator import RenderOptions
from mcpt.scene import build_scene
from mcpt.scenes import furnace_sphere, quad_light_plane


@pytest.fixture(scope="module")
def furnace():
    loaded, camcfg = furnace_sphere(albedo=0.5, emission=1.0, subdiv=2)
    scene, lights = build_scene(loaded)
    return scene, lights, cm.make_camera(camcfg)


def test_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.parametrize("shape", [(1, 8), (8, 1), (2, 4), (4, 2)])
def test_mesh_shapes(shape):
    mesh = dist.make_mesh(samples=shape[0], pixels=shape[1])
    assert mesh.shape == {"samples": shape[0], "pixels": shape[1]}


def test_furnace_sharded_exact(furnace):
    """The zero-variance furnace scene must give the exact analytic answer
    through the full sharded path (psum over samples, pixel slicing)."""
    scene, lights, cam = furnace
    mesh = dist.make_mesh(samples=2, pixels=4)
    opts = RenderOptions(max_depth=8, method="bvh")
    w = h = 20  # 400 pixels: not divisible by 4 → exercises padding
    rad = dist.render_batch_sharded(
        scene, lights, cam, w, h, jax.random.key(0), opts, spp=4, mesh=mesh
    )
    img = np.asarray(rad).reshape(h, w, 3) / 4.0
    np.testing.assert_allclose(img[h // 2, w // 2], 0.5, atol=1e-5)
    np.testing.assert_allclose(img[1, 1], 1.0, atol=1e-5)


def test_sharded_matches_single_device():
    loaded, camcfg = quad_light_plane()
    scene, lights = build_scene(loaded)
    cam = cm.make_camera(camcfg)
    opts = RenderOptions(max_depth=3, method="brute", nee=True, mis=True)
    w = h = 24
    spp = 32
    mesh = dist.make_mesh(samples=4, pixels=2)
    fb_sh = dist.render_sharded(
        scene, lights, cam, w, h, opts, spp=spp, mesh=mesh, seed=0,
        spp_per_step=spp,
    )
    fb_1 = integ.render(
        scene, lights, cam, w, h, opts, spp=spp, seed=1, spp_per_step=spp
    )
    m_sh = np.asarray(fb_sh.mean).mean()
    m_1 = np.asarray(fb_1.mean).mean()
    assert float(fb_sh.count[0]) == spp
    assert abs(m_sh - m_1) < 0.05 * max(m_1, 1e-3)


def test_mega_sharded_furnace_exact(furnace):
    """The fused Pallas kernel under shard_map: furnace identity must survive
    sample-axis DP + psum (kernel runs in TPU-interpret mode on the CPU mesh),
    and the sharded render must be stream-exact against single-chip (same
    seed, global sample indices via ``sample_base``) AND invariant to the
    mesh shape — only f32 sum order may differ."""
    from mcpt.pallas import megakernel as mk

    scene, lights, cam = furnace
    mega = mk.build_megascene(scene, lights)
    res = 16

    rad, segs = dist.render_mega_sharded(
        mega, cam, res, res, spp=8, mesh=dist.make_mesh(samples=4, pixels=2),
        seed=0, max_depth=6, interpret=True,
    )
    img = np.asarray(rad).reshape(res, res, 3) / 8
    np.testing.assert_allclose(img[res // 2, res // 2], 0.5, atol=1e-5)
    np.testing.assert_allclose(img[0, 0], 1.0, atol=1e-5)
    assert float(segs) > 0.0

    # stream-exact vs single chip (same seed, same (sample, pixel) streams)
    rad_1, segs_1 = mk.render_mega(
        mega, cam, res, res, spp=8, seed=0, max_depth=6, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rad), np.asarray(rad_1),
                               rtol=1e-5, atol=1e-6)
    assert float(segs) == float(segs_1)

    # mesh-shape invariance: 8×1 (pure sample DP) ≡ 2×4
    rad_b, _ = dist.render_mega_sharded(
        mega, cam, res, res, spp=8, mesh=dist.make_mesh(samples=8, pixels=1),
        seed=0, max_depth=6, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(rad), np.asarray(rad_b),
                               rtol=1e-5, atol=1e-6)


def test_sharded_deterministic(furnace):
    scene, lights, cam = furnace
    mesh = dist.make_mesh(samples=2, pixels=4)
    opts = RenderOptions(max_depth=4, method="bvh")
    a = dist.render_batch_sharded(
        scene, lights, cam, 16, 16, jax.random.key(3), opts, spp=2, mesh=mesh
    )
    b = dist.render_batch_sharded(
        scene, lights, cam, 16, 16, jax.random.key(3), opts, spp=2, mesh=mesh
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_cluster_sharded_matches_single_device():
    """The fused cluster engine under the ('samples','pixels') mesh (pixel
    slices of the tile permutation + sample-axis psum; kernel runs in
    TPU-interpret mode on the CPU mesh) must be stream-exact against the
    single-chip cluster render — same seed, global sample indices — and
    invariant to the mesh shape."""
    import dataclasses

    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.scenes import boxfield

    loaded, camcfg = boxfield(60)
    w = h = 16
    camcfg = dataclasses.replace(camcfg, resolution=(w, h))
    scene, lights = build_scene(loaded)
    cam = cm.make_camera(camcfg)
    cms = cmk.build_cluster_megascene(scene, lights)

    mesh = dist.make_mesh(samples=2, pixels=4)
    rad_sh, segs_sh = dist.render_cluster_sharded(
        cms, cam, w, h, spp=2, mesh=mesh, seed=5, max_depth=2, nee=True,
        mis=True, interpret=True,
    )
    rad_sh = np.asarray(rad_sh)
    assert rad_sh.shape == (w * h, 3)
    assert np.isfinite(rad_sh).all() and rad_sh.sum() > 0.0

    # stream-exact vs single chip: same seed, batch schedule (the sharded
    # path's schedule), same (sample, pixel) RNG streams
    rad_1, segs_1 = cmk.render_cluster_mega(
        cms, cam, w, h, spp=2, seed=5, max_depth=2, nee=True, mis=True,
        interpret=True, schedule="batch",
    )
    np.testing.assert_allclose(rad_sh, np.asarray(rad_1), rtol=1e-5,
                               atol=1e-6)
    assert float(segs_sh) == float(segs_1)

    # mesh-shape invariance: pure sample DP ≡ mixed
    rad_b, _ = dist.render_cluster_sharded(
        cms, cam, w, h, spp=2, mesh=dist.make_mesh(samples=1, pixels=8),
        seed=5, max_depth=2, nee=True, mis=True, interpret=True,
    )
    np.testing.assert_allclose(rad_sh, np.asarray(rad_b), rtol=1e-5,
                               atol=1e-6)


@pytest.mark.slow
def test_hybrid_sharded_matches_single_device():
    """The production large-scene engine (hybrid fused-bounce) under the
    ('samples','pixels') mesh must reproduce the single-chip hybrid render
    exactly up to f32 sum order: the sharded path renders the SAME global
    (sample, pixel) RNG streams (``sample_base`` offsets, global rng ids),
    so per-pixel radiance matches to round-off, not just in expectation."""
    import dataclasses

    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.scenes import boxfield

    # sizes are deliberately tiny (8x8, spp 2, depth 2, subt=8 -> 1024-lane
    # pools): the CI host runs the 8-device mesh on ONE core, so every extra
    # block/bounce multiplies interpret-mode wall time
    loaded, camcfg = boxfield(60)
    w = h = 8
    camcfg = dataclasses.replace(camcfg, resolution=(w, h))
    scene, lights = build_scene(loaded)
    cam = cm.make_camera(camcfg)
    cms = cmk.build_cluster_megascene(scene, lights)

    mesh = dist.make_mesh(samples=2, pixels=4)
    rad_sh, segs_sh = dist.render_hybrid_sharded(
        cms, dist.replicate(cam, mesh), w, h, spp=2, mesh=mesh, seed=7,
        max_depth=2, nee=True, mis=True, interpret=True, subt=8,
    )
    rad_sh = np.asarray(rad_sh)
    assert rad_sh.shape == (w * h, 3)
    assert np.isfinite(rad_sh).all() and rad_sh.sum() > 0.0

    rad_1, segs_1 = cmk.render_hybrid(
        cms, cam, w, h, spp=2, seed=7, max_depth=2, nee=True, mis=True,
        interpret=True, subt=8,
    )
    np.testing.assert_allclose(rad_sh, np.asarray(rad_1), rtol=1e-5,
                               atol=1e-6)
    assert float(segs_sh) == float(segs_1)


def test_hybrid_sharded_with_compaction():
    """Sharded hybrid with per-shard pool compaction: still unbiased and
    finite (compaction schedules are shard-local; radiance tails ride to
    each shard's final reduce)."""
    import dataclasses

    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.scenes import boxfield

    loaded, camcfg = boxfield(60)
    w = h = 8
    camcfg = dataclasses.replace(camcfg, resolution=(w, h))
    scene, lights = build_scene(loaded)
    cam = cm.make_camera(camcfg)
    cms = cmk.build_cluster_megascene(scene, lights)

    mesh = dist.make_mesh(samples=2, pixels=4)
    rad_sh, segs_sh = dist.render_hybrid_sharded(
        cms, dist.replicate(cam, mesh), w, h, spp=2, mesh=mesh, seed=7,
        max_depth=3, nee=True, mis=True, interpret=True, subt=8,
        compact=(0.9, 0.75),
    )
    rad_sh = np.asarray(rad_sh)
    assert rad_sh.shape == (w * h, 3)
    assert np.isfinite(rad_sh).all() and rad_sh.sum() > 0.0
    assert np.isfinite(float(segs_sh))
