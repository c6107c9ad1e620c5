"""Distributed rendering over a TPU device mesh.

The reference is strictly single-process/single-GPU (one in-order
``cl::CommandQueue``, ``oclbasic.cpp:14,117``) — this module is the *new*
first-class component SURVEY §2.3 calls for: a ``jax.sharding.Mesh`` with two
named axes,

- ``"samples"`` — data-parallel over the sample (spp) axis: every shard renders
  the full image at ``spp / |samples|``, radiance sums are ``psum``-reduced over
  ICI (the renderer's DP axis);
- ``"pixels"``  — spatial sharding of the framebuffer: each shard owns a
  contiguous pixel slice and only ever touches its slice (the renderer's SP/TP
  axis; no collective needed until host gather).

Scene, BVH, materials and camera are replicated (they are small: ≤ a few hundred
MB even for san-miguel-class scenes), the ray pool and framebuffer are sharded.
The per-device program is the same wavefront ``trace`` used single-chip — the
whole render step is ``shard_map``-ped and jit-compiled once.

Determinism contract (uniform across the three kernel engines — mega,
cluster-mega, hybrid): every shard renders with the SAME seed and a
``sample_base`` equal to its global sample offset, so each (sample, pixel)
RNG stream is identical to the single-chip schedule and the rendered image
is **bit-exact for any mesh shape** (1×1 ≡ 2×4 ≡ 8×1 — tested in
``tests/test_dist.py``).  The wavefront engine (``render_batch_sharded``)
is the one exception: its RNG is ``jax.random`` keyed per (sample-shard,
pixel-shard) and positional within the pool, so its sharded output is a
*different but unbiased* estimate that is deterministic in (seed, mesh
shape) — making it stream-exact would mean rewriting the wavefront's
entire key-based RNG as counter hashes, which is what the kernel engines
already are; the wavefront stays the diagnostic/fallback path.
"""

from __future__ import annotations

import functools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mcpt.render import camera as camera_mod
from mcpt.render import integrator as integ
from mcpt.scene import Lights, Scene
from mcpt.types import Camera, Framebuffer


def make_mesh(samples: int = 1, pixels: int | None = None,
              devices: Sequence[jax.Device] | None = None) -> Mesh:
    """Build a ("samples", "pixels") mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if pixels is None:
        assert n % samples == 0, (n, samples)
        pixels = n // samples
    assert samples * pixels == n, (samples, pixels, n)
    arr = np.asarray(devices).reshape(samples, pixels)
    return Mesh(arr, axis_names=("samples", "pixels"))


def _pad_to(n: int, mult: int) -> int:
    return ((n + mult - 1) // mult) * mult


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "opts", "spp", "mesh", "with_stats"),
)
def render_batch_sharded(
    scene: Scene,
    lights: Lights,
    cam: Camera,
    width: int,
    height: int,
    key: jax.Array,
    opts: integ.RenderOptions,
    spp: int,
    mesh: Mesh,
    with_stats: bool = False,
):
    """One sharded render step → (W·H, 3) radiance *sum* over ``spp`` samples,
    laid out sharded over the ``pixels`` axis (replicated over ``samples``);
    with ``with_stats=True`` also the total live-segment count (``psum`` over
    both axes — the honest Mrays/s numerator).

    ``spp`` must divide by the samples-axis size; the pixel count is padded up to
    the pixels-axis size internally (static shapes — SURVEY §7 "dynamic-shape
    allergy").  RNG: ``jax.random`` keys folded per (sample-shard,
    pixel-shard) — deterministic in (seed, mesh shape) but NOT stream-exact
    against single-chip; see the module docstring for why the wavefront is
    the one engine outside the uniform contract.
    """
    d_s = mesh.shape["samples"]
    d_p = mesh.shape["pixels"]
    assert spp % d_s == 0, f"spp {spp} not divisible by samples axis {d_s}"
    spp_local = spp // d_s
    n = width * height
    n_pad = _pad_to(n, d_p)
    local_n = n_pad // d_p

    def step(scene, lights, cam, key):
        si = jax.lax.axis_index("samples")
        pi = jax.lax.axis_index("pixels")
        k_dev = jax.random.fold_in(jax.random.fold_in(key, si), pi)

        pix = pi * local_n + jnp.arange(local_n, dtype=jnp.int32)
        pix = jnp.minimum(pix, n - 1)  # padded tail re-renders the last pixel

        k_all = jax.random.split(k_dev, spp_local)
        k_cams, k_paths = jax.vmap(lambda k: tuple(jax.random.split(k)))(k_all)
        pools = jax.vmap(
            lambda k: camera_mod.generate_rays_for_pixels(
                cam, width, height, pix, key=k, jitter=opts.jitter
            )
        )(k_cams)
        flat = jax.tree.map(
            lambda x: x.reshape((spp_local * local_n,) + x.shape[2:]), pools
        )
        flat, segs = integ.trace(scene, lights, flat, k_dev, opts,
                                 with_stats=True)
        local_sum = flat.radiance.reshape(spp_local, local_n, 3).sum(axis=0)
        # DP reduction: radiance sums ride ICI over the samples axis
        return (jax.lax.psum(local_sum, axis_name="samples"),
                jax.lax.psum(segs, axis_name=("samples", "pixels")))

    out, segs = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=(P("pixels"), P()),
        # the wavefront loops build carries from constants; skip the
        # varying-manual-axes bookkeeping (correctness is covered by tests)
        check_vma=False,
    )(scene, lights, cam, key)
    if with_stats:
        return out[:n], segs
    return out[:n]


def render_sharded(
    scene: Scene,
    lights: Lights,
    cam: Camera,
    width: int,
    height: int,
    opts: integ.RenderOptions,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    fb: Framebuffer | None = None,
    spp_per_step: int | None = None,
    progress=None,
) -> Framebuffer:
    """Progressive sharded accumulation (multi-chip analogue of
    ``integ.render``)."""
    from mcpt.types import make_framebuffer

    d_s = mesh.shape["samples"]
    if spp_per_step is None:
        spp_per_step = d_s
    assert spp_per_step % d_s == 0
    # each sharded step renders a multiple of the samples-axis size; round the
    # request up ONCE so fb.count always equals the spp actually rendered
    spp = _pad_to(spp, d_s)
    if fb is None:
        fb = make_framebuffer(width * height)
    base = jax.random.key(seed)
    start = int(fb.count.max()) if fb.count.size else 0
    s = start
    while s < start + spp:
        step = min(spp_per_step, start + spp - s)
        step = (step // d_s) * d_s
        radiance = render_batch_sharded(
            scene, lights, cam, width, height, jax.random.fold_in(base, s),
            opts, step, mesh,
        )
        fb = integ.accumulate(fb, radiance, spp=step)
        s += step
        if progress is not None:
            progress(s, fb)
    return fb


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over the mesh (scene/BVH/materials/camera)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def render_mega_sharded(
    mega,
    cam: Camera,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_depth: int = 16,
    nee: bool = False,
    mis: bool = False,
    rr: bool = False,
    clamp: float = 0.0,
    interpret: bool = False,
):
    """Sharded megakernel render over BOTH mesh axes: each ``pixels`` shard
    renders only its contiguous pixel slice (true spatial sharding — the
    kernel's ``pixel_base`` hook), each ``samples`` shard renders global
    sample indices ``[si·spp/|samples|, (si+1)·spp/|samples|)`` via the
    kernel's ``sample_base`` hook with the SAME seed — every (sample, pixel)
    RNG stream matches the single-chip schedule exactly, so the output is
    bit-identical for any mesh shape.  The only collectives are the radiance
    ``psum`` over samples and the segment-count ``psum`` over both axes
    (scene tables are VMEM-resident per chip, so replication is free).

    Returns ``((W·H, 3) radiance sum over all spp, total segments traced)``;
    radiance is laid out sharded over the ``pixels`` axis.
    """
    from mcpt.pallas import megakernel as mk

    d_s = mesh.shape["samples"]
    d_p = mesh.shape["pixels"]
    assert spp % d_s == 0, (spp, d_s)
    spp_local = spp // d_s
    n = width * height
    n_pad = _pad_to(n, d_p)
    local_n = n_pad // d_p

    def step(tri, matt, lit, cbox, cam_):
        mega_local = mega._replace(tri=tri, matt=matt, lit=lit, cbox=cbox)
        si = jax.lax.axis_index("samples")
        pi = jax.lax.axis_index("pixels")
        rad, segs = mk.render_mega(
            mega_local, cam_, width, height, spp=spp_local, seed=seed,
            max_depth=max_depth, nee=nee, mis=mis, rr=rr, clamp=clamp,
            interpret=interpret,
            pixel_base=pi * local_n, pixel_count=local_n,
            sample_base=si * spp_local,
        )
        # DP reduction over samples; pixels need no collective (disjoint)
        return (jax.lax.psum(rad, axis_name="samples"),
                jax.lax.psum(segs, axis_name=("samples", "pixels")))

    out, segs = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P()),
            out_specs=(P("pixels"), P()),
            check_vma=False,
        )
    )(mega.tri, mega.matt, mega.lit, mega.cbox, cam)
    return out[:n], segs


def render_cluster_sharded(
    cms,
    cam: Camera,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_depth: int = 8,
    nee: bool = False,
    mis: bool = False,
    rr: bool = False,
    interpret: bool = False,
    subt: int | None = None,
):
    """Sharded *fused cluster* engine (``mcpt.pallas.cluster_megakernel``)
    over BOTH mesh axes: the tile-order pixel permutation is sliced over the
    ``pixels`` axis (each shard's kernel lanes cover only its slice — square
    screen tiles, so shards keep the traversal-block coherence), the sample
    axis is DP via the kernel's ``sample_base`` hook with the SAME seed
    (stream-exact against single-chip, bit-identical for any mesh shape),
    and the radiance/segment ``psum``s are the only collectives.  Returns
    ``((W·H, 3) radiance sum, total segments traced)``, radiance sharded
    over ``pixels``.
    """
    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.pallas.traverse_kernel import SUBT

    if subt is None:
        subt = SUBT
    d_s = mesh.shape["samples"]
    d_p = mesh.shape["pixels"]
    assert spp % d_s == 0, (spp, d_s)
    spp_local = spp // d_s
    n = width * height
    perm, inv_perm = camera_mod.tile_order(width, height, block=subt * 128)
    n_pad = _pad_to(n, d_p)
    # pad the permutation (duplicate edge pixels) so every shard's slice is
    # equal-sized; duplicates render twice, and the inv_perm gather below
    # picks one copy (radiance there double-counts nothing: each pixel id is
    # read from one slot)
    perm_pad = np.pad(perm, (0, n_pad - n), mode="edge")
    local_n = n_pad // d_p

    def step(wnodes, tri16, matt, lit, cam_, pix_local):
        si = jax.lax.axis_index("samples")
        cms_local = cms._replace(wnodes=wnodes, tri16=tri16, matt=matt,
                                 lit=lit)
        rad, segs = cmk._render_cluster_jit(
            cms_local.wnodes, cms_local.tri16, cms_local.matt,
            cms_local.lit, pix_local, cam_, width, height, spp_local,
            seed, max_depth, rr, 3, nee and cms.n_lights > 0, mis, 0.0,
            1e-4, interpret, cms.n_clusters, cms.leaf_size, cms.n_mats,
            cms.n_lights, cms.eps, cms.total_light_area, False, subt,
            sample_base=si * spp_local,
        )
        return (jax.lax.psum(rad, axis_name="samples"),
                jax.lax.psum(segs, axis_name=("samples", "pixels")))

    out, segs = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P("pixels")),
            out_specs=(P("pixels"), P()),
            check_vma=False,
        )
    )(cms.wnodes, cms.tri16, cms.matt, cms.lit, cam, jnp.asarray(perm_pad))
    # out rows follow the (padded) tile permutation; rows ≥ n are the padding
    # duplicates — inv_perm indexes each pixel's unique row in the first n
    return out[jnp.asarray(inv_perm)], segs


def render_hybrid_sharded(
    cms,
    cam: Camera,
    width: int,
    height: int,
    spp: int,
    mesh: Mesh,
    seed: int = 0,
    max_depth: int = 8,
    nee: bool = False,
    mis: bool = False,
    rr: bool = False,
    interpret: bool = False,
    subt: int | None = None,
    coarse_bits: int = 6,
    resort_every: int = 1,
    compact: tuple | None = None,
    key_mode: str = "auto",
):
    """Sharded *hybrid fused-bounce* engine — the production large-scene path
    (``cluster_megakernel.render_hybrid``) over the ("samples", "pixels")
    mesh.  BASELINE.md's diningroom target row ("progressive 4 spp/step
    sharded over v5p-8 mesh") lands here; the reference counterpart being
    exceeded is one in-order queue (``oclbasic.cpp:14,117``).

    Sharding layout:

    - ``pixels`` axis: each shard owns a contiguous slice of the square-tile
      pixel permutation (shards keep traversal-block coherence), and runs the
      full bounce pipeline — fused bounce kernel, inter-bounce coherence
      re-sort, pool compaction — entirely shard-locally.
    - ``samples`` axis: shard ``si`` renders global sample indices
      ``[si·spp/|samples|, (si+1)·spp/|samples|)`` via the engine's
      ``sample_base`` hook, with the SAME seed — so every (sample, pixel) RNG
      stream matches the single-chip schedule exactly, and the radiance
      ``psum`` over samples is the only collective in the program.

    Returns ``((W·H, 3) radiance sum over all spp, total segments traced)``;
    radiance rows are in pixel order (sharded over ``pixels``).
    """
    from mcpt.pallas import cluster_megakernel as cmk
    from mcpt.pallas.traverse_kernel import SUBT

    if subt is None:
        subt = SUBT
    key_mode = cmk.resolve_key_mode(key_mode, compact)
    d_s = mesh.shape["samples"]
    d_p = mesh.shape["pixels"]
    assert spp % d_s == 0, (spp, d_s)
    spp_local = spp // d_s
    n = width * height
    perm, _ = camera_mod.tile_order(width, height, block=subt * 128)
    n_pad = _pad_to(n, d_p)
    perm_pad = np.pad(perm, (0, n_pad - n), mode="edge")
    local_n = n_pad // d_p
    # the hybrid returns each shard's slice in ascending-pixel-id order (its
    # final reduce sorts by global (sample, pixel) rng id) — build the global
    # row→pixel map and its first-occurrence inverse (edge-padding duplicates
    # render identical streams, so either copy is valid)
    order = np.concatenate([
        np.sort(perm_pad[i * local_n:(i + 1) * local_n])
        for i in range(d_p)
    ])
    inv = np.zeros(n, np.int64)
    inv[order[::-1]] = np.arange(order.shape[0])[::-1]

    def step(wnodes, tri16, matt, lit, cam_, pix_local):
        si = jax.lax.axis_index("samples")
        cms_local = cms._replace(wnodes=wnodes, tri16=tri16, matt=matt,
                                 lit=lit)
        rad, segs = cmk._render_hybrid_jit(
            cms_local.wnodes, cms_local.tri16, cms_local.matt, cms_local.lit,
            pix_local, cam_, width, height, spp_local, seed, max_depth, rr,
            3, nee and cms.n_lights > 0, mis, 0.0, 1e-4, interpret,
            cms.n_clusters, cms.leaf_size, cms.n_mats, cms.n_lights, cms.eps,
            cms.total_light_area, cms.bb_lo, cms.bb_inv_ext, subt,
            coarse_bits, resort_every, compact,
            sample_base=si * spp_local, key_mode=key_mode,
        )
        return (jax.lax.psum(rad, axis_name="samples"),
                jax.lax.psum(segs, axis_name=("samples", "pixels")))

    out, segs = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(), P(), P(), P(), P(), P("pixels")),
            out_specs=(P("pixels"), P()),
            check_vma=False,
        )
    )(cms.wnodes, cms.tri16, cms.matt, cms.lit, cam, jnp.asarray(perm_pad))
    return out[jnp.asarray(inv)], segs
