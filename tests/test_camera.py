"""Camera basis + ray generation (``auxiliary.cpp:20-71``, ``rayGenerator.cl``)."""

import math

import jax
import numpy as np

from mcpt.config import CameraConfig
from mcpt.render import camera as cm


def _cfg(**kw):
    d = dict(
        position=(278, 273, -800), lookat=(278, 273, -799), up=(0, 1, 0),
        fov=39.3077, resolution=(64, 64),
    )
    d.update(kw)
    return CameraConfig(**d)


def test_basis_orthonormal():
    cam = cm.make_camera(_cfg())
    f, r, u = (np.asarray(x) for x in (cam.forward, cam.right, cam.up))
    for v in (f, r, u):
        assert abs(np.linalg.norm(v) - 1) < 1e-6
    assert abs(f @ r) < 1e-6 and abs(f @ u) < 1e-6 and abs(r @ u) < 1e-6
    # right-handed reference convention: right = forward × up_config
    np.testing.assert_allclose(r, np.cross(f, (0, 1, 0)) / np.linalg.norm(np.cross(f, (0, 1, 0))), atol=1e-6)


def test_center_ray_is_forward():
    cam = cm.make_camera(_cfg())
    pool = cm.generate_rays(cam, 63, 63, key=None, jitter=False)
    # center pixel of odd grid: exact corner sampling puts pixel (31.5,31.5)...
    # the reference samples corners, so pixel (31,31) has offset -0.5+31/63
    d = np.asarray(pool.direction).reshape(63, 63, 3)
    # reconstruct the expected center-adjacent direction
    center = d[31, 31]
    fwd = np.asarray(cam.forward)
    assert center @ fwd > 0.999  # within half a pixel of the axis


def test_fov_span():
    cam = cm.make_camera(_cfg(fov=60.0, resolution=(64, 64)))
    pool = cm.generate_rays(cam, 64, 64, key=None, jitter=False)
    d = np.asarray(pool.direction).reshape(64, 64, 3)
    up = np.asarray(cam.up)
    fwd = np.asarray(cam.forward)
    # bottom edge ray (py=0 → sy=-0.5): angle vs forward ≈ fov/2 in the up plane
    bottom = d[0, 32]
    proj = bottom - (bottom @ np.asarray(cam.right)) * np.asarray(cam.right)
    proj /= np.linalg.norm(proj)
    ang = math.degrees(math.acos(np.clip(proj @ fwd, -1, 1)))
    assert abs(ang - 30.0) < 1.0
    assert bottom @ up < 0  # row 0 looks downward: image bottom


def test_aspect_ratio():
    cam = cm.make_camera(_cfg(resolution=(128, 64)))
    assert float(cam.half_width) == pytest.approx(2 * float(cam.half_height), rel=1e-6)


import pytest  # noqa: E402


def test_pixel_ids():
    cam = cm.make_camera(_cfg())
    pool = cm.generate_rays(cam, 8, 4, key=None, jitter=False)
    assert pool.count == 32
    assert np.asarray(pool.pixel).tolist() == list(range(32))
    assert np.asarray(pool.alive).all()
    np.testing.assert_allclose(np.asarray(pool.throughput), 1.0)


def test_jitter_stays_in_pixel():
    cam = cm.make_camera(_cfg())
    p0 = cm.generate_rays(cam, 16, 16, key=jax.random.key(0), jitter=True)
    p1 = cm.generate_rays(cam, 16, 16, key=jax.random.key(1), jitter=True)
    d0 = np.asarray(p0.direction)
    d1 = np.asarray(p1.direction)
    assert not np.allclose(d0, d1)  # different jitter
    # directions differ at most by ~2 pixel footprints
    assert np.abs(d0 - d1).max() < 4 * (2 * float(cam.half_height) / 16)


def test_ortho_rays_parallel_and_span():
    """Orthographic camera (rayGenerator.cl:23-27): every ray shares the forward
    direction; origins sweep a view plane ortho_height tall (±arg/2 span)."""
    cam = cm.make_camera(_cfg(fov=0.0, ortho_height=4.0, resolution=(64, 64)))
    pool = cm.generate_rays(cam, 64, 64, key=None, jitter=False)
    d = np.asarray(pool.direction).reshape(64, 64, 3)
    fwd = np.asarray(cam.forward)
    np.testing.assert_allclose(d, np.broadcast_to(fwd, d.shape), atol=1e-6)
    o = np.asarray(pool.origin).reshape(64, 64, 3)
    up = np.asarray(cam.up)
    spans = (o - np.asarray(cam.position)) @ up
    # corner sampling: py=0 → sy=-0.5 (offset -2), py=63 → sy=63/64-0.5
    assert spans[0].mean() == pytest.approx(-2.0, abs=1e-5)
    assert spans[-1].mean() == pytest.approx(4.0 * (63 / 64 - 0.5), abs=1e-5)


def test_ortho_config_key_and_degenerate_fov_rejected():
    from mcpt.config import parse_config_text

    cfg = parse_config_text(
        '{"config": [{"camera": {"position": [0,0,5], "lookat": [0,0,0],'
        ' "up": [0,1,0], "ortho_height": 2.5, "resolution": [8, 8]}}]}'
    )
    cam = cm.make_camera(cfg.camera)
    assert float(cam.is_ortho) == 1.0
    assert float(cam.half_height) == pytest.approx(1.25)
    with pytest.raises(ValueError, match="fov"):
        cm.make_camera(_cfg(fov=0.0))
