"""Image IO round-trips + reading the course-provided ground-truth EXRs."""

import os

import numpy as np
import pytest

from mcpt.io import image as im


@pytest.fixture
def hdr_img():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 8, (33, 47, 3)).astype(np.float32)
    img[0, 0] = 0  # black pixel
    img[1, 1] = 1e-4  # tiny
    return img


def _assert_rgbe_close(back, img):
    # RGBE shares one 8-bit exponent across channels: error ≤ max_channel/128
    tol = img.max(axis=-1, keepdims=True) / 64.0 + 1e-6
    assert (np.abs(back - img) <= tol).all()


def test_hdr_roundtrip(tmp_path, hdr_img):
    p = str(tmp_path / "x.hdr")
    im.write_hdr(p, hdr_img, flip_vertical=False)
    back = im.read_hdr(p)
    assert back.shape == hdr_img.shape
    _assert_rgbe_close(back, hdr_img)


def test_hdr_flip(tmp_path, hdr_img):
    p = str(tmp_path / "x.hdr")
    im.write_hdr(p, hdr_img, flip_vertical=True)
    back = im.read_hdr(p)
    _assert_rgbe_close(back[::-1], hdr_img)


def test_exr_roundtrip(tmp_path, hdr_img):
    p = str(tmp_path / "x.exr")
    im.write_exr(p, hdr_img)
    back = im.read_exr_rgb(p)
    # half-float precision
    np.testing.assert_allclose(back, hdr_img, rtol=1e-3, atol=1e-3)


def test_exr_roundtrip_float32(tmp_path, hdr_img):
    p = str(tmp_path / "x32.exr")
    im.write_exr(p, hdr_img, half=False)
    back = im.read_exr_rgb(p)
    np.testing.assert_allclose(back, hdr_img, rtol=0, atol=0)


def test_png_write(tmp_path):
    p = str(tmp_path / "x.png")
    img = (np.arange(4 * 5 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    im.write_png(p, img)
    with open(p, "rb") as f:
        magic = f.read(8)
    assert magic == b"\x89PNG\r\n\x1a\n"


@pytest.mark.parametrize(
    "path,shape",
    [
        ("/root/reference/Scene/cbox/cbox.exr", (512, 512, 3)),
        ("/root/reference/Scene/veach_mis/mis.exr", (512, 768, 3)),
        ("/root/reference/Scene/diningroom/diningroom.exr", (720, 1280, 3)),
    ],
)
def test_read_ground_truth_exr(path, shape):
    """The 2048-spp Mitsuba ground truths (Scene/README.md:19) are the physics
    oracle for RMSE validation — the reader must handle their ZIP-half format."""
    if not os.path.exists(path):
        pytest.skip("reference scene not mounted")
    rgb = im.read_exr_rgb(path)
    assert rgb.shape == shape
    assert np.isfinite(rgb).all()
    assert 0.01 < rgb.mean() < 10.0


def test_tonemap():
    x = np.array([[[0.0, 0.5, 1.0]]], np.float32)
    out = im.tonemap_srgb(x)
    assert out[0, 0, 0] == 0
    assert out[0, 0, 2] == 255
    assert 175 < out[0, 0, 1] < 190  # 0.5^(1/2.2) ≈ 0.730
