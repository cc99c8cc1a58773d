"""Image I/O round-trips (reference: test/test-save-load-image.py) and
colormap behavior (mrcal_apply_color_map, mrcal.h:892-929)."""

import numpy as np
import pytest

from mrcal_tpu.image import load_image, save_image, apply_color_map


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.mark.parametrize("ext", ["png", "pgm"])
def test_roundtrip_uint8_gray(tmp_path, rng, ext):
    a = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    f = str(tmp_path / f"im.{ext}")
    save_image(f, a)
    b = load_image(f, channels=1)
    assert b.dtype == np.uint8
    assert np.array_equal(a, b)


@pytest.mark.parametrize("ext", ["png", "pgm"])
def test_roundtrip_uint16_gray(tmp_path, rng, ext):
    # the reference writes 16-bit via libpng / PNM (image.c:62-120)
    a = rng.integers(0, 65536, (11, 17), dtype=np.uint16)
    f = str(tmp_path / f"im16.{ext}")
    save_image(f, a)
    b = load_image(f, bits_per_pixel=16, channels=1)
    assert b.dtype == np.uint16
    assert np.array_equal(a, b)


@pytest.mark.parametrize("ext", ["png", "ppm"])
def test_roundtrip_bgr(tmp_path, rng, ext):
    a = rng.integers(0, 256, (11, 17, 3), dtype=np.uint8)
    f = str(tmp_path / f"im.{ext}")
    save_image(f, a)
    b = load_image(f)
    assert b.shape == a.shape
    assert np.array_equal(a, b)


def test_load_color_as_gray(tmp_path, rng):
    a = rng.integers(0, 256, (9, 9, 3), dtype=np.uint8)
    f = str(tmp_path / "c.png")
    save_image(f, a)
    g = load_image(f, channels=1)
    assert g.dtype == np.uint8 and g.shape == (9, 9)


def test_load_16_as_8(tmp_path, rng):
    a = rng.integers(0, 65536, (9, 9), dtype=np.uint16)
    f = str(tmp_path / "g16.png")
    save_image(f, a)
    g = load_image(f, bits_per_pixel=8, channels=1)
    assert g.dtype == np.uint8
    assert np.array_equal(g, (a >> 8).astype(np.uint8))


def test_jpg_write_read(tmp_path):
    # lossy: check shape/dtype and rough content only
    a = np.full((16, 16), 128, np.uint8)
    f = str(tmp_path / "im.jpg")
    save_image(f, a)
    b = load_image(f, channels=1)
    assert b.dtype == np.uint8 and b.shape == a.shape
    assert np.max(np.abs(b.astype(int) - 128)) < 8


def test_color_map():
    im = np.linspace(0.0, 1.0, 7)[None, :]
    out = apply_color_map(im, a_min=0.0, a_max=1.0)
    assert out.dtype == np.uint8 and out.shape == (1, 7, 3)
    # BGR: low values blue-dominant, high values red-dominant
    assert out[0, 0, 0] > out[0, 0, 2]
    assert out[0, -1, 2] > out[0, -1, 0]
    # green peaks mid-scale
    assert out[0, 3, 1] >= out[0, 0, 1] and out[0, 3, 1] >= out[0, -1, 1]
