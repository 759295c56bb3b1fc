"""Native C++ preprocessing: build, parity with the PIL/numpy reference path."""

import numpy as np
import pytest
from PIL import Image

from deepseek_ocr2_tpu.preprocess import native
from deepseek_ocr2_tpu.preprocess.image import (
    _dark_top_minus_bottom,
    _edge_ratio_dx_dy,
    _gray_u8,
    images_to_nchw,
    pad_to_square,
    preprocess_base_nchw,
    preprocess_tiles_nchw,
)

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(0)
    # Smooth-ish synthetic image (real pages are smooth; avoids bicubic
    # overshoot disagreement on pure noise).
    base = rng.integers(0, 256, (30, 50, 3), np.uint8)
    return np.asarray(Image.fromarray(base).resize((500, 300), Image.BILINEAR))


def test_rotate_gray_heuristics_exact(img):
    for deg, tr in ((90, Image.ROTATE_270), (180, Image.ROTATE_180), (270, Image.ROTATE_90)):
        want = np.asarray(Image.fromarray(img).transpose(tr))
        np.testing.assert_array_equal(native.rotate_cw(img, deg), want)
    g = native.gray(img)
    np.testing.assert_array_equal(g, _gray_u8(img))
    assert native.edge_ratio_dx_dy(g) == pytest.approx(_edge_ratio_dx_dy(g))
    assert native.dark_top_minus_bottom(g) == pytest.approx(_dark_top_minus_bottom(g))


def test_pad_normalize_close_to_pil(img):
    pil = images_to_nchw([pad_to_square(Image.fromarray(img), 256, 127)])[0]
    nat = native.pad_normalize(img, 256, 127)
    # PIL uses fixed-point coefficients; allow a few 8-bit steps.
    assert np.abs(pil - nat).max() < 6 / 255 * 2


def test_tile_normalize_shape_and_range(img):
    out = native.tile_normalize(img, 192, 2, 1)
    assert out.shape == (2, 3, 192, 192)
    assert out.min() >= -1.0 and out.max() <= 1.0


def test_fused_entry_points_fallback(img, monkeypatch):
    """Fused wrappers give same shapes with and without the native path."""
    pim = Image.fromarray(img)
    a = preprocess_base_nchw(pim, 256, 127)
    monkeypatch.setenv("DEEPSEEK_NATIVE_PREPROCESS", "1")
    b = preprocess_base_nchw(pim, 256, 127)
    assert a.shape == b.shape == (1, 3, 256, 256)
    assert np.abs(a - b).max() < 6 / 255 * 2

    t1 = preprocess_tiles_nchw(pim, 192, (2, 1))
    monkeypatch.delenv("DEEPSEEK_NATIVE_PREPROCESS")
    t0 = preprocess_tiles_nchw(pim, 192, (2, 1))
    assert t0.shape == t1.shape == (2, 3, 192, 192)
    assert np.abs(t0 - t1).max() < 6 / 255 * 2
