"""Device-side resize is BIT-IDENTICAL to PIL's fixed-point resample.

PIL (what HF preprocessing uses) is the binding oracle for the pixel front
end (reference main.rs:462-481, 1258-1326); these tests compare raw uint8
bytes on random-noise images — the hardest case for any approximate
implementation (the native C++ path only passes on smooth images with a
+-6/255 tolerance; the device path must match exactly).
"""

import numpy as np
import pytest
from PIL import Image

from deepseek_ocr2_tpu.preprocess.device_resize import (
    _digits3,
    bucket_pad,
    device_letterbox_u8,
    device_preprocess_page,
    device_resize_u8,
    device_tiles_u8,
    pil_coeffs,
    ship_image,
)
from deepseek_ocr2_tpu.preprocess.image import (
    candidate_ratios,
    find_closest_aspect_ratio,
    pad_to_square,
    preprocess_base_u8,
    preprocess_tiles_u8,
)


def _noise(w: int, h: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3), np.uint8)


def _pil_resize(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    return np.asarray(Image.fromarray(arr).resize((out_w, out_h), Image.BICUBIC))


def test_digit_split_exact():
    rng = np.random.default_rng(1)
    kk = rng.integers(-6_000_000, 6_000_000, (40, 11), np.int64).astype(np.int32)
    d = _digits3(kk).astype(np.int64)
    np.testing.assert_array_equal(d[0] * 65536 + d[1] * 256 + d[2], kk)
    assert np.abs(d).max() <= 128


def test_coeff_taps_in_bounds():
    for in_size, out_size in [(333, 97), (50, 160), (64, 64), (640, 7), (3, 5)]:
        xmin, kk = pil_coeffs(in_size, out_size)
        k = kk.shape[-1]
        assert xmin.min() >= 0
        # Nonzero taps never read past the input.
        tap = np.arange(k)[None, :] + xmin[:, None]
        assert np.all(tap[kk != 0] < in_size)


@pytest.mark.parametrize(
    "in_w,in_h,out_w,out_h",
    [
        (333, 217, 97, 120),  # downscale both, odd sizes
        (50, 40, 160, 90),  # upscale both
        (64, 64, 64, 64),  # identity
        (640, 480, 7, 5),  # extreme downscale (big ksize)
        (3, 4, 5, 7),  # tiny input (xmin clipping both edges)
        (500, 100, 100, 300),  # mixed down/up
        (257, 129, 256, 128),  # near-identity off-by-one
    ],
)
def test_plain_resize_bit_exact(in_w, in_h, out_w, out_h):
    img = _noise(in_w, in_h, seed=in_w * in_h)
    want = _pil_resize(img, out_w, out_h).transpose(2, 0, 1)
    got = np.asarray(device_resize_u8(ship_image(img), in_w, in_h, out_w, out_h))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("w,h", [(550, 425), (210, 430), (256, 256), (90, 513)])
def test_letterbox_bit_exact(w, h):
    img = _noise(w, h, seed=w + h)
    want = np.asarray(pad_to_square(Image.fromarray(img), 256, 127)).transpose(2, 0, 1)
    got = np.asarray(device_letterbox_u8(ship_image(img), w, h, 256, 127))
    np.testing.assert_array_equal(got[0], want)


@pytest.mark.parametrize("ratio", [(2, 1), (1, 2), (3, 2), (2, 3)])
def test_tiles_bit_exact(ratio):
    w, h = 530, 410
    img = _noise(w, h, seed=ratio[0] * 10 + ratio[1])
    want = preprocess_tiles_u8(Image.fromarray(img), 96, ratio)
    got = np.asarray(device_tiles_u8(ship_image(img), w, h, 96, ratio))
    np.testing.assert_array_equal(got, want)


def test_bucket_pad_invariance():
    """Zero-padding the input to its shape bucket must not change the output."""
    img = _noise(300, 200, seed=7)
    assert bucket_pad(img).shape == (256, 512, 3)
    got = np.asarray(device_resize_u8(ship_image(img), 300, 200, 128, 96))
    want = _pil_resize(img, 128, 96).transpose(2, 0, 1)
    np.testing.assert_array_equal(got, want)


def test_full_page_matches_host_path():
    """device_preprocess_page == preprocess_base_u8/preprocess_tiles_u8."""
    w, h = 700, 330
    img = _noise(w, h, seed=42)
    pim = Image.fromarray(img)
    ratios = candidate_ratios(2, 6)
    ratio = find_closest_aspect_ratio(w / h, ratios, w, h, 128)
    base, tiles = device_preprocess_page(img, 256, 128, ratio, 127)
    np.testing.assert_array_equal(np.asarray(base), preprocess_base_u8(pim, 256, 127))
    np.testing.assert_array_equal(np.asarray(tiles), preprocess_tiles_u8(pim, 128, ratio))


def test_full_page_no_crop():
    img = _noise(180, 240, seed=3)
    base, tiles = device_preprocess_page(img, 256, 128, None, 127)
    assert tiles is None
    np.testing.assert_array_equal(
        np.asarray(base), preprocess_base_u8(Image.fromarray(img), 256, 127)
    )
