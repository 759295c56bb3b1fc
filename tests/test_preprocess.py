"""Host preprocessing parity with the reference semantics (main.rs:331-481,
1228-1326) and tokenizer expansion (main.rs:1173-1226)."""

import numpy as np
import pytest
from PIL import Image

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.preprocess import (
    auto_rotate_choice,
    dynamic_preprocess,
    find_closest_aspect_ratio,
    images_to_nchw,
    pad_to_square,
    rotate_image,
    should_crop,
)
from deepseek_ocr2_tpu.preprocess.image import candidate_ratios


def _reference_ratios(min_num, max_num):
    """Direct port of the reference enumeration (main.rs:1267-1281)."""
    ratios = []
    for n in range(min_num, max_num + 1):
        for i in range(1, n + 1):
            for j in range(1, n + 1):
                if min_num <= i * j <= max_num:
                    ratios.append((i, j))
    ratios.sort(key=lambda r: r[0] * r[1])
    out = []
    for r in ratios:
        if r not in out:
            out.append(r)
    return out


def test_candidate_ratios_match_reference():
    assert set(candidate_ratios(2, 6)) == set(_reference_ratios(2, 6))
    assert set(candidate_ratios(1, 4)) == set(_reference_ratios(1, 4))


def test_find_closest_aspect_ratio():
    ratios = candidate_ratios(2, 6)
    # A 2:1 landscape page should pick a 2x1-ish grid.
    rw, rh = find_closest_aspect_ratio(2.0, ratios, 2000, 1000, 768)
    assert rw / rh == pytest.approx(2.0)
    # Tall page -> tall grid.
    rw, rh = find_closest_aspect_ratio(0.5, ratios, 1000, 2000, 768)
    assert rw / rh == pytest.approx(0.5)


def test_dynamic_preprocess_tiles():
    img = Image.new("RGB", (1600, 800), (200, 10, 10))
    crops, ratio = dynamic_preprocess(img, 2, 6, 768)
    assert len(crops) == ratio[0] * ratio[1]
    assert all(c.size == (768, 768) for c in crops)
    tw, th = ratio
    assert tw / th == pytest.approx(2.0)


def test_pad_to_square():
    img = Image.new("RGB", (200, 100), (255, 0, 0))
    out = pad_to_square(img, 64, 127)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    # top band is pad color; center row is image content
    assert tuple(arr[0, 0]) == (127, 127, 127)
    assert arr[32, 32, 0] > 200  # red content centered


def test_rotate_is_clockwise():
    # 2x1 image: left red, right green. 90° CW puts red at the top.
    img = Image.new("RGB", (2, 1))
    img.putpixel((0, 0), (255, 0, 0))
    img.putpixel((1, 0), (0, 255, 0))
    r = rotate_image(img, 90)
    assert r.size == (1, 2)
    assert r.getpixel((0, 0)) == (255, 0, 0)
    assert r.getpixel((0, 1)) == (0, 255, 0)


def test_images_to_nchw_normalization():
    img = Image.new("RGB", (4, 4), (255, 0, 127))
    arr = images_to_nchw([img])
    assert arr.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(arr[0, 0], 1.0)
    np.testing.assert_allclose(arr[0, 1], -1.0)
    np.testing.assert_allclose(arr[0, 2], 127 / 255 * 2 - 1, rtol=1e-6)


def test_should_crop():
    small = Image.new("RGB", (500, 500))
    large = Image.new("RGB", (1200, 900))
    assert not should_crop(small, True, 768)
    assert should_crop(large, True, 768)
    assert not should_crop(large, False, 768)


def _stripes(w, h, vertical, period=8):
    arr = np.zeros((h, w, 3), np.uint8)
    if vertical:
        for x in range(0, w, period):
            arr[:, x : x + period // 2] = 255
    else:
        for y in range(0, h, period):
            arr[y : y + period // 2] = 255
    return Image.fromarray(arr)


def test_auto_rotate_heuristic():
    # Horizontal stripes (like text lines): strong dy -> keep as-is.
    assert auto_rotate_choice(_stripes(400, 300, vertical=False)) == 0
    # Vertical stripes (sideways text): strong dx -> rotate 90 or 270.
    assert auto_rotate_choice(_stripes(300, 400, vertical=True)) in (90, 270)


def test_image_token_count():
    cfg = OCR2Config()
    # 1024 base -> 256 + 1 separator (main.rs:1206-1218)
    assert cfg.image_token_count((1, 1)) == 257
    # 2x1 crop grid at 768 adds 144*2
    assert cfg.image_token_count((2, 1)) == 257 + 288
    assert cfg.image_token_count((3, 2)) == 257 + 144 * 6


def test_tokenize_with_image_counts():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 0, "Free": 10, "OCR.": 11, "\n": 12, "hello": 13}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()

    from deepseek_ocr2_tpu.utils.tokenizer import tokenize_with_image

    cfg = OCR2Config()
    ids, mask, start = tokenize_with_image(tok, "<image>\nFree OCR.", cfg, (2, 1))
    n_img = cfg.image_token_count((2, 1))
    assert ids[0] == cfg.bos_token_id
    assert start == 1
    assert ids[start : start + n_img] == [cfg.image_token_id] * n_img
    assert mask[start : start + n_img] == [True] * n_img
    assert sum(mask) == n_img
    # text after the image block survived
    assert len(ids) > start + n_img


def test_u8_device_normalize_bit_exact():
    """Shipping raw uint8 + device normalize must be BIT-identical to the
    host f32 normalize (images_to_nchw): same f32 op sequence, IEEE-exact
    under XLA. This pins the u8-transfer admission fast path."""
    import jax.numpy as jnp

    from deepseek_ocr2_tpu.models.deepseek_ocr2 import normalize_pixels
    from deepseek_ocr2_tpu.preprocess import images_to_u8_nchw

    rng = np.random.default_rng(3)
    img = Image.fromarray(rng.integers(0, 256, (17, 23, 3), np.uint8))
    host = images_to_nchw([img])
    u8 = images_to_u8_nchw([img])
    assert u8.dtype == np.uint8 and u8.shape == host.shape
    dev = np.asarray(normalize_pixels(jnp.asarray(u8), jnp.float32))
    assert dev.dtype == np.float32
    np.testing.assert_array_equal(dev, host)
    # Float inputs pass through the same entry unchanged (native-path compat).
    back = np.asarray(normalize_pixels(jnp.asarray(host), jnp.float32))
    np.testing.assert_array_equal(back, host)
