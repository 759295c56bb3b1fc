"""Group-batched engine (OCR2Engine): grouping by crop grid, parity with the
single-page pipeline."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.engine import OCR2Engine
from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

import reference_torch_vision as refv


def _tiny_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 2, "Free": 10, "OCR.": 11}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


@pytest.fixture(scope="module")
def pipe():
    cfg = dataclasses.replace(tiny_ocr2_config(), image_token_id=500)
    flat = refv.random_ocr2_flat(cfg, seed=41)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return OCR2Pipeline(params, cfg, _tiny_tokenizer(), kv_dtype="float32", act_dtype="float32")


def test_engine_groups_mixed_ratios(pipe):
    rng = np.random.default_rng(5)
    # Two aspect groups: wide (2x1 tiles) and square no-crop-sized.
    pages = [
        Image.fromarray(rng.integers(0, 256, (300, 500, 3), np.uint8)),
        Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8)),
        Image.fromarray(rng.integers(0, 256, (310, 490, 3), np.uint8)),
    ]
    singles = [pipe.generate_ocr(p, max_new_tokens=5, ngram_size=2) for p in pages]

    engine = OCR2Engine(pipe, batch_size=4)
    results = engine.run(pages, max_new_tokens=5, ngram_size=2)
    for i, (s, b) in enumerate(zip(singles, results)):
        assert b.token_ids == s.token_ids, i
        assert b.text == s.text


def test_engine_lookup_decode_matches_plain(pipe):
    """The group-batched engine with lookup_chunk set must produce the same
    page token ids as the plain greedy engine."""
    rng = np.random.default_rng(9)
    images = [
        Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
        for _ in range(3)
    ]
    plain = OCR2Engine(pipe, batch_size=2).run(
        images, max_new_tokens=12, no_crop=True, ngram_size=3
    )
    pipe.lookup_chunk = 4
    try:
        spec = OCR2Engine(pipe, batch_size=2).run(
            images, max_new_tokens=12, no_crop=True, ngram_size=3
        )
    finally:
        pipe.lookup_chunk = 0
    assert [r.token_ids for r in spec] == [r.token_ids for r in plain]


def test_device_resize_token_exact(pipe):
    """Pipeline + engine with --device-resize produce the same tokens as the
    host-PIL path (the device resize is bit-identical, so greedy output is
    byte-for-byte equal)."""
    rng = np.random.default_rng(13)
    pages = [
        Image.fromarray(rng.integers(0, 256, (300, 500, 3), np.uint8)),  # crops
        Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8)),  # no-crop
    ]
    host = [pipe.generate_ocr(p, max_new_tokens=5, ngram_size=2) for p in pages]
    pipe.device_resize = True
    try:
        dev = [pipe.generate_ocr(p, max_new_tokens=5, ngram_size=2) for p in pages]
        eng = OCR2Engine(pipe, batch_size=2).run(pages, max_new_tokens=5, ngram_size=2)
    finally:
        pipe.device_resize = None
    for h, d, e in zip(host, dev, eng):
        assert d.token_ids == h.token_ids
        assert e.token_ids == h.token_ids


def test_device_resize_auto_policy(pipe):
    """device_resize="auto" routes crop-mode pages to the device pixel path
    (jax.Array outputs) and no-crop pages to host PIL (np.ndarray) — the
    measured-optimal split (scripts/bench_serve_resize.py)."""
    rng = np.random.default_rng(17)
    crop_page = Image.fromarray(rng.integers(0, 256, (300, 500, 3), np.uint8))
    small_page = Image.fromarray(rng.integers(0, 256, (120, 160, 3), np.uint8))
    pipe.device_resize = "auto"
    try:
        base_c, tiles_c, ratio_c, _ = pipe.preprocess_image(crop_page)
        base_n, tiles_n, _, _ = pipe.preprocess_image(small_page)
    finally:
        pipe.device_resize = None
    assert ratio_c != (1, 1) and tiles_c is not None
    assert isinstance(base_c, jax.Array) and isinstance(tiles_c, jax.Array)
    assert isinstance(base_n, np.ndarray) and tiles_n is None
