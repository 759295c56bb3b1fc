"""Multi-image / non-contiguous placeholder injection.

Parity oracle: torch `masked_scatter` — the exact op the HF/reference
fallback uses for placeholder masks that are not one contiguous block
(reference deepseek_ocr2.rs:273-297).
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.utils.tokenizer import tokenize_with_image, tokenize_with_images


class _WordTok:
    """4-word whitespace tokenizer stand-in."""

    _vocab = {"Free": 10, "OCR.": 11, "hello": 13, "and": 14}

    def encode(self, text, add_special_tokens=False):
        class Enc:
            pass

        e = Enc()
        e.ids = [self._vocab.get(w, 2) for w in text.split()]
        return e


def _cfg():
    return dataclasses.replace(tiny_ocr2_config(), image_token_id=500)


def test_tokenize_with_images_two_blocks():
    cfg = _cfg()
    ids, mask, starts = tokenize_with_images(
        _WordTok(), "hello <image> and <image> Free OCR.", cfg, [(1, 1), (2, 1)]
    )
    n0 = cfg.image_token_count((1, 1))
    n1 = cfg.image_token_count((2, 1))
    assert len(starts) == 2
    s0, s1 = starts
    assert ids[s0 : s0 + n0] == [cfg.image_token_id] * n0
    assert ids[s1 : s1 + n1] == [cfg.image_token_id] * n1
    assert mask[s0 : s0 + n0] == [True] * n0
    assert sum(mask) == n0 + n1
    # text between the blocks is not masked
    assert mask[s0 + n0] is False
    assert ids[0] == cfg.bos_token_id


def test_tokenize_with_image_still_requires_exactly_one():
    cfg = _cfg()
    with pytest.raises(ValueError):
        tokenize_with_image(_WordTok(), "no placeholder", cfg)
    with pytest.raises(ValueError):
        tokenize_with_image(_WordTok(), "<image> two <image>", cfg)
    ids, mask, start = tokenize_with_image(_WordTok(), "x <image> y", cfg)
    ids2, mask2, starts2 = tokenize_with_images(_WordTok(), "x <image> y", cfg, [(1, 1)])
    assert (ids, mask, [start]) == (ids2, mask2, starts2)


def test_tokenize_with_images_ratio_count_mismatch():
    with pytest.raises(ValueError):
        tokenize_with_images(_WordTok(), "a <image> b", _cfg(), [(1, 1), (1, 1)])


def _params_embed_only(cfg, vocab, h, seed=0):
    rng = np.random.default_rng(seed)
    return {"lm": {"embed": jnp.asarray(rng.standard_normal((vocab, h)).astype(np.float32))}}


def test_masked_matches_contiguous_single_block():
    cfg = _cfg()
    h = cfg.lm.hidden_size
    params = _params_embed_only(cfg, cfg.lm.vocab_size, h)
    n_img = 5
    s = 12
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, cfg.lm.vocab_size, (1, s)), jnp.int32)
    vis = jnp.asarray(rng.standard_normal((n_img, h)).astype(np.float32))
    start = 3
    mask = np.zeros((s,), bool)
    mask[start : start + n_img] = True

    a = ocr2.build_inputs_embeds(params, cfg, ids, vis, start)
    b = ocr2.build_inputs_embeds_masked(params, cfg, ids, vis, jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("layout", ["two_blocks", "interleaved"])
def test_masked_scatter_parity_vs_torch(layout):
    cfg = _cfg()
    h = cfg.lm.hidden_size
    params = _params_embed_only(cfg, cfg.lm.vocab_size, h)
    s = 20
    rng = np.random.default_rng(2)
    ids = np.asarray(rng.integers(0, cfg.lm.vocab_size, (1, s)), np.int32)
    mask = np.zeros((s,), bool)
    if layout == "two_blocks":
        mask[2:6] = True
        mask[10:13] = True
    else:
        mask[[1, 4, 5, 9, 15, 19]] = True
    n_img = int(mask.sum())
    vis = rng.standard_normal((n_img, h)).astype(np.float32)

    got = np.asarray(
        ocr2.build_inputs_embeds_masked(
            params, cfg, jnp.asarray(ids), jnp.asarray(vis), jnp.asarray(mask)
        )
    )

    base = torch.from_numpy(np.asarray(params["lm"]["embed"]))[
        torch.from_numpy(ids.astype(np.int64))
    ]  # [1, S, H]
    expected = base.masked_scatter(
        torch.from_numpy(mask)[None, :, None], torch.from_numpy(vis)
    )
    np.testing.assert_allclose(got, expected.numpy(), rtol=0, atol=0)


def test_encode_views_multi_concatenates_in_order():
    cfg = _cfg()
    import jax

    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.float32, vision_dtype=jnp.float32
    )
    s = cfg.base_image_size
    rng = np.random.default_rng(3)
    img1 = jnp.asarray(rng.standard_normal((1, 3, s, s)).astype(np.float32) * 0.1)
    img2 = jnp.asarray(rng.standard_normal((1, 3, s, s)).astype(np.float32) * 0.1)
    v1 = ocr2.encode_views(params, cfg, img1, None)
    v2 = ocr2.encode_views(params, cfg, img2, None)
    both = ocr2.encode_views_multi(params, cfg, [(img1, None), (img2, None)])
    np.testing.assert_array_equal(
        np.asarray(both), np.concatenate([np.asarray(v1), np.asarray(v2)], axis=0)
    )
