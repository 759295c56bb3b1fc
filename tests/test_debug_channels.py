"""Debug/observability channels (reference C16): per-step TOPK dumps,
embedding fingerprints at HF-comparable positions, SAM pos-resize ablation."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

import reference_torch_vision as refv


def _tiny_tokenizer():
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {"<unk>": 2, "Free": 10, "OCR.": 11}
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ocr2_config()
    cfg = dataclasses.replace(cfg, image_token_id=500)
    flat = refv.random_ocr2_flat(cfg, seed=5)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    pipe = OCR2Pipeline(params, cfg, _tiny_tokenizer(), kv_dtype="float32", act_dtype="float32")
    rng = np.random.default_rng(1)
    page = Image.fromarray(rng.integers(0, 256, (96, 128, 3), np.uint8))
    return cfg, pipe, page


def test_topk_per_step_dumps_and_token_identical(setup, monkeypatch, capfd):
    cfg, pipe, page = setup
    base = pipe.generate_ocr(page, max_new_tokens=4, ngram_size=3)

    monkeypatch.setenv("DEEPSEEK_DEBUG_TOPK", "1")
    dbg = pipe.generate_ocr(page, max_new_tokens=4, ngram_size=3)
    err = capfd.readouterr().err
    assert dbg.token_ids == base.token_ids  # debug loop must stay token-exact
    assert "step0 top10 ids=" in err
    assert "step1 top10 ids=" in err  # per-decode-step (beyond reference)
    assert "step0 top10 logit=" in err


def test_ocr_embedding_fingerprints(setup, monkeypatch, capfd):
    cfg, pipe, page = setup
    monkeypatch.setenv("DEEPSEEK_DEBUG_OCR", "1")
    pipe.generate_ocr(page, max_new_tokens=2, ngram_size=0)
    err = capfd.readouterr().err
    assert "inputs_embeds nan=" in err
    assert "inputs_embeds fingerprint=" in err
    assert "inputs_embeds[pos0]=" in err
    assert "inputs_embeds[pos1]=" in err
    assert "inputs_embeds[pos_last]=" in err


def test_sam_pos_resize_ablation(monkeypatch):
    """DEEPSEEK_SAM_POS_RESIZE switches the pos-embed resize filter
    (reference sam.rs:575-586); default (HF) differs from interp_bilinear."""
    from deepseek_ocr2_tpu.models.sam import resize_pos_embed

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    default = np.asarray(resize_pos_embed(pos, 6, 6))
    monkeypatch.setenv("DEEPSEEK_SAM_POS_RESIZE", "interp_bilinear")
    bilinear = np.asarray(resize_pos_embed(pos, 6, 6))
    monkeypatch.setenv("DEEPSEEK_SAM_POS_RESIZE", "interp_bicubic")
    bicubic = np.asarray(resize_pos_embed(pos, 6, 6))
    assert not np.allclose(default, bilinear)
    assert not np.allclose(default, bicubic)
    assert not np.allclose(bilinear, bicubic)
    monkeypatch.delenv("DEEPSEEK_SAM_POS_RESIZE")
    again = np.asarray(resize_pos_embed(pos, 6, 6))
    np.testing.assert_array_equal(default, again)
