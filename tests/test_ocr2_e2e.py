"""End-to-end OCR parity: full pipeline (vision -> injection -> greedy decode)
must be token-exact vs the torch oracle, with and without crops, including
the batched engine path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.generate import greedy_generate

import reference_torch as ref
import reference_torch_vision as refv


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ocr2_config()
    flat = refv.random_ocr2_flat(cfg, seed=11)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, flat, params


def _prompt_ids(cfg, crop_ratio):
    n_img = cfg.image_token_count(crop_ratio)
    ids = [cfg.bos_token_id, 17]
    start = len(ids)
    img_tok = cfg.image_token_id % cfg.lm.vocab_size
    ids += [img_tok] * n_img
    ids += [23, 29]
    return ids, start, n_img


def _torch_vision(flat, cfg, base, patches):
    def tower(x):
        feats = refv.sam_forward_torch(flat, cfg.sam, x)
        feats = refv.qwen2_encode_torch(flat, cfg.qwen2, feats.numpy())
        w = torch.from_numpy(np.asarray(flat["model.projector.layers.weight"])).float()
        b = torch.from_numpy(np.asarray(flat["model.projector.layers.bias"])).float()
        return feats @ w.T + b

    h = cfg.lm.hidden_size
    g = tower(base).reshape(-1, h)
    sep = torch.from_numpy(np.asarray(flat["model.view_seperator"])).float()[None]
    if patches is not None:
        loc = tower(patches).reshape(-1, h)
        return torch.cat([loc, g, sep], dim=0)
    return torch.cat([g, sep], dim=0)


def _run_case(cfg, flat, params, patches_count):
    rng = np.random.default_rng(42 + (patches_count or 0))
    base = rng.uniform(-1, 1, (1, 3, cfg.base_image_size, cfg.base_image_size)).astype(
        np.float32
    )
    patches = (
        rng.uniform(
            -1, 1, (patches_count, 3, cfg.crop_image_size, cfg.crop_image_size)
        ).astype(np.float32)
        if patches_count
        else None
    )
    ratio = (patches_count, 1) if patches_count else (1, 1)
    ids, start, n_img = _prompt_ids(cfg, ratio)

    # torch oracle
    vision_t = _torch_vision(flat, cfg, base, patches)
    assert vision_t.shape[0] == n_img
    embed_tab = torch.from_numpy(np.asarray(flat["model.embed_tokens.weight"])).float()
    embeds_t = embed_tab[torch.tensor(ids)][None].clone()
    embeds_t[0, start : start + n_img] = vision_t
    want = ref.greedy_from_embeds(
        flat, cfg.lm, embeds_t, ids, max_new_tokens=8, eos_id=1, ngram_size=3
    )

    # jax pipeline
    embeds = ocr2.ocr_prefill_embeds(
        params,
        cfg,
        jnp.asarray(ids, jnp.int32)[None],
        jnp.asarray(base),
        None if patches is None else jnp.asarray(patches),
        start,
    )
    tokens, n_gen = greedy_generate(
        params["lm"],
        cfg.lm,
        embeds,
        jnp.asarray(ids, jnp.int32),
        max_new_tokens=8,
        ngram_size=3,
        eos_id=1,
        capacity=128,
        kv_dtype="float32",
    )
    got = np.asarray(tokens[0, : len(ids) + int(n_gen[0])]).tolist()
    assert got == want


def test_e2e_no_crop(setup):
    cfg, flat, params = setup
    _run_case(cfg, flat, params, patches_count=0)


def test_e2e_with_crops(setup):
    cfg, flat, params = setup
    _run_case(cfg, flat, params, patches_count=2)


def test_batched_prefill_matches_single(setup):
    """Engine's batched vision prefill == per-page prefill."""
    cfg, flat, params = setup
    rng = np.random.default_rng(7)
    b, p = 2, 2
    bases = rng.uniform(-1, 1, (b, 3, cfg.base_image_size, cfg.base_image_size)).astype(
        np.float32
    )
    patches = rng.uniform(
        -1, 1, (b, p, 3, cfg.crop_image_size, cfg.crop_image_size)
    ).astype(np.float32)
    ids, start, n_img = _prompt_ids(cfg, (p, 1))
    ids_arr = jnp.asarray(np.tile(np.asarray(ids, np.int32), (b, 1)))

    batched = ocr2.ocr_prefill_embeds_batched(
        params, cfg, ids_arr, jnp.asarray(bases), jnp.asarray(patches), start
    )
    for row in range(b):
        single = ocr2.ocr_prefill_embeds(
            params,
            cfg,
            jnp.asarray(ids, jnp.int32)[None],
            jnp.asarray(bases[row : row + 1]),
            jnp.asarray(patches[row]),
            start,
        )
        np.testing.assert_allclose(
            np.asarray(batched[row]), np.asarray(single[0]), rtol=2e-5, atol=2e-5
        )
