"""Vision tower parity: SAM + Qwen2 + composite injection vs torch oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.configs import tiny_ocr2_config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.models import qwen2 as qwen2_mod
from deepseek_ocr2_tpu.models import sam as sam_mod

import reference_torch_vision as refv


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_ocr2_config()
    flat = refv.random_ocr2_flat(cfg, seed=3)
    params, report = ocr2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    assert not report.missing, report.missing[:8]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, flat, params


def test_sam_base_view(setup):
    """SAM on the native-resolution view (no pos-embed resize)."""
    cfg, flat, params = setup
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 3, cfg.sam.img_size, cfg.sam.img_size)).astype(
        np.float32
    )
    want = refv.sam_forward_torch(flat, cfg.sam, x).numpy()
    got = np.asarray(sam_mod.sam_forward(params["sam"], cfg.sam, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_sam_crop_view_resizes_pos_and_relpos(setup):
    """SAM on the crop resolution exercises pos-embed + rel-pos resizing."""
    cfg, flat, params = setup
    rng = np.random.default_rng(1)
    s = cfg.crop_image_size  # 192 -> 12x12 patch grid vs 16x16 tables
    x = rng.uniform(-1, 1, size=(2, 3, s, s)).astype(np.float32)
    want = refv.sam_forward_torch(flat, cfg.sam, x).numpy()
    got = np.asarray(sam_mod.sam_forward(params["sam"], cfg.sam, jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3)


def test_qwen2_encode(setup):
    cfg, flat, params = setup
    rng = np.random.default_rng(2)
    for side, n_query in ((4, cfg.qwen2.n_query_1024), (3, cfg.qwen2.n_query_768)):
        feats = rng.standard_normal((2, cfg.qwen2.hidden_size, side, side)).astype(
            np.float32
        )
        want = refv.qwen2_encode_torch(flat, cfg.qwen2, feats).numpy()
        got = np.asarray(
            qwen2_mod.qwen2_encode(params["qwen2"], cfg.qwen2, jnp.asarray(feats))
        )
        assert got.shape == (2, n_query, cfg.qwen2.hidden_size)
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_injection_order_and_position(setup):
    """Vision tokens land in the placeholder block: local -> global -> sep."""
    cfg, flat, params = setup
    rng = np.random.default_rng(3)
    base = rng.uniform(-1, 1, size=(1, 3, cfg.sam.img_size, cfg.sam.img_size)).astype(
        np.float32
    )
    patches = rng.uniform(
        -1, 1, size=(2, 3, cfg.crop_image_size, cfg.crop_image_size)
    ).astype(np.float32)

    vision = ocr2.encode_views(params, cfg, jnp.asarray(base), jnp.asarray(patches))
    nq_base = cfg.num_queries(cfg.base_image_size) ** 2
    nq_crop = cfg.num_queries(cfg.crop_image_size) ** 2
    n_img = 2 * nq_crop + nq_base + 1
    assert vision.shape == (n_img, cfg.lm.hidden_size)

    # Separator is the last row (order local -> global -> sep).
    sep = np.asarray(params["view_seperator"])
    np.testing.assert_allclose(np.asarray(vision[-1]), sep, rtol=1e-6, atol=1e-6)
    # Global block sits right before the separator.
    g = ocr2.encode_views(params, cfg, jnp.asarray(base), None)
    np.testing.assert_allclose(
        np.asarray(vision[2 * nq_crop : 2 * nq_crop + nq_base]),
        np.asarray(g[:nq_base]),
        rtol=1e-5,
        atol=1e-5,
    )

    # Injection replaces exactly the placeholder block.
    seq = 4 + n_img
    ids = np.full((1, seq), 7, np.int32)
    start = 2
    ids[0, start : start + n_img] = cfg.image_token_id % cfg.lm.vocab_size
    embeds = ocr2.build_inputs_embeds(params, cfg, jnp.asarray(ids), vision, start)
    emb_tab = np.asarray(params["lm"]["embed"])
    np.testing.assert_array_equal(np.asarray(embeds[0, 0]), emb_tab[7])
    np.testing.assert_array_equal(np.asarray(embeds[0, start + n_img]), emb_tab[7])
    np.testing.assert_allclose(
        np.asarray(embeds[0, start : start + n_img]),
        np.asarray(vision).astype(np.asarray(embeds).dtype),
    )
