"""Full-scope int4 LM: quantized containers flow through every decode path
(contiguous, ragged, paged), logits stay within the w4 error bound, and the
generate loop runs end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime.generate import greedy_generate
from deepseek_ocr2_tpu.runtime.kv_cache import make_kv_cache

import reference_torch as ref


@pytest.fixture(scope="module")
def lm_setup():
    cfg = tiny_lm_config()
    flat = ref.random_lm_flat(cfg, seed=21)
    params, report = dsv2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, params


def _prefill_logits(params, cfg, embeds):
    cache = make_kv_cache(
        cfg.num_hidden_layers, 1, cfg.num_attention_heads, 64, cfg.head_dim, jnp.float32
    )
    hidden, _ = dsv2.lm_forward(params, cfg, embeds, cache, pos=0, is_prefill=True)
    return dsv2.logits_last(params, hidden)


def test_quantize_bits4_containers(lm_setup):
    cfg, params = lm_setup
    qp = dsv2.quantize_lm_params(params, scope="full", bits=4)
    assert "gu_q4" in qp["moe_q8"][0]
    assert "pe_gu_q4" in qp["moe_q8"][0]  # shared folded as pseudo-experts
    assert "q4" in qp["q8_lm_head"]
    assert "q4" in qp["q8_layers"]["dense"][0]["wqkv"]
    assert dsv2.vocab_size_of(qp) == cfg.vocab_size
    # Packed payload is half the (256-padded) input dim; at real dims
    # (H=1280, a 256-multiple) that is exactly half the int8 bytes.
    h = params["embed"].shape[1]
    hp = -(-h // 256) * 256
    assert qp["q8_lm_head"]["q4"].shape == (hp // 2, cfg.vocab_size)
    assert qp["q8_lm_head"]["scale"].shape == (hp // 128, cfg.vocab_size)


def test_full_q4_logit_error_bound(lm_setup):
    """Full-scope int4 logits stay within a (looser than int8) relative
    error of the bf16 path."""
    cfg, params = lm_setup
    qparams = dsv2.quantize_lm_params(params, scope="full", bits=4)
    ids = jnp.asarray([0, 5, 9, 17, 3], jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)[None]

    base = np.asarray(_prefill_logits(params, cfg, embeds), np.float32)
    quant = np.asarray(_prefill_logits(qparams, cfg, embeds), np.float32)
    denom = max(np.abs(base).max(), 1e-6)
    rel = np.abs(quant - base).max() / denom
    # Unstructured random weights are the int4 worst case (no outlier
    # structure for the group scales to exploit); measured ~0.20 here vs
    # 0.08 for int8 on the same tiny config.
    assert rel < 0.25, rel


def test_full_q4_generate_runs_end_to_end(lm_setup):
    cfg, params = lm_setup
    qparams = dsv2.quantize_lm_params(params, scope="full", bits=4)
    ids = jnp.asarray([0, 5, 9, 42], jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)[None]
    tokens, n_gen = greedy_generate(
        qparams,
        cfg,
        embeds,
        ids,
        max_new_tokens=6,
        ngram_size=2,
        eos_id=1,
        capacity=32,
        kv_dtype="float32",
    )
    out = np.asarray(tokens[0, : 4 + int(n_gen[0])])
    assert out.shape[0] >= 5
    assert (out >= 0).all() and (out < cfg.vocab_size).all()


def test_full_q4_ragged_decode_matches_contiguous(lm_setup):
    cfg, params = lm_setup
    qparams = dsv2.quantize_lm_params(params, scope="full", bits=4)
    b, s = 2, 4
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, s)), jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)

    cache = make_kv_cache(
        cfg.num_hidden_layers, b, cfg.num_attention_heads, 16, cfg.head_dim, jnp.float32
    )
    hidden, cache = dsv2.lm_forward(qparams, cfg, embeds, cache, pos=0, is_prefill=True)
    tok = jnp.argmax(dsv2.logits_last(qparams, hidden), axis=-1).astype(jnp.int32)
    emb = jnp.take(params["embed"], tok, axis=0)[:, None, :]

    h_ctg, _ = dsv2.lm_forward(qparams, cfg, emb, cache, pos=s, is_prefill=False)
    h_rag, _ = dsv2.lm_decode_step_ragged(
        qparams, cfg, emb, cache, jnp.full((b,), s, jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(h_rag, np.float32), np.asarray(h_ctg, np.float32), rtol=2e-2, atol=2e-3
    )


def test_q4_experts_scope(lm_setup):
    """bits=4 with scope='experts' keeps bf16 attention/shared/lm_head but
    runs the q4 expert kernels."""
    cfg, params = lm_setup
    qparams = dsv2.quantize_lm_params(params, scope="experts", bits=4)
    assert "gu_q4" in qparams["moe_q8"][0]
    assert "lm_head" in qparams and "q8_layers" not in qparams
    ids = jnp.asarray([0, 5, 9], jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)[None]
    logits = np.asarray(_prefill_logits(qparams, cfg, embeds), np.float32)
    assert np.isfinite(logits).all()


def test_q4_paged_decode_matches_ragged(lm_setup):
    """Paged pool decode (the continuous-serving path) on q4 params equals
    the contiguous ragged q4 decode step."""
    from deepseek_ocr2_tpu.runtime import paged_kv

    cfg, params = lm_setup
    qparams = dsv2.quantize_lm_params(params, scope="full", bits=4)
    b, s, page, cap = 2, 4, 8, 16
    rng = np.random.default_rng(8)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, s)), jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)

    cache = make_kv_cache(
        cfg.num_hidden_layers, b, cfg.num_attention_heads, cap, cfg.head_dim, jnp.float32
    )
    hidden, cache = dsv2.lm_forward(qparams, cfg, embeds, cache, pos=0, is_prefill=True)

    n_pages_per = paged_kv.pages_for(cap, page)
    pool = paged_kv.make_paged_kv_cache(
        cfg.num_hidden_layers, 2 * n_pages_per + 1, cfg.num_attention_heads, page,
        cfg.head_dim, jnp.float32,
    )
    alloc = paged_kv.PageAllocator(2 * n_pages_per + 1)
    tables = []
    for slot in range(b):
        pages = alloc.allocate(n_pages_per)
        for key in ("k", "v"):
            pool[key] = paged_kv.write_prompt_pages(
                pool[key], cache[key][:, slot : slot + 1], jnp.asarray(pages, jnp.int32), s
            )
        tables.append(pages)
    tables = jnp.asarray(tables, jnp.int32)

    tok = jnp.argmax(dsv2.logits_last(qparams, hidden), axis=-1).astype(jnp.int32)
    pos = jnp.full((b,), s, jnp.int32)
    emb = jnp.take(params["embed"], tok, axis=0)[:, None, :]
    h_ref, _ = dsv2.lm_decode_step_ragged(qparams, cfg, emb, cache, pos)
    h_paged, pool = paged_kv.lm_decode_step_paged(
        qparams, cfg, emb, pool, tables, pos, use_pallas=False
    )
    np.testing.assert_allclose(
        np.asarray(h_paged, np.float32), np.asarray(h_ref, np.float32),
        rtol=2e-4, atol=2e-4,
    )
