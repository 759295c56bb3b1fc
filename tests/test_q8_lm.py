"""Quantized LM decode path: q8 params track the dequantized bf16 model."""

import numpy as np
import jax
import jax.numpy as jnp

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime.generate import greedy_generate
from deepseek_ocr2_tpu.runtime.kv_cache import make_kv_cache

import reference_torch as ref


def test_q8_lm_matches_dequantized_model():
    cfg = tiny_lm_config()
    flat = ref.random_lm_flat(cfg, seed=9)
    params, _ = dsv2.params_from_flat(flat, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    q8_params = dsv2.quantize_lm_params(params)
    # Build the dequantized-equivalent dense model (same rounded weights).
    deq_experts = {}
    deq_layers = [dsv2._dequantize_experts(q8, jnp.float32) for q8 in q8_params["moe_q8"]]
    for name in ("gate", "up", "down"):
        deq_experts[name] = jnp.stack([d[name] for d in deq_layers])
    deq_params = jax.tree_util.tree_map(lambda x: x, params)
    deq_params["layers_moe"] = dict(deq_params["layers_moe"])
    deq_params["layers_moe"]["experts"] = deq_experts

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (1, 9)), jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)

    def run(p):
        cache = make_kv_cache(
            cfg.num_hidden_layers, 1, cfg.num_attention_heads, 32, cfg.head_dim, jnp.float32
        )
        hidden, cache = dsv2.lm_forward(p, cfg, embeds, cache, pos=0, is_prefill=True)
        logits = [dsv2.logits_last(p, hidden)]
        tok = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)
        for step in range(3):
            emb = jnp.take(p["embed"], tok, axis=0)[:, None, :]
            hidden, cache = dsv2.lm_forward(
                p, cfg, emb, cache, pos=9 + step, is_prefill=False
            )
            logits.append(dsv2.logits_last(p, hidden))
            tok = jnp.argmax(logits[-1], axis=-1).astype(jnp.int32)
        return np.stack([np.asarray(l, np.float32) for l in logits])

    lq = run(q8_params)
    ld = run(deq_params)
    np.testing.assert_allclose(lq, ld, rtol=5e-3, atol=5e-3)


def test_q8_generate_runs_end_to_end():
    cfg = tiny_lm_config()
    flat = ref.random_lm_flat(cfg, seed=10)
    params, _ = dsv2.params_from_flat(flat, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    q8_params = dsv2.quantize_lm_params(params)

    ids = jnp.asarray([0, 5, 9, 42], jnp.int32)
    embeds = jnp.take(q8_params["embed"], ids, axis=0)[None]
    tokens, n_gen = greedy_generate(
        q8_params,
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
