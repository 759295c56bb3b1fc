"""DeepSeek-V2 LM numeric parity: JAX stack vs independent torch oracle."""

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
def setup():
    cfg = tiny_lm_config()
    flat = ref.random_lm_flat(cfg, seed=0)
    params, report = dsv2.params_from_flat(flat, cfg)
    report.raise_on_errors()
    assert not report.missing, report.missing[:5]
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return cfg, flat, params


def test_load_report_complete(setup):
    cfg, flat, params = setup
    # every checkpoint tensor consumed
    _, report = dsv2.params_from_flat(flat, cfg)
    assert len(report.applied) == len(flat)


def test_prefill_logits_match_torch(setup):
    cfg, flat, params = setup
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 17))

    want = ref.deepseek_v2_forward(flat, cfg, ids).numpy()

    cache = make_kv_cache(
        cfg.num_hidden_layers, 1, cfg.num_attention_heads, 64, cfg.head_dim, jnp.float32
    )
    embeds = jnp.take(params["embed"], jnp.asarray(ids), axis=0)
    hidden, _ = dsv2.lm_forward(params, cfg, embeds, cache, pos=0, is_prefill=True)
    got = np.asarray(dsv2.logits_all(params, hidden))

    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_decode_matches_prefill(setup):
    """KV-cache decode path must reproduce the prefill path position by position."""
    cfg, flat, params = setup
    rng = np.random.default_rng(2)
    s = 12
    ids = rng.integers(0, cfg.vocab_size, size=(1, s))

    cache = make_kv_cache(
        cfg.num_hidden_layers, 1, cfg.num_attention_heads, 64, cfg.head_dim, jnp.float32
    )
    embeds = jnp.take(params["embed"], jnp.asarray(ids), axis=0)
    hidden_pref, _ = dsv2.lm_forward(params, cfg, embeds, cache, pos=0, is_prefill=True)
    logits_pref = np.asarray(dsv2.logits_all(params, hidden_pref))

    # Token-by-token decode from an empty cache.
    cache = make_kv_cache(
        cfg.num_hidden_layers, 1, cfg.num_attention_heads, 64, cfg.head_dim, jnp.float32
    )
    outs = []
    for pos in range(s):
        emb = embeds[:, pos : pos + 1]
        hidden, cache = dsv2.lm_forward(
            params, cfg, emb, cache, pos=pos, is_prefill=False
        )
        outs.append(np.asarray(dsv2.logits_last(params, hidden)))
    logits_dec = np.stack(outs, axis=1)

    np.testing.assert_allclose(logits_dec, logits_pref, rtol=2e-4, atol=2e-4)


def test_greedy_generate_token_exact(setup):
    cfg, flat, params = setup
    prompt = [0, 5, 9, 42, 7]
    want = ref.greedy_generate_reference(
        flat, cfg, prompt, max_new_tokens=12, eos_id=1, ngram_size=3
    )

    ids = jnp.asarray(prompt, jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)[None]
    tokens, n_gen = greedy_generate(
        params,
        cfg,
        embeds,
        ids,
        max_new_tokens=12,
        ngram_size=3,
        eos_id=1,
        capacity=64,
        kv_dtype="float32",
    )
    got = list(np.asarray(tokens[0, : len(prompt) + int(n_gen[0])]))
    assert got == want


def test_batched_generate_matches_single(setup):
    """Batched decode must reproduce per-sequence results row by row."""
    cfg, flat, params = setup
    prompts = [[0, 5, 9, 42, 7], [0, 100, 3, 250, 11]]
    singles = [
        ref.greedy_generate_reference(flat, cfg, p, max_new_tokens=10, eos_id=1, ngram_size=3)
        for p in prompts
    ]
    ids = jnp.asarray(prompts, jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)
    tokens, n_gen = greedy_generate(
        params,
        cfg,
        embeds,
        ids,
        max_new_tokens=10,
        ngram_size=3,
        eos_id=1,
        capacity=64,
        kv_dtype="float32",
    )
    for b, want in enumerate(singles):
        got = list(np.asarray(tokens[b, : len(prompts[b]) + int(n_gen[b])]))
        assert got == want, b


def test_roundtrip_flat(setup):
    """params -> flat (PyTorch layout) -> params is identity."""
    cfg, flat, params = setup
    flat2 = dsv2.flat_from_params(
        jax.tree_util.tree_map(np.asarray, params), cfg
    )
    assert set(flat2) == set(flat)
    for k in flat:
        np.testing.assert_array_equal(flat2[k], flat[k])
