"""On-device stochastic sampling (temperature / top-k / top-p)."""

import numpy as np
import jax
import jax.numpy as jnp

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.ops.sampling import greedy_pick, sample_pick
from deepseek_ocr2_tpu.runtime.generate import greedy_generate

import reference_torch as ref


def test_temperature_zero_is_greedy():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal(100), jnp.float32)
    key = jax.random.PRNGKey(0)
    assert int(sample_pick(logits, key, temperature=0.0)) == int(greedy_pick(logits))


def test_top_k_respected():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.standard_normal(100), jnp.float32)
    topk_ids = set(np.argsort(-np.asarray(logits))[:5].tolist())
    for s in range(30):
        tok = int(sample_pick(logits, jax.random.PRNGKey(s), temperature=1.5, top_k=5))
        assert tok in topk_ids


def test_top_p_respected():
    # Distribution where the nucleus at p=0.5 is a single dominant token.
    logits = jnp.asarray([10.0] + [0.0] * 99, jnp.float32)
    for s in range(10):
        tok = int(
            sample_pick(logits, jax.random.PRNGKey(s), temperature=1.0, top_p=0.5)
        )
        assert tok == 0


def test_ban_mask_respected_when_sampling():
    logits = jnp.asarray([5.0, 4.0, 3.0, 2.0], jnp.float32)
    ban = jnp.asarray([True, False, False, False])
    for s in range(20):
        tok = int(
            sample_pick(logits, jax.random.PRNGKey(s), ban, temperature=1.0, top_k=2)
        )
        assert tok != 0


def test_generate_sampling_reproducible_and_greedy_default():
    cfg = tiny_lm_config(num_hidden_layers=2)
    flat = ref.random_lm_flat(cfg, seed=3)
    params, _ = dsv2.params_from_flat(flat, cfg)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    ids = jnp.asarray([0, 5, 9], jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)[None]

    kw = dict(max_new_tokens=8, ngram_size=0, eos_id=1, capacity=32, kv_dtype="float32")
    t_greedy, _ = greedy_generate(params, cfg, embeds, ids, **kw)
    t_default, _ = greedy_generate(params, cfg, embeds, ids, temperature=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(t_greedy), np.asarray(t_default))

    t_s1, _ = greedy_generate(params, cfg, embeds, ids, temperature=1.0, seed=7, **kw)
    t_s1b, _ = greedy_generate(params, cfg, embeds, ids, temperature=1.0, seed=7, **kw)
    t_s2, _ = greedy_generate(params, cfg, embeds, ids, temperature=1.0, seed=8, **kw)
    np.testing.assert_array_equal(np.asarray(t_s1), np.asarray(t_s1b))  # same seed
    assert not np.array_equal(np.asarray(t_s1), np.asarray(t_s2))  # diff seed


def test_sample_pick_degenerate_ban_cases():
    """Regression: sample_pick must never emit a banned token, even when the
    ban mask leaves fewer candidates than top_k (or none at all)."""
    logits = jnp.asarray([5.0, 4.0, 3.0, 2.0], jnp.float32)
    # Only one unbanned token, top_k=2: the -inf candidate slot must never win.
    ban3 = jnp.asarray([True, True, True, False])
    for s in range(10):
        tok = int(
            sample_pick(logits, jax.random.PRNGKey(s), ban3, temperature=1.0, top_k=2)
        )
        assert tok == 3
    # Everything banned: categorical over all--inf is arbitrary; the fix pins
    # the result to the greedy path's argmax-over-masked behavior (index 0).
    ban_all = jnp.ones((4,), bool)
    for s in range(10):
        tok = int(
            sample_pick(logits, jax.random.PRNGKey(s), ban_all, temperature=1.0, top_k=2)
        )
        assert tok == 0
