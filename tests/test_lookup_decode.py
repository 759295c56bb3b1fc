"""Prompt-lookup speculative greedy decoding (runtime/generate.py).

Exactness contract: lookup_greedy_generate must produce the same tokens as
plain greedy_generate (drafts are verified by the model's own picks, ban
mask included), across ngram settings, budgets, and EOS stops.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.configs import tiny_lm_config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime.generate import (
    _lookup_draft,
    greedy_generate,
    lookup_greedy_generate,
)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_lm_config()
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    return cfg, params


def _run_both(cfg, params, ids, *, chunk=4, match_n=2, **kw):
    emb = jnp.take(params["embed"], ids, axis=0)
    t0, n0 = greedy_generate(params, cfg, emb, ids, capacity=128, kv_dtype="float32", **kw)
    t1, n1 = lookup_greedy_generate(
        params, cfg, emb, ids, capacity=128, kv_dtype="float32",
        chunk=chunk, match_n=match_n, **kw,
    )
    s = ids.shape[1]
    na, nb = int(np.asarray(n0)[0]), int(np.asarray(n1)[0])
    assert na == nb, (na, nb)
    np.testing.assert_array_equal(
        np.asarray(t0)[0, : s + na], np.asarray(t1)[0, : s + nb]
    )
    return np.asarray(t0)[0, : s + na]


@pytest.mark.parametrize("ngram,mx,chunk", [(0, 24, 4), (3, 24, 4), (0, 7, 5), (2, 40, 2)])
def test_lookup_matches_plain_greedy(setup, ngram, mx, chunk):
    cfg, params = setup
    rng = np.random.default_rng(ngram * 100 + mx)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 10)), jnp.int32)
    _run_both(
        cfg, params, ids, max_new_tokens=mx, ngram_size=ngram, eos_id=1, chunk=chunk
    )


def test_lookup_eos_stop(setup):
    """EOS appearing mid-chunk must stop generation at the same token."""
    cfg, params = setup
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 10)), jnp.int32)
    emb = jnp.take(params["embed"], ids, axis=0)
    base, n = greedy_generate(
        params, cfg, emb, ids, max_new_tokens=24, ngram_size=0, eos_id=1,
        capacity=128, kv_dtype="float32",
    )
    gen = np.asarray(base)[0, 10 : 10 + int(np.asarray(n)[0])]
    eos = int(gen[4])  # the 5th generated token becomes the stop token
    out = _run_both(cfg, params, ids, max_new_tokens=24, ngram_size=0, eos_id=eos)
    assert out[-1] == eos and len(out) <= 10 + 24


def test_lookup_draft_finds_repetition():
    """The draft must return the continuation of the latest prior match."""
    hist = jnp.asarray([5, 6, 7, 8, 1, 2, 5, 6, 9, 3, 5, 6, 0, 0, 0, 0], jnp.int32)
    cur_len = jnp.int32(12)  # suffix is [5, 6]; latest prior match at i=6
    draft = np.asarray(_lookup_draft(hist, cur_len, 2, 3))
    np.testing.assert_array_equal(draft, [9, 3, 5])  # tokens after hist[6:8]


def test_lookup_accepts_on_repetitive_text(setup):
    """Random tiny LMs cycle without an n-gram ban; the lookup loop must
    finish in fewer forwards than tokens (i.e. drafts actually accept).
    Proxy: exact match on a long budget with a strongly cyclic output."""
    cfg, params = setup
    rng = np.random.default_rng(3)
    pattern = rng.integers(2, cfg.vocab_size, 4)
    ids = jnp.asarray(np.tile(pattern, 4)[None, :], jnp.int32)  # repetitive prompt
    _run_both(cfg, params, ids, max_new_tokens=48, ngram_size=0, eos_id=1, chunk=6)


def test_lookup_matches_plain_greedy_q8(setup):
    """Lookup decode through the int8 path (chunked q8 FFN + attention)."""
    cfg, params = setup
    q8 = dsv2.quantize_lm_params(params, scope="full")
    rng = np.random.default_rng(21)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 10)), jnp.int32)
    _run_both(cfg, q8, ids, max_new_tokens=24, ngram_size=3, eos_id=1, chunk=4)


def test_lookup_matches_plain_greedy_q4(setup):
    """Lookup decode through the int4 path (chunked w4a16 FFN + attention)."""
    cfg, params = setup
    q4 = dsv2.quantize_lm_params(params, scope="full", bits=4)
    rng = np.random.default_rng(22)
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (1, 10)), jnp.int32)
    _run_both(cfg, q4, ids, max_new_tokens=24, ngram_size=3, eos_id=1, chunk=4)


def test_batched_lookup_matches_plain_greedy(setup):
    """Per-row ragged acceptance must reproduce batched greedy exactly,
    including rows that hit EOS at different steps."""
    from deepseek_ocr2_tpu.runtime.generate import lookup_greedy_generate_batched

    cfg, params = setup
    rng = np.random.default_rng(13)
    b = 4
    ids = jnp.asarray(rng.integers(2, cfg.vocab_size, (b, 10)), jnp.int32)
    emb = jnp.take(params["embed"], ids, axis=0)
    base, n0 = greedy_generate(
        params, cfg, emb, ids, max_new_tokens=24, ngram_size=3, eos_id=1,
        capacity=128, kv_dtype="float32",
    )
    # Pick an eos id that appears mid-stream for some row, to force
    # different stop steps across the batch.
    gen = np.asarray(base)[:, 10:]
    eos = int(gen[1, 5])

    t0, n0 = greedy_generate(
        params, cfg, emb, ids, max_new_tokens=24, ngram_size=3, eos_id=eos,
        capacity=128, kv_dtype="float32",
    )
    t1, n1 = lookup_greedy_generate_batched(
        params, cfg, emb, ids, max_new_tokens=24, ngram_size=3, eos_id=eos,
        capacity=128, kv_dtype="float32", chunk=4,
    )
    n0, n1 = np.asarray(n0), np.asarray(n1)
    np.testing.assert_array_equal(n0, n1)
    a, b_ = np.asarray(t0), np.asarray(t1)
    for r in range(b):
        np.testing.assert_array_equal(
            a[r, : 10 + n0[r]], b_[r, : 10 + n1[r]], err_msg=f"row {r}"
        )


def test_lookup_accelerates_deterministic_cycle():
    """A hand-built Markov LM (zeroed attention/MLP; embed -> lm_head maps
    token t to t+1 mod 48) emits a strict cycle; after the first period the
    drafts must all accept, so decode forwards << tokens generated."""
    from deepseek_ocr2_tpu.runtime.generate import lookup_greedy_generate

    cfg = tiny_lm_config(num_hidden_layers=2)
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.float32)
    h, period = cfg.hidden_size, 24

    # Orthogonal-ish token embeddings for the first `period` ids.
    emb = np.zeros((cfg.vocab_size, h), np.float32)
    emb[:period, : period % h if period < h else h] = 0  # placate linters
    for t in range(period):
        emb[t, t % h] = 1.0 if t < h else 1.0  # identity rows (period<=h)
    assert period <= h
    lm_head = np.zeros((h, cfg.vocab_size), np.float32)
    for t in range(period):
        lm_head[t, (t + 1) % period] = 1.0  # <e_t, col_{t+1}> dominates

    def zeroed(tree):
        return jax.tree_util.tree_map(lambda a: jnp.zeros_like(a), tree)

    params = dict(params)
    params["embed"] = jnp.asarray(emb)
    params["lm_head"] = jnp.asarray(lm_head)
    # Zero every attention/MLP/expert weight: residual stream carries the
    # token embedding straight to the head (norms rescale, argmax invariant).
    params["layers_dense"] = zeroed(params["layers_dense"])
    lm = dict(params["layers_moe"])
    for k in ("attn", "experts", "shared"):
        lm[k] = zeroed(params["layers_moe"][k])
    params["layers_moe"] = {**params["layers_moe"], **lm}

    # Prompt carries one FULL period + a few tokens, so every generated
    # position has a prior occurrence to draft from.
    prompt = list(range(period)) + list(range(4))
    s_len = len(prompt)
    ids = jnp.asarray(np.asarray(prompt)[None, :], jnp.int32)
    embeds = jnp.take(params["embed"], ids, axis=0)
    kw = dict(max_new_tokens=96, ngram_size=0, eos_id=255, capacity=256,
              kv_dtype="float32")
    base, nb = greedy_generate(params, cfg, embeds, ids, **kw)
    gen = np.asarray(base)[0, s_len : s_len + int(np.asarray(nb)[0])]
    want = [(3 + i + 1) % period for i in range(96)]
    np.testing.assert_array_equal(gen, want)  # the cycle really is emitted

    t, n, steps = lookup_greedy_generate(
        params, cfg, embeds, ids, chunk=6, return_steps=True, **kw
    )
    n = int(np.asarray(n)[0])
    steps = int(np.asarray(steps))
    assert n == 96
    np.testing.assert_array_equal(np.asarray(t)[0, s_len : s_len + n], want)
    # 96 tokens at chunk 6 with full acceptance ~ 17 forwards; < 1/3 of the
    # token count proves the drafts hit.
    assert steps <= 32, f"speculation did not accelerate: {steps} forwards"
