"""Greedy autoregressive generation — single dispatch, zero host round-trips.

The reference's decode loop syncs with the host every step (argmax readback
main.rs:1569-1577, CPU ngram rescan :1580-1598, MoE gate readbacks). Here the
entire prefill + decode loop is one jitted `lax.while_loop`: on-device argmax,
on-device n-gram ban mask, on-device EOS check. The host only receives the
final token buffer.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..configs import DeepseekV2Config
from ..models.deepseek_v2 import lm_forward, logits_last
from ..ops.sampling import greedy_pick, ngram_ban_mask
from .kv_cache import make_kv_cache


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "ngram_size",
        "eos_id",
        "capacity",
        "kv_dtype",
    ),
)
def greedy_generate(
    params,
    cfg: DeepseekV2Config,
    inputs_embeds: jnp.ndarray,  # [1, S, H] prompt embeddings (text or multimodal)
    prompt_ids: jnp.ndarray,  # [S] i32 prompt token ids (placeholders included)
    *,
    max_new_tokens: int,
    ngram_size: int = 0,
    eos_id: int = 1,
    capacity: int = 2048,
    kv_dtype: str = "bfloat16",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy decode. Returns (tokens [S+max_new] i32, total_len i32).

    `tokens[:total_len]` = prompt + generated ids (EOS included when hit,
    matching the reference which pushes EOS before breaking, main.rs:1600-1609).
    """
    b, s, h = inputs_embeds.shape
    assert b == 1, "greedy_generate is the single-sequence path (engine batches)"
    assert s + max_new_tokens <= capacity, "capacity too small"
    vocab = params["lm_head"].shape[-1]
    t_buf = s + max_new_tokens

    cache = make_kv_cache(
        cfg.num_hidden_layers,
        b,
        cfg.num_attention_heads,
        capacity,
        cfg.head_dim,
        dtype=jnp.dtype(kv_dtype),
    )

    hidden, cache = lm_forward(params, cfg, inputs_embeds, cache, pos=0, is_prefill=True)
    logits = logits_last(params, hidden)  # [1, V]

    tokens = jnp.zeros((t_buf,), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0,))
    cur_len = jnp.int32(s)

    ban = ngram_ban_mask(tokens, cur_len, ngram_size, vocab)
    tok = greedy_pick(logits[0], ban)
    tokens = tokens.at[cur_len].set(tok)
    cur_len = cur_len + 1

    def cond(state):
        cache, tokens, cur_len, tok, steps = state
        return (tok != eos_id) & (steps < max_new_tokens)

    def body(state):
        cache, tokens, cur_len, tok, steps = state
        emb = jnp.take(params["embed"], tok, axis=0).astype(inputs_embeds.dtype)
        emb = emb.reshape(1, 1, h)
        hidden, cache = lm_forward(
            params, cfg, emb, cache, pos=cur_len - 1, is_prefill=False
        )
        logits = logits_last(params, hidden)
        ban = ngram_ban_mask(tokens, cur_len, ngram_size, vocab)
        nxt = greedy_pick(logits[0], ban)
        tokens = tokens.at[cur_len].set(nxt)
        return (cache, tokens, cur_len + 1, nxt, steps + 1)

    state = (cache, tokens, cur_len, tok, jnp.int32(1))
    _, tokens, cur_len, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, cur_len


def prefill_logits(params, cfg, inputs_embeds, capacity: int, kv_dtype="bfloat16"):
    """Prefill only: returns (last-token logits [1,V], cache). Un-jitted helper."""
    cache = make_kv_cache(
        cfg.num_hidden_layers,
        inputs_embeds.shape[0],
        cfg.num_attention_heads,
        capacity,
        cfg.head_dim,
        dtype=jnp.dtype(kv_dtype),
    )
    hidden, cache = lm_forward(params, cfg, inputs_embeds, cache, pos=0, is_prefill=True)
    return logits_last(params, hidden), cache
