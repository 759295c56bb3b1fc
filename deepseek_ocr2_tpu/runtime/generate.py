"""Greedy autoregressive generation — single dispatch, zero host round-trips.

The reference's decode loop syncs with the host every step (argmax readback
main.rs:1569-1577, CPU ngram rescan :1580-1598, MoE gate readbacks). Here the
entire prefill + decode loop is one jitted `lax.while_loop`: on-device argmax,
on-device n-gram ban mask, on-device EOS check. The host only receives the
final token buffer.

Batched decode (B > 1) extends the reference's single-sequence loop: all
sequences share a prompt length (true for the fixed OCR prompt), finished
sequences freeze their buffers, and the loop exits when every sequence hit
EOS or the token budget.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..configs import DeepseekV2Config
from ..models.deepseek_v2 import lm_forward, logits_all, logits_last, vocab_size_of
from ..ops.sampling import greedy_pick, ngram_ban_mask, sample_pick
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
        "temperature",
        "top_k",
        "top_p",
    ),
)
def greedy_generate(
    params,
    cfg: DeepseekV2Config,
    inputs_embeds: jnp.ndarray,  # [B, S, H] prompt embeddings (text or multimodal)
    prompt_ids: jnp.ndarray,  # [B, S] or [S] i32 prompt ids (placeholders included)
    *,
    max_new_tokens: int,
    ngram_size: int = 0,
    eos_id: int = 1,
    capacity: int = 2048,
    kv_dtype: str = "bfloat16",
    temperature: float = 0.0,
    top_k: int = 0,
    top_p: float = 1.0,
    seed: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generate. Returns (tokens [B, S+max_new] i32, n_generated [B] i32).

    `tokens[b, :S+n_generated[b]]` = prompt + generated ids (EOS included when
    hit, matching the reference which pushes EOS before breaking,
    main.rs:1600-1609). Default is greedy; temperature > 0 enables on-device
    stochastic sampling (top-k / nucleus), a beyond-reference capability.
    """
    b, s, h = inputs_embeds.shape
    assert s + max_new_tokens <= capacity, "capacity too small"
    if prompt_ids.ndim == 1:
        prompt_ids = prompt_ids[None]
    vocab = vocab_size_of(params)
    t_buf = s + max_new_tokens

    cache = make_kv_cache(
        cfg.num_hidden_layers,
        b,
        cfg.num_attention_heads,
        capacity,
        cfg.head_dim,
        dtype=kv_dtype if isinstance(kv_dtype, str) and kv_dtype.startswith("int8") else jnp.dtype(kv_dtype),
    )

    hidden, cache = lm_forward(params, cfg, inputs_embeds, cache, pos=0, is_prefill=True)
    logits = logits_last(params, hidden)  # [B, V]

    tokens = jnp.zeros((b, t_buf), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    ban_fn = jax.vmap(ngram_ban_mask, in_axes=(0, None, None, None))

    def pick(logits, tokens, cur_len, key):
        ban = ban_fn(tokens, cur_len, ngram_size, vocab)  # [B, V]
        if temperature == 0.0:
            return jax.vmap(greedy_pick)(logits, ban)  # [B]
        keys = jax.random.split(key, b)
        return jax.vmap(
            lambda l, k, m: sample_pick(
                l, k, m, temperature=temperature, top_k=top_k, top_p=top_p
            )
        )(logits, keys, ban)

    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    cur_len = jnp.int32(s)
    tok = pick(logits, tokens, cur_len, sub)  # [B]
    done = tok == eos_id
    tokens = tokens.at[:, s].set(tok)
    cur_len = cur_len + 1
    n_gen = jnp.ones((b,), jnp.int32)

    def cond(state):
        cache, tokens, cur_len, tok, done, n_gen, steps, key = state
        return jnp.logical_and(steps < max_new_tokens, ~jnp.all(done))

    def body(state):
        cache, tokens, cur_len, tok, done, n_gen, steps, key = state
        emb = jnp.take(params["embed"], tok, axis=0).astype(inputs_embeds.dtype)
        emb = emb.reshape(b, 1, h)
        hidden, cache = lm_forward(
            params, cfg, emb, cache, pos=cur_len - 1, is_prefill=False
        )
        logits = logits_last(params, hidden)
        key, sub = jax.random.split(key)
        nxt = pick(logits, tokens, cur_len, sub)
        nxt = jnp.where(done, tok, nxt)  # freeze finished rows
        row = jnp.arange(b)
        old = tokens[row, cur_len]
        tokens = tokens.at[row, cur_len].set(jnp.where(done, old, nxt))
        n_gen = jnp.where(done, n_gen, n_gen + 1)
        done = done | (nxt == eos_id)
        return (cache, tokens, cur_len + 1, nxt, done, n_gen, steps + 1, key)

    state = (cache, tokens, cur_len, tok, done, n_gen, jnp.int32(1), key)
    _, tokens, _, _, _, n_gen, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, n_gen


def _lookup_draft_n(hist, cur_len, n: int, draft_k: int):
    """Latest prior occurrence of the current n-gram suffix in
    hist[:cur_len]; returns (found, draft_k continuation tokens)."""
    t_buf = hist.shape[0]
    last = jax.lax.dynamic_slice(hist, (jnp.maximum(cur_len - n, 0),), (n,))
    n_win = t_buf - n
    eq = jnp.ones((n_win,), bool)
    for j in range(n):
        eq = eq & (hist[j : j + n_win] == last[j])
    idx = jnp.arange(n_win, dtype=jnp.int32)
    # Window fully inside the emitted tokens, excluding the suffix itself.
    valid = eq & (idx < cur_len - n)
    score = jnp.where(valid, idx, -1)
    j_star = jnp.max(score)
    start = jnp.maximum(j_star, 0) + n
    return j_star >= 0, jax.lax.dynamic_slice(hist, (start,), (draft_k,))


def _lookup_draft(hist, cur_len, match_n: int, draft_k: int):
    """Prompt-lookup draft, longest-suffix-first: try n = match_n down to 1
    and take the longest n-gram with a prior occurrence (longer context =
    higher-precision drafts). No match at any n -> garbage guesses
    (correctness never depends on draft quality; bad drafts just verify to
    1 token/step)."""
    found, draft = _lookup_draft_n(hist, cur_len, 1, draft_k)
    for n in range(2, match_n + 1):  # longer matches override
        found_n, draft_n = _lookup_draft_n(hist, cur_len, n, draft_k)
        draft = jnp.where(found_n, draft_n, draft)
    return draft


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "ngram_size",
        "eos_id",
        "capacity",
        "kv_dtype",
        "chunk",
        "match_n",
        "return_steps",
    ),
)
def lookup_greedy_generate(
    params,
    cfg: DeepseekV2Config,
    inputs_embeds: jnp.ndarray,  # [1, S, H]
    prompt_ids: jnp.ndarray,  # [1, S] or [S] i32
    *,
    max_new_tokens: int,
    ngram_size: int = 0,
    eos_id: int = 1,
    capacity: int = 2048,
    kv_dtype: str = "bfloat16",
    chunk: int = 4,
    match_n: int = 3,
    return_steps: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy generation with prompt-lookup speculative decoding (single
    sequence). Same output contract as `greedy_generate`; with
    return_steps=True a third element counts decode forwards (so
    n_gen/steps is the measured tokens-per-weight-pass).

    Each loop iteration feeds `chunk` embeddings — the last emitted token
    plus chunk-1 drafted continuations (the tokens that followed the most
    recent prior occurrence of the current match_n-gram) — through ONE
    chunk-decode forward, then accepts the longest prefix where the model's
    own greedy pick (ban mask included) agrees with the draft, plus the
    first disagreeing pick as a bonus: 1..chunk tokens per weight pass.
    OCR transcripts repeat structure heavily, so drafts hit often and the
    per-token HBM cost drops below the b=1 byte floor. Output is greedy-
    exact up to chunk-width GEMM rounding (the same class of difference as
    changing decode batch size; beyond-reference capability, cf. HF
    assisted generation / prompt-lookup decoding).
    """
    b, s, h = inputs_embeds.shape
    assert b == 1, "speculative lookup decode is single-sequence"
    assert s + max_new_tokens + chunk - 1 <= capacity, "capacity too small"
    assert chunk >= 2 and match_n >= 1
    if prompt_ids.ndim == 1:
        prompt_ids = prompt_ids[None]
    vocab = vocab_size_of(params)
    t_buf = s + max_new_tokens

    cache = make_kv_cache(
        cfg.num_hidden_layers,
        1,
        cfg.num_attention_heads,
        capacity,
        cfg.head_dim,
        dtype=kv_dtype if isinstance(kv_dtype, str) and kv_dtype.startswith("int8") else jnp.dtype(kv_dtype),
    )

    hidden, cache = lm_forward(params, cfg, inputs_embeds, cache, pos=0, is_prefill=True)
    logits0 = logits_last(params, hidden)[0]  # [V]

    tokens = jnp.zeros((1, t_buf), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    ban0 = ngram_ban_mask(tokens[0], jnp.int32(s), ngram_size, vocab)
    tok = greedy_pick(logits0, ban0)  # scalar
    done = tok == eos_id
    tokens = tokens.at[0, s].set(tok)
    cur_len = jnp.int32(s + 1)
    n_gen = jnp.int32(1)

    def cond(state):
        cache, tokens, cur_len, tok, done, n_gen, steps = state
        return jnp.logical_and(n_gen < max_new_tokens, ~done)

    def body(state):
        cache, tokens, cur_len, tok, done, n_gen, steps = state
        draft = _lookup_draft(tokens[0], cur_len, match_n, chunk - 1)
        chunk_ids = jnp.concatenate([tok.reshape(1), draft])  # [chunk]
        emb = jnp.take(params["embed"], chunk_ids, axis=0).astype(
            inputs_embeds.dtype
        )[None]
        hidden, cache = lm_forward(
            params, cfg, emb, cache, pos=cur_len - 1, is_prefill=False
        )
        logits = logits_all(params, hidden)[0]  # [chunk, V]

        accepting = ~done
        cur = tok
        add = jnp.int32(0)
        for i in range(chunk):
            ban = ngram_ban_mask(tokens[0], cur_len + i, ngram_size, vocab)
            t_i = greedy_pick(logits[i], ban)
            emit = accepting & (n_gen + add < max_new_tokens)
            old = tokens[0, cur_len + i]
            tokens = tokens.at[0, cur_len + i].set(jnp.where(emit, t_i, old))
            cur = jnp.where(emit, t_i, cur)
            add = add + emit.astype(jnp.int32)
            hit_eos = emit & (t_i == eos_id)
            done = done | hit_eos
            if i < chunk - 1:
                accepting = emit & ~hit_eos & (t_i == draft[i])
        return (cache, tokens, cur_len + add, cur, done, n_gen + add, steps + 1)

    state = (cache, tokens, cur_len, tok, done, n_gen, jnp.int32(1))
    _, tokens, _, _, _, n_gen, steps = jax.lax.while_loop(cond, body, state)
    if return_steps:
        return tokens, n_gen.reshape(1), steps
    return tokens, n_gen.reshape(1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "max_new_tokens",
        "ngram_size",
        "eos_id",
        "capacity",
        "kv_dtype",
        "chunk",
        "match_n",
        "return_steps",
    ),
)
def lookup_greedy_generate_batched(
    params,
    cfg: DeepseekV2Config,
    inputs_embeds: jnp.ndarray,  # [B, S, H] (shared prompt length)
    prompt_ids: jnp.ndarray,  # [B, S] i32
    *,
    max_new_tokens: int,
    ngram_size: int = 0,
    eos_id: int = 1,
    capacity: int = 2048,
    kv_dtype: str = "bfloat16",
    chunk: int = 4,
    match_n: int = 3,
    return_steps: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched prompt-lookup speculative greedy decoding.

    Rows share the prompt length but accept independently, so each row
    carries its own length; the chunk forward runs with per-row (ragged)
    positions. Output contract matches `greedy_generate` (row b's tokens =
    prompt + its generated ids; finished rows freeze). Per-row outputs are
    greedy-exact up to chunk-width GEMM rounding.
    """
    b, s, h = inputs_embeds.shape
    assert s + max_new_tokens + chunk - 1 <= capacity, "capacity too small"
    assert chunk >= 2 and match_n >= 1
    if prompt_ids.ndim == 1:
        prompt_ids = prompt_ids[None]
    vocab = vocab_size_of(params)
    t_buf = s + max_new_tokens
    rows = jnp.arange(b)

    cache = make_kv_cache(
        cfg.num_hidden_layers,
        b,
        cfg.num_attention_heads,
        capacity,
        cfg.head_dim,
        dtype=kv_dtype if isinstance(kv_dtype, str) and kv_dtype.startswith("int8") else jnp.dtype(kv_dtype),
    )

    hidden, cache = lm_forward(params, cfg, inputs_embeds, cache, pos=0, is_prefill=True)
    logits0 = logits_last(params, hidden)  # [B, V]

    tokens = jnp.zeros((b, t_buf), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt_ids.astype(jnp.int32), (0, 0))

    ban_fn = jax.vmap(ngram_ban_mask, in_axes=(0, 0, None, None))
    draft_fn = jax.vmap(_lookup_draft, in_axes=(0, 0, None, None))

    len0 = jnp.full((b,), s, jnp.int32)
    tok = jax.vmap(greedy_pick)(logits0, ban_fn(tokens, len0, ngram_size, vocab))
    done = tok == eos_id
    tokens = tokens.at[:, s].set(tok)
    cur_len = len0 + 1
    n_gen = jnp.ones((b,), jnp.int32)

    def cond(state):
        cache, tokens, cur_len, tok, done, n_gen, steps = state
        return jnp.any(~done & (n_gen < max_new_tokens))

    def body(state):
        cache, tokens, cur_len, tok, done, n_gen, steps = state
        draft = draft_fn(tokens, cur_len, match_n, chunk - 1)  # [B, chunk-1]
        chunk_ids = jnp.concatenate([tok[:, None], draft], axis=1)  # [B, chunk]
        emb = jnp.take(params["embed"], chunk_ids, axis=0).astype(inputs_embeds.dtype)
        hidden, cache = lm_forward(
            params, cfg, emb, cache, pos=cur_len - 1, is_prefill=False
        )
        logits = logits_all(params, hidden)  # [B, chunk, V]

        accepting = ~done
        cur = tok
        add = jnp.zeros((b,), jnp.int32)
        for i in range(chunk):
            ban = ban_fn(tokens, cur_len + i, ngram_size, vocab)
            t_i = jax.vmap(greedy_pick)(logits[:, i], ban)  # [B]
            emit = accepting & (n_gen + add < max_new_tokens)
            wpos = cur_len + i  # in range whenever emit (budget gate)
            old = tokens[rows, wpos]
            tokens = tokens.at[rows, wpos].set(jnp.where(emit, t_i, old))
            cur = jnp.where(emit, t_i, cur)
            add = add + emit.astype(jnp.int32)
            hit_eos = emit & (t_i == eos_id)
            done = done | hit_eos
            if i < chunk - 1:
                accepting = emit & ~hit_eos & (t_i == draft[:, i])
        return (cache, tokens, cur_len + add, cur, done, n_gen + add, steps + 1)

    state = (cache, tokens, cur_len, tok, done, n_gen, jnp.int32(1))
    _, tokens, _, _, _, n_gen, steps = jax.lax.while_loop(cond, body, state)
    if return_steps:
        return tokens, n_gen, steps
    return tokens, n_gen
