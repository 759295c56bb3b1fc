"""Continuous-batching OCR engine.

Long-output multi-page serving (BASELINE configs #4/#5): a fixed pool of
decode slots shares one KV cache; pages are admitted into free slots as
others finish, so encoder prefill and decode overlap across pages and the
decoder never idles on stragglers. The reference has nothing comparable
(batch=1, deepseek_ocr2.rs:140).

Device/host split:
- admission (per page): vision prefill + LM prefill into a private cache,
  then a slot-insert jit copies the prompt KV into the shared cache;
- decoding: `decode_chunk` advances ALL active slots `chunk` steps in one
  dispatch (per-slot positions, per-slot n-gram ban, per-slot EOS/budget);
  the host only reads back the done flags between chunks.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from ..configs import DeepseekV2Config
from ..models import deepseek_v2 as dsv2
from ..ops.sampling import greedy_pick, ngram_ban_mask
from ..utils.tokenizer import decode_output, tokenize_with_image
from .kv_cache import make_kv_cache
from .pipeline import GenerationResult, OCR2Pipeline


@functools.partial(
    jax.jit, static_argnames=("cfg", "capacity", "kv_dtype", "ngram_size", "eos_id")
)
def admit_prefill(
    lm_params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [1, S, H]
    prompt_ids: jnp.ndarray,  # [S]
    *,
    capacity: int,
    kv_dtype: str,
    ngram_size: int,
    eos_id: int,
):
    """Prefill one page. Returns (k [L,1,Hh,cap,D], v, first_tok scalar)."""
    cache = make_kv_cache(
        cfg.num_hidden_layers,
        1,
        cfg.num_attention_heads,
        capacity,
        cfg.head_dim,
        dtype=jnp.dtype(kv_dtype),
    )
    hidden, cache = dsv2.lm_forward(lm_params, cfg, embeds, cache, pos=0, is_prefill=True)
    logits = dsv2.logits_last(lm_params, hidden)[0]
    s = embeds.shape[1]
    vocab = logits.shape[-1]
    buf = jnp.zeros((capacity,), jnp.int32)
    buf = jax.lax.dynamic_update_slice(buf, prompt_ids.astype(jnp.int32), (0,))
    ban = ngram_ban_mask(buf, jnp.int32(s), ngram_size, vocab)
    tok = greedy_pick(logits, ban)
    return cache["k"], cache["v"], tok


@functools.partial(jax.jit, donate_argnums=(0,))
def insert_slot(cache, k_new, v_new, slot, tokens, slot_tokens, cur_len, limit,
                done0, state_cur_lens, state_limits, state_done):
    """Copy an admitted page's KV + token buffer into shared state at `slot`.

    `done0` freezes slots whose first generated token already hits the stop
    condition (EOS on the prefill token, or max_new_tokens == 1), matching
    greedy_generate's post-prefill done check.
    """
    cache = {
        "k": jax.lax.dynamic_update_slice(
            cache["k"], k_new, (0, slot, 0, 0, 0)
        ),
        "v": jax.lax.dynamic_update_slice(
            cache["v"], v_new, (0, slot, 0, 0, 0)
        ),
    }
    tokens = jax.lax.dynamic_update_slice(tokens, slot_tokens[None], (slot, 0))
    state_cur_lens = state_cur_lens.at[slot].set(cur_len)
    state_limits = state_limits.at[slot].set(limit)
    state_done = state_done.at[slot].set(done0)
    return cache, tokens, state_cur_lens, state_limits, state_done


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_steps", "ngram_size", "eos_id"),
    donate_argnums=(1, 2),
)
def decode_chunk(
    lm_params,
    cache,
    tokens: jnp.ndarray,  # [B, cap] i32
    cur_lens: jnp.ndarray,  # [B] valid token counts
    done: jnp.ndarray,  # [B] bool
    limits: jnp.ndarray,  # [B] stop length (prompt + max_new)
    cfg: DeepseekV2Config,
    *,
    n_steps: int,
    ngram_size: int,
    eos_id: int,
):
    """Advance all active slots by up to n_steps decode steps (one dispatch)."""
    b, cap = tokens.shape
    vocab = dsv2.vocab_size_of(lm_params)
    rows = jnp.arange(b)
    ban_fn = jax.vmap(ngram_ban_mask, in_axes=(0, 0, None, None))

    def step(state, _):
        cache, tokens, cur_lens, done = state
        active = ~done
        last = tokens[rows, jnp.clip(cur_lens - 1, 0, cap - 1)]
        emb = jnp.take(lm_params["embed"], last, axis=0)[:, None, :]
        pos = jnp.clip(cur_lens - 1, 0, cap - 1)
        hidden, cache = dsv2.lm_decode_step_ragged(lm_params, cfg, emb, cache, pos)
        logits = dsv2.logits_last(lm_params, hidden)  # [B, V]
        ban = ban_fn(tokens, cur_lens, ngram_size, vocab)
        nxt = jax.vmap(greedy_pick)(logits, ban)
        nxt = jnp.where(active, nxt, last)
        widx = jnp.clip(cur_lens, 0, cap - 1)
        old = tokens[rows, widx]
        tokens = tokens.at[rows, widx].set(jnp.where(active, nxt, old))
        newly_done = active & ((nxt == eos_id) | (cur_lens + 1 >= limits))
        cur_lens = cur_lens + active.astype(jnp.int32)
        done = done | newly_done
        return (cache, tokens, cur_lens, done), None

    (cache, tokens, cur_lens, done), _ = jax.lax.scan(
        step, (cache, tokens, cur_lens, done), None, length=n_steps
    )
    return cache, tokens, cur_lens, done


class ContinuousOCREngine:
    """Slot-based continuous batching over the OCR pipeline."""

    def __init__(
        self,
        pipe: OCR2Pipeline,
        slots: int = 8,
        capacity: int = 2048,
        chunk_steps: int = 32,
    ):
        self.pipe = pipe
        self.slots = slots
        self.capacity = capacity
        self.chunk_steps = chunk_steps

    def run(
        self,
        images: Sequence[Union[str, Image.Image]],
        prompt: Optional[str] = None,
        max_new_tokens: int = 512,
        no_crop: bool = False,
        ngram_size: int = 20,
        auto_rotate: bool = False,
    ) -> List[GenerationResult]:
        pipe = self.pipe
        cfg = pipe.cfg
        lm = pipe.params["lm"]
        lm_cfg = cfg.lm
        b, cap = self.slots, self.capacity
        prompt = prompt or cfg.default_ocr_prompt
        eos = cfg.eos_token_id

        cache = make_kv_cache(
            lm_cfg.num_hidden_layers,
            b,
            lm_cfg.num_attention_heads,
            cap,
            lm_cfg.head_dim,
            dtype=jnp.dtype(pipe.kv_dtype),
        )
        tokens = jnp.zeros((b, cap), jnp.int32)
        cur_lens = jnp.zeros((b,), jnp.int32)
        limits = jnp.zeros((b,), jnp.int32)
        done = jnp.ones((b,), bool)  # empty slots count as done

        pending = list(range(len(images)))
        slot_page: Dict[int, int] = {}
        prompt_lens: Dict[int, int] = {}
        results: List[Optional[GenerationResult]] = [None] * len(images)

        def admit(slot: int, page_idx: int):
            nonlocal cache, tokens, cur_lens, limits, done
            image_base, patches, crop_ratio, _ = pipe.preprocess_image(
                images[page_idx], no_crop=no_crop, auto_rotate=auto_rotate
            )
            ids, _, image_start = tokenize_with_image(
                pipe.tokenizer, prompt, cfg, crop_ratio
            )
            s = len(ids)
            assert s + max_new_tokens <= cap, "engine capacity too small"
            embeds = pipe.build_ocr_embeds(ids, image_base, patches, image_start)
            ids_j = jnp.asarray(ids, jnp.int32)
            k_new, v_new, first = admit_prefill(
                lm,
                lm_cfg,
                embeds,
                ids_j,
                capacity=cap,
                kv_dtype=pipe.kv_dtype,
                ngram_size=ngram_size,
                eos_id=eos,
            )
            slot_tokens = jnp.zeros((cap,), jnp.int32)
            slot_tokens = jax.lax.dynamic_update_slice(slot_tokens, ids_j, (0,))
            slot_tokens = slot_tokens.at[s].set(first)
            done0 = jnp.logical_or(first == eos, max_new_tokens <= 1)
            cache, tokens, cur_lens, limits, done = insert_slot(
                cache,
                k_new,
                v_new,
                jnp.int32(slot),
                tokens,
                slot_tokens,
                jnp.int32(s + 1),
                jnp.int32(s + max_new_tokens),
                done0,
                cur_lens,
                limits,
                done,
            )
            slot_page[slot] = page_idx
            prompt_lens[slot] = s

        def harvest():
            """Read back done flags; finalize finished slots."""
            nonlocal cache, tokens, cur_lens, done
            done_h = np.asarray(done)
            lens_h = np.asarray(cur_lens)
            for slot in list(slot_page):
                if done_h[slot]:
                    page_idx = slot_page.pop(slot)
                    total = int(lens_h[slot])
                    all_ids = np.asarray(tokens[slot, :total]).tolist()
                    p_len = prompt_lens.pop(slot)
                    gen_ids = all_ids[p_len:]
                    text = decode_output(pipe.tokenizer, gen_ids, cfg.stop_string)
                    results[page_idx] = GenerationResult(
                        text=text,
                        token_ids=all_ids,
                        prompt_len=p_len,
                        prefill_seconds=0.0,
                        decode_seconds=0.0,
                        new_tokens=len(gen_ids),
                    )

        while pending or slot_page:
            # Fill free slots.
            free = [s for s in range(b) if s not in slot_page]
            while pending and free:
                admit(free.pop(), pending.pop(0))
            # Advance all active slots one chunk.
            if slot_page:
                cache, tokens, cur_lens, done = decode_chunk(
                    lm,
                    cache,
                    tokens,
                    cur_lens,
                    done,
                    limits,
                    lm_cfg,
                    n_steps=self.chunk_steps,
                    ngram_size=ngram_size,
                    eos_id=eos,
                )
            harvest()

        return results  # type: ignore[return-value]
