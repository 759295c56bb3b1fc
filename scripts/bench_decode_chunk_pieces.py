"""Bill decode_chunk's remaining per-step capacity slope (post DUS fix).

At cap 2176 (b=8, bf16) the step costs ~16 ms vs ~9 at cap 448; known
capacity-dependent terms only explain ~1.5 ms of the 7 ms delta (KV read
1.07 GB/step ~1.4 ms, ban ~0.3, DUS writes ~0.2). This ablation toggles
the suspects inside a faithful reimplementation of the decode_chunk scan
body at both capacities:

  full      — mirrors decode_chunk
  ngram0    — ban off
  no_write  — _pool_write_rows patched to identity (read + attention kept)
  no_read   — paged_decode_attention_pool patched to zeros (write kept)
  no_attn   — whole _paged_attention_step replaced by identity

Deltas between rows at each capacity attribute the slope. Run on an idle
TPU; distrust rows from sessions where lm_head q4 reads far off 96 us.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_ocr2_tpu.configs import DeepseekV2Config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime import paged_kv
from deepseek_ocr2_tpu.runtime.paged_kv import make_paged_kv_cache, pages_for
from deepseek_ocr2_tpu.ops.sampling import greedy_pick, ngram_ban_mask

B = 8
PAGE = int(os.environ.get("DEEPSEEK_BENCH_PAGE", "128"))
VOCAB = 129_280


def barrier(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def diff_time(fn, n_short=4, n_long=16):
    def run(n):
        barrier(fn(n))

    run(n_short), run(n_long)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter(); run(n_short); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); run(n_long); t_l = time.perf_counter() - t0
        ts.append((t_l - t_s) / (n_long - n_short))
    return min(ts)


def bench(cfg, params, cap, mode):
    n_pages_per = pages_for(cap, PAGE)
    n_pages = B * n_pages_per + 1
    cache = make_paged_kv_cache(
        cfg.num_hidden_layers, n_pages, cfg.num_attention_heads, PAGE,
        cfg.head_dim, jnp.bfloat16,
    )
    rng = np.random.default_rng(1)
    prompt = cap - 64
    tokens0 = jnp.asarray(rng.integers(2, VOCAB, (B, cap)), jnp.int32)
    tables = jnp.asarray(
        np.arange(1, B * n_pages_per + 1, dtype=np.int32).reshape(B, n_pages_per)
    )
    ngram = 0 if mode == "ngram0" else 20

    orig_write = paged_kv._pool_write_rows
    orig_read = paged_kv.paged_decode_attention_pool
    orig_step = paged_kv._paged_attention_step
    try:
        if mode == "no_write":
            paged_kv._pool_write_rows = lambda pool, vals, li, p, o: pool
        elif mode == "no_read":
            paged_kv.paged_decode_attention_pool = (
                lambda q, k, v, bt, sl, li, scale: jnp.zeros(
                    (q.shape[0], q.shape[1] * q.shape[2]), jnp.float32
                ).reshape(q.shape[0], q.shape[1], q.shape[2])
            )
        elif mode == "no_attn":
            paged_kv._paged_attention_step = (
                lambda xn, attn, cfg2, kv, li, bt, pos, cos_b, sin_b, rp: (xn, kv)
            )

        @functools.partial(jax.jit, static_argnames="n", donate_argnums=(1, 2))
        def loop(params, cache, tokens, n):
            rows = jnp.arange(B)
            cur0 = jnp.full((B,), prompt, jnp.int32)

            def step(state, _):
                cache, tokens, cur = state
                last = tokens[rows, jnp.clip(cur - 1, 0, cap - 1)]
                emb = jnp.take(params["embed"], last, axis=0)[:, None, :]
                pos = jnp.clip(cur - 1, 0, cap - 1)
                hidden, cache = paged_kv.lm_decode_step_paged(
                    params, cfg, emb, cache, tables, pos
                )
                logits = dsv2.logits_last(params, hidden)
                ban = jax.vmap(ngram_ban_mask, in_axes=(0, 0, None, None))(
                    tokens, cur, ngram, VOCAB
                )
                nxt = jax.vmap(greedy_pick)(logits, ban)
                tokens = tokens.at[rows, jnp.clip(cur, 0, cap - 1)].set(nxt)
                return (cache, tokens, cur), None

            (cache, tokens, cur), _ = jax.lax.scan(
                step, (cache, tokens, cur0), None, length=n
            )
            # Touch the cache so the KV writes can't be dead-code-eliminated
            # (tokens alone would leave the final carry unused).
            probe = sum(
                jnp.sum(v[:, :1, :1, :1].astype(jnp.float32))
                for v in cache.values()
            )
            return tokens, probe

        per = diff_time(
            lambda n: loop(
                params, {k: jnp.copy(v) for k, v in cache.items()}, jnp.copy(tokens0), n
            )
        )
        print(f"cap={cap:5d} {mode:9s}: {per * 1e3:8.2f} ms/step", flush=True)
    finally:
        paged_kv._pool_write_rows = orig_write
        paged_kv.paged_decode_attention_pool = orig_read
        paged_kv._paged_attention_step = orig_step


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    cfg = DeepseekV2Config()
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    for cap in (448, 2176):
        for mode in ("full", "ngram0", "no_write", "no_read", "no_attn"):
            bench(cfg, params, cap, mode)


if __name__ == "__main__":
    main()
