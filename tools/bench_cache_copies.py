"""Microbench: does the per-step KV reassembly (scan xs slice + ys stack +
dense/moe concat) cost real HBM traffic, and does carrying the pool in place
fix it?

Times one paged decode step at several pool sizes with the current
lm_decode_step_paged. If step time grows ~linearly with pool size while the
attended tokens stay fixed, the step is copying the pool.

Run on the TPU: python tools/bench_cache_copies.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime.paged_kv import (
    lm_decode_step_paged,
    make_paged_kv_cache,
    pages_for,
)

cfg = OCR2Config().lm
B = 8
PAGE = 128
SEQ = 300  # tokens actually attended per slot


def step_fn(params, emb, cache, bt, pos):
    hidden, cache = lm_decode_step_paged(params, cfg, emb, cache, bt, pos)
    return hidden, cache


jit_step = jax.jit(step_fn, static_argnames=(), donate_argnums=(2,))


def run(pool_tokens):
    num_pages = pages_for(pool_tokens, PAGE) + 1
    cache = make_paged_kv_cache(
        cfg.num_hidden_layers, num_pages, cfg.num_attention_heads, PAGE, cfg.head_dim
    )
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    max_pages = pages_for(2048, PAGE)
    bt = np.zeros((B, max_pages), np.int32)
    need = pages_for(SEQ + 1, PAGE)
    nxt = 1
    for b in range(B):
        bt[b, :need] = np.arange(nxt, nxt + need)
        nxt += need
    bt = jnp.asarray(bt)
    pos = jnp.full((B,), SEQ, jnp.int32)
    emb = jnp.ones((B, 1, cfg.hidden_size), jnp.bfloat16)

    hidden, cache = jit_step(params, emb, cache, bt, pos)
    np.asarray(hidden)  # barrier (block_until_ready no-op on axon)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        hidden, cache = jit_step(params, emb, cache, bt, pos)
    np.asarray(hidden)
    dt = (time.perf_counter() - t0) / iters
    gb = np.prod(cache["k"].shape) * 2 * 2 / 1e9
    print(f"pool={pool_tokens:6d} tok  cache={gb:5.2f} GB (k+v)  step={dt*1e3:7.2f} ms")
    del cache, params


for pool in (2048, 8192, 32768):
    run(pool)
