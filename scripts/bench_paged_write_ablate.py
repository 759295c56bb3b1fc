"""Isolate the paged-pool per-step cost: scatter write vs DUS write vs none.

decode_chunk costs ~25 us/step per token of POOL capacity (bench_serve_
suspects) — linear in pool size, ngram-independent: the signature of a
full pool copy per step. The suspect is the traced-index KV scatter
`pool.at[li, page_ids, :, off, :].set(...)` defeating scan-carry aliasing
(the same trap the contiguous path hit in r3; fixed there with a
one-timestep DUS). This bench scans ONE layer's attention step over the
pool at several capacities with:

  scatter : the current per-(row) page/offset scatter write
  dus     : a python loop of per-row dynamic_update_slices (aliasable)
  none    : no KV write at all (read-only attention)

If scatter shows the linear-in-capacity term and dus/none are flat, the
fix is mechanical. Run manually on an idle TPU.
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
from deepseek_ocr2_tpu.ops.paged_attention import paged_decode_attention_pool

B = 8
PAGE = 128


def barrier(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def diff_time(fn, n_short=8, n_long=64):
    def run(n):
        barrier(fn(n))

    run(n_short), run(n_long)
    t0 = time.perf_counter(); run(n_short); t_s = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n_long); t_l = time.perf_counter() - t0
    return (t_l - t_s) / (n_long - n_short)


def bench(cap, mode):
    cfg = DeepseekV2Config()
    nh, d = cfg.num_attention_heads, cfg.head_dim
    n_pages_per = cap // PAGE
    n_pages = B * n_pages_per + 1
    rng = np.random.default_rng(0)
    k_pool = jnp.asarray(
        rng.standard_normal((cfg.num_hidden_layers, n_pages, nh, PAGE, d)) * 0.1,
        jnp.bfloat16,
    )
    v_pool = jnp.asarray(np.asarray(k_pool))  # same shape/content is fine
    tables = jnp.asarray(
        np.arange(1, B * n_pages_per + 1, dtype=np.int32).reshape(B, n_pages_per)
    )
    pos = jnp.full((B,), cap - 32, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, nh, d)), jnp.float32)
    knew = jnp.asarray(rng.standard_normal((B, nh, d)) * 0.1, jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames="n")
    def loop(k_pool, v_pool, n):
        rows = jnp.arange(B)
        page_ids = tables[rows, pos // PAGE]
        off = pos % PAGE

        def step(carry, _):
            kp, vp = carry
            li = jnp.int32(0)
            if mode == "scatter":
                kp = kp.at[li, page_ids, :, off, :].set(knew)
                vp = vp.at[li, page_ids, :, off, :].set(knew)
            elif mode == "dus":
                for r in range(B):
                    kp = jax.lax.dynamic_update_slice(
                        kp, knew[r].astype(kp.dtype)[None, None, :, None, :],
                        (li, page_ids[r], 0, off[r], 0),
                    )
                    vp = jax.lax.dynamic_update_slice(
                        vp, knew[r].astype(vp.dtype)[None, None, :, None, :],
                        (li, page_ids[r], 0, off[r], 0),
                    )
            ctx = paged_decode_attention_pool(
                q, kp, vp, tables, pos + 1, li, scale=0.088
            )
            return (kp, vp), jnp.sum(ctx)

        (kp, vp), s = jax.lax.scan(step, (k_pool, v_pool), None, length=n)
        return s

    per = diff_time(lambda n: loop(k_pool, v_pool, n))
    print(f"cap={cap:5d} mode={mode:8s}: {per * 1e6:9.1f} us/step", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    for cap in (448, 1280, 2176):
        for mode in ("scatter", "dus", "none"):
            bench(cap, mode)


if __name__ == "__main__":
    main()
