"""Bill the paged decode_chunk per-step cost + tunnel transfer curve.

The crop-serve trace shows decode_chunk at ~46 ms/step (b=8, tok_cap 1184)
vs 8.1 ms/step for the contiguous engine at tok_cap 448 — something scales
with capacity. Suspects, each timed with the difference method (two scan
lengths):

1. ngram_ban_mask (vocab-sized scatter `.at[next].max(valid)`, n_win ~ T);
2. the paged attention read itself at 10 pages/slot;
3. everything else (decode_chunk with ngram 0).

Also sweeps device_put sizes to split the ~36 MB/s page-ship cost into
per-call overhead vs true bandwidth (drives the crop-serve ship strategy).

Run manually on an idle TPU (one TPU process at a time).
"""

from __future__ import annotations

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
from deepseek_ocr2_tpu.ops.sampling import greedy_pick, ngram_ban_mask

VOCAB = 129_280


def barrier(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0]).reshape(-1)[:1]


def diff_time(fn, n_short=4, n_long=16):
    """Difference method: scan length n_long vs n_short, per-iteration s."""

    def run(n):
        out = fn(n)
        barrier(out)

    run(n_short), run(n_long)  # compile both
    t0 = time.perf_counter(); run(n_short); t_s = time.perf_counter() - t0
    t0 = time.perf_counter(); run(n_long); t_l = time.perf_counter() - t0
    return (t_l - t_s) / (n_long - n_short)


def bench_ban(b, t):
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, VOCAB, (b, t)), jnp.int32)
    cur = jnp.full((b,), t - 8, jnp.int32)
    logits = jnp.asarray(rng.standard_normal((b, VOCAB)), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnames="n")
    def loop(tokens, n):
        def step(tk, _):
            ban = jax.vmap(ngram_ban_mask, in_axes=(0, 0, None, None))(
                tk, cur, 20, VOCAB
            )
            pick = jax.vmap(greedy_pick)(logits, ban)
            tk = tk.at[:, 0].set(pick)
            return tk, None

        out, _ = jax.lax.scan(step, tokens, None, length=n)
        return out

    per = diff_time(lambda n: loop(tokens, n))
    print(f"ban+pick b={b} T={t}: {per * 1e3:7.2f} ms/step", flush=True)


def bench_decode_chunk(b, cap, ngram):
    from deepseek_ocr2_tpu.runtime.continuous import decode_chunk
    from deepseek_ocr2_tpu.runtime.paged_kv import make_paged_kv_cache, pages_for

    cfg = DeepseekV2Config()
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    page = 128
    n_pages_per = pages_for(cap, page)
    n_pages = b * n_pages_per + 1
    cache = make_paged_kv_cache(
        cfg.num_hidden_layers, n_pages, cfg.num_attention_heads, page,
        cfg.head_dim, jnp.bfloat16,
    )
    rng = np.random.default_rng(1)
    prompt = cap - 64
    tokens = jnp.asarray(rng.integers(2, VOCAB, (b, cap)), jnp.int32)
    tables = jnp.asarray(
        np.arange(1, b * n_pages_per + 1, dtype=np.int32).reshape(b, n_pages_per)
    )

    def run(n):
        out = decode_chunk(
            params,
            {k: jnp.copy(v) for k, v in cache.items()},
            jnp.copy(tokens),
            jnp.full((b,), prompt, jnp.int32),
            jnp.zeros((b,), bool),
            jnp.full((b,), cap, jnp.int32),
            tables,
            jnp.zeros((b,), jnp.int32),
            cfg,
            n_steps=n,
            ngram_size=ngram,
            eos_id=-1,
        )
        return out[4]

    per = diff_time(run, n_short=4, n_long=16)
    print(f"decode_chunk b={b} cap={cap} ngram={ngram}: {per * 1e3:7.2f} ms/step", flush=True)


def bench_transfer():
    for mb in (0.75, 3, 12.4, 24, 48):
        n = int(mb * 1e6)
        arr = np.random.default_rng(0).integers(0, 256, (n,), np.uint8)
        dev = jax.device_put(arr); barrier(dev)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            dev = jax.device_put(arr); barrier(dev)
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"device_put {mb:5.1f} MB: {dt * 1e3:7.1f} ms = {n / dt / 1e6:6.0f} MB/s", flush=True)


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    bench_transfer()
    for b, t in [(8, 448), (8, 1184), (8, 2176), (1, 1184)]:
        bench_ban(b, t)
    for b, cap, ngram in [
        (8, 448, 20), (8, 448, 0), (8, 1280, 20), (8, 1280, 0), (8, 2176, 0), (8, 2176, 20),
    ]:
        bench_decode_chunk(b, cap, ngram)


if __name__ == "__main__":
    main()
