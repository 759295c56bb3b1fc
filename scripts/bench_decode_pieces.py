"""Decode-step cost decomposition: MoE dispatch variants and the sampling
head (ban-mask + argmax) at serving batch sizes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_ocr2_tpu.ops.moe import moe_ffn_decode, moe_ffn_dense, route
from deepseek_ocr2_tpu.ops.sampling import greedy_pick, ngram_ban_mask

ITERS_LO, ITERS_HI = 32, 160
E, H, I, K = 64, 1280, 896, 6
VOCAB = 129280


def _time_chain(make_run, *args) -> float:
    lo, hi = make_run(ITERS_LO), make_run(ITERS_HI)

    def once(fn):
        np.asarray(jax.device_get(fn(*args)))[:1]
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(once(hi) - once(lo), 1e-9) / (ITERS_HI - ITERS_LO)


def chain(body):
    def make_run(iters):
        @jax.jit
        def run(x0, *rest):
            def b(x, _):
                y = body(x, *rest)
                f = jnp.ravel(y)[:1].astype(x0.dtype) * jnp.asarray(1e-24, x0.dtype)
                return x0 + f.reshape((1,) * x0.ndim), ()

            x, _ = jax.lax.scan(b, x0, None, length=iters)
            return x

        return run

    return make_run


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}")
    experts = {
        "gate": jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02,
        "up": jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02,
        "down": jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02,
    }
    router = jax.random.normal(key, (H, E), jnp.bfloat16) * 0.1

    for b in (1, 8):
        x = jax.random.normal(key, (b, H), jnp.bfloat16)

        def slice_path(x, ex, r):
            w, i = route(x, r, K)
            return moe_ffn_decode(x, ex, w, i)

        dt = _time_chain(chain(slice_path), x, experts, router)
        print(f"moe decode slice-path  b={b}   {dt * 1e6:8.1f} us/layer (x11 = {11 * dt * 1e3:.2f} ms)")

        def dense_path(x, ex, r):
            w, i = route(x, r, K)
            return moe_ffn_dense(x, ex, w, i)

        dt = _time_chain(chain(dense_path), x, experts, router)
        print(f"moe decode dense-path  b={b}   {dt * 1e6:8.1f} us/layer")

    # Sampling head: ban-mask + argmax over the full vocab.
    for b in (1, 8):
        logits = jax.random.normal(key, (b, VOCAB), jnp.float32)
        tokens = jax.random.randint(key, (b, 2048), 0, VOCAB, jnp.int32)
        lens = jnp.full((b,), 900, jnp.int32)

        def head(logits, tokens, lens):
            ban = jax.vmap(ngram_ban_mask, in_axes=(0, 0, None, None))(
                tokens, lens, 20, VOCAB
            )
            return jax.vmap(greedy_pick)(logits, ban)[None].astype(jnp.float32)

        dt = _time_chain(chain(head), logits, tokens, lens)
        print(f"ngram-ban + argmax     b={b}   {dt * 1e6:8.1f} us/step")

        def head_noban(logits, tokens, lens):
            return jnp.argmax(logits, axis=-1)[None].astype(jnp.float32)

        dt = _time_chain(chain(head_noban), logits, tokens, lens)
        print(f"plain argmax           b={b}   {dt * 1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
