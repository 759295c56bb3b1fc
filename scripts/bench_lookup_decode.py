"""Prompt-lookup speculative decode bench (b=1, real-model shapes).

Generates from a self-repetitive prompt (a proxy for OCR transcripts, which
repeat structure heavily) and from a random one (worst case), at chunk
widths {2, 4, 8} vs plain greedy, bf16 and int8. Reports tok/s and the
measured tokens-per-forward (acceptance). One full generation per config —
the ~30 ms dispatch floor is amortized over hundreds of steps, so plain
wall-clock is fine here (no difference method needed).
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

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.runtime.generate import greedy_generate, lookup_greedy_generate

MAX_NEW = 384
CAP = 1024


def run_one(params, cfg, ids, chunk):
    emb = jnp.take(params["embed"], ids, axis=0)
    kw = dict(
        max_new_tokens=MAX_NEW, ngram_size=0, eos_id=1, capacity=CAP,
        kv_dtype="bfloat16",
    )

    def go():
        if chunk <= 1:
            t, n = greedy_generate(params, cfg, emb, ids, **kw)
            return t, n, None
        t, n, s = lookup_greedy_generate(
            params, cfg, emb, ids, chunk=chunk, return_steps=True, **kw
        )
        return t, n, s

    t, n, s = go()
    np.asarray(t)  # warm + barrier
    t0 = time.perf_counter()
    t, n, s = go()
    n_host = int(np.asarray(n)[0])
    s_host = int(np.asarray(s)) if s is not None else n_host
    dt = time.perf_counter() - t0
    return n_host / dt, n_host / max(s_host, 1)


def main():
    cfg = OCR2Config().lm
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pattern = rng.integers(2, 1000, 12)
    prompts = {
        "repetitive": jnp.asarray(np.tile(pattern, 8)[None, :], jnp.int32),
        "random": jnp.asarray(rng.integers(2, 1000, (1, 96)), jnp.int32),
    }
    print(f"device: {jax.devices()[0]}  max_new={MAX_NEW}")
    for scope in ("bf16", "int8"):
        p = dsv2.quantize_lm_params(params, scope="full") if scope == "int8" else params
        for name, ids in prompts.items():
            for chunk in (1, 2, 4, 8):
                tps, acc = run_one(p, cfg, ids, chunk)
                tag = "plain " if chunk <= 1 else f"chunk{chunk}"
                print(f"{scope} {name:11s} {tag}  {tps:7.1f} tok/s  {acc:4.2f} tok/forward")


if __name__ == "__main__":
    main()
