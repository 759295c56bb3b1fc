"""Continuous-engine decode bench: plain chunks vs prompt-lookup chunks.

Isolates the decode side of the continuous paged engine at serving shapes
(B slots over the paged pool, real-model LM): one dispatch of
`decode_chunk` (n_steps 1-token steps) vs `decode_chunk_lookup`
(n_steps/chunk speculative chunk forwards with the same worst-case token
budget). Token history is a repetitive pattern (the OCR-transcript proxy
bench_lookup_decode.py uses) and a random one (worst case). Reports
tokens/s emitted per dispatch and the measured tokens-per-forward.

Plain wall-clock per dispatch is fine (hundreds of device steps amortize
the ~30 ms dispatch floor); np.asarray on the packed status vector is the
barrier (block_until_ready does not sync on this platform).
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
from deepseek_ocr2_tpu.runtime.continuous import decode_chunk, decode_chunk_lookup
from deepseek_ocr2_tpu.runtime.paged_kv import make_paged_kv_cache, pages_for

B = 8
TOK_CAP = 1024
PAGE = 128
PROMPT = 897
BUDGET = 128  # tokens per dispatch (worst case)


def fresh_state(cfg, pattern: np.ndarray | None, seed: int, kv_dtype="bfloat16"):
    """Paged pool + slot state for B rows at PROMPT tokens each."""
    rng = np.random.default_rng(seed)
    toks = np.zeros((B, TOK_CAP), np.int32)
    for b in range(B):
        if pattern is None:
            toks[b, : PROMPT + 1] = rng.integers(2, 1000, PROMPT + 1)
        else:
            reps = np.tile(pattern, -(-(PROMPT + 1) // len(pattern)))
            toks[b, : PROMPT + 1] = reps[: PROMPT + 1]
    n_pages_per = pages_for(TOK_CAP, PAGE)
    cache = make_paged_kv_cache(
        cfg.num_hidden_layers, B * n_pages_per + 1, cfg.num_attention_heads,
        PAGE, cfg.head_dim, jnp.dtype(kv_dtype),
    )
    tables = np.arange(1, B * n_pages_per + 1, dtype=np.int32).reshape(B, n_pages_per)
    return (
        cache,
        jnp.asarray(toks),
        jnp.full((B,), PROMPT + 1, jnp.int32),
        jnp.zeros((B,), bool),
        jnp.full((B,), TOK_CAP, jnp.int32),
        jnp.asarray(tables),
        jnp.zeros((B,), jnp.int32),
    )


def run_one(params, cfg, pattern, chunk: int, kv_dtype="bfloat16"):
    def go():
        cache, toks, lens, done, limits, tables, seeds = fresh_state(
            cfg, pattern, seed=1, kv_dtype=kv_dtype
        )
        if chunk <= 1:
            out = decode_chunk(
                params, cache, toks, lens, done, limits, tables, seeds, cfg,
                n_steps=BUDGET, ngram_size=0, eos_id=1,
            )
            forwards = BUDGET
        else:
            out = decode_chunk_lookup(
                params, cache, toks, lens, done, limits, tables, cfg,
                n_steps=BUDGET // chunk, chunk=chunk, match_n=3,
                ngram_size=0, eos_id=1,
            )
            forwards = None
        status = np.asarray(out[4])  # barrier
        emitted = int(status[:B].sum()) - B * (PROMPT + 1)
        if forwards is None:
            forwards = int(status[2 * B])
        return emitted, forwards

    go()  # compile + warm
    t0 = time.perf_counter()
    emitted, forwards = go()
    dt = time.perf_counter() - t0
    return emitted / dt, emitted / (B * max(forwards, 1))


def main():
    cfg = OCR2Config().lm
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    pattern = rng.integers(2, 1000, 12)
    print(f"device: {jax.devices()[0]}  B={B} prompt={PROMPT} budget={BUDGET}")
    scopes = sys.argv[1:] or ["bf16", "int8", "int4"]
    for scope in scopes:
        p = (
            dsv2.quantize_lm_params(params, scope="full", bits=4)
            if scope == "int4"
            else dsv2.quantize_lm_params(params, scope="full")
            if scope == "int8"
            else params
        )
        for kv in ("bfloat16", "int8"):
            for name, pat in (("repetitive", pattern), ("random", None)):
                for chunk in (1, 2, 4):
                    tps, acc = run_one(p, cfg, pat, chunk, kv_dtype=kv)
                    tag = "plain " if chunk <= 1 else f"chunk{chunk}"
                    print(
                        f"{scope} kv={kv:8s} {name:11s} {tag}  {tps:8.1f} tok/s  "
                        f"{acc:4.2f} tok/forward"
                    )


if __name__ == "__main__":
    main()
