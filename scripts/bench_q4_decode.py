"""End-to-end decode tok/s: bf16 vs int8 vs int4 at the full LM config.

LM-only (text prompt, no vision) so the difference-method window isolates
decode. Run manually on an idle TPU (one TPU process at a time).
Expected from the kernel rooflines: int4 weight bytes/token ~ 0.30 GB vs
0.57 int8 / 1.08 bf16 -> q4 b=1 ceiling ~2x int8 if the unpack stays
DMA-hidden.
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
from deepseek_ocr2_tpu.runtime.generate import greedy_generate
from deepseek_ocr2_tpu.runtime.kv_cache import bucket_capacity

PROMPT_LEN = 266  # matches bench.py's no-crop prompt scale
NGRAM = 20


def measure(lm_params, cfg, ids_b, b, cap):
    def run(max_new):
        embeds = jnp.take(
            lm_params["embed"], ids_b[:b], axis=0
        )
        tokens, _ = greedy_generate(
            lm_params, cfg, embeds, ids_b[:b],
            max_new_tokens=max_new, ngram_size=NGRAM, eos_id=1,
            capacity=cap, kv_dtype="bfloat16",
        )
        return np.asarray(tokens[:, -1])

    run(8)
    run(136)
    t0 = time.perf_counter()
    run(8)
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    run(136)
    t_long = time.perf_counter() - t0
    return b * 128.0 / max(t_long - t_short, 1e-9)


def main():
    cfg = DeepseekV2Config()
    print(f"device: {jax.devices()[0]}")
    params = dsv2.init_params(cfg, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    ids_b = jnp.asarray(
        rng.integers(2, cfg.vocab_size, (8, PROMPT_LEN)), jnp.int32
    )
    cap = bucket_capacity(PROMPT_LEN + 160)

    for name, maker in (
        ("bf16", lambda: params),
        ("int8", lambda: dsv2.quantize_lm_params(params, scope="full", bits=8)),
        ("int4", lambda: dsv2.quantize_lm_params(params, scope="full", bits=4)),
    ):
        lm = maker()
        for b in (1, 8):
            tps = measure(lm, cfg, ids_b, b, cap)
            print(f"{name} b={b}: {tps:8.1f} tok/s")
        del lm


if __name__ == "__main__":
    main()
