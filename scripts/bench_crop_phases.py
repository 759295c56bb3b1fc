"""Phase breakdown of the crop-mode prefill (the weakest headline number).

Times SAM-global, SAM-crops, Qwen2 (both views), LM prefill, and the decode
tail separately so optimization effort goes where the milliseconds are.

Run on the TPU: python scripts/bench_crop_phases.py
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
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.models import qwen2 as qwen2_mod
from deepseek_ocr2_tpu.models import sam as sam_mod
from deepseek_ocr2_tpu.runtime.generate import greedy_generate
from deepseek_ocr2_tpu.runtime.kv_cache import bucket_capacity, make_kv_cache

B = 4  # pages
P = 2  # crops per page (2x1 grid)
MAX_NEW = 32
REPS = 3


def timed(label, fn, *args):
    out = fn(*args)
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))  # sync
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0]))
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(f"{label:28s} {dt * 1e3:8.1f} ms")
    return out, dt


def main():
    cfg = OCR2Config()
    key = jax.random.PRNGKey(0)
    params = ocr2.init_params(cfg, key, lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16)

    base = jax.random.uniform(
        key, (B, 3, cfg.base_image_size, cfg.base_image_size), jnp.bfloat16, -1, 1
    )
    crops = jax.random.uniform(
        key, (B * P, 3, cfg.crop_image_size, cfg.crop_image_size), jnp.bfloat16, -1, 1
    )

    sam_f = jax.jit(lambda p, x: sam_mod.sam_forward(p, cfg.sam, x))
    q2_f = jax.jit(lambda p, f: qwen2_mod.qwen2_encode(p, cfg.qwen2, f))

    print(f"device: {jax.devices()[0]}  B={B} pages, {P} crops each")
    feats_g, t_sam_g = timed("SAM global [4,3,1024,1024]", sam_f, params["sam"], base)
    feats_c, t_sam_c = timed("SAM crops  [8,3,768,768]", sam_f, params["sam"], crops)
    _, t_q2_g = timed("Qwen2 global (seq 512)", q2_f, params["qwen2"], feats_g)
    _, t_q2_c = timed("Qwen2 crops  (seq 288)", q2_f, params["qwen2"], feats_c)

    n_img = cfg.image_token_count((2, 1))
    ids = np.asarray(
        [cfg.bos_token_id] + [cfg.image_token_id] * n_img + [185, 14689, 6192, 13],
        np.int32,
    )
    s = len(ids)
    ids_b = jnp.asarray(np.tile(ids, (B, 1)))
    cap = bucket_capacity(s + MAX_NEW)
    embeds = jax.random.normal(key, (B, s, cfg.lm.hidden_size), jnp.bfloat16)

    @jax.jit
    def lm_prefill(lm, embeds):
        cache = make_kv_cache(
            cfg.lm.num_hidden_layers, B, cfg.lm.num_attention_heads, cap,
            cfg.lm.head_dim, dtype=jnp.bfloat16,
        )
        hidden, cache = dsv2.lm_forward(lm, cfg.lm, embeds, cache, pos=0, is_prefill=True)
        return dsv2.logits_last(lm, hidden)

    _, t_lm = timed(f"LM prefill (S={s})", lm_prefill, params["lm"], embeds)

    def decode(lm, embeds):
        toks, _ = greedy_generate(
            lm, cfg.lm, embeds, ids_b, max_new_tokens=MAX_NEW, ngram_size=20,
            eos_id=cfg.eos_token_id, capacity=cap, kv_dtype="bfloat16",
        )
        return toks[:, -1]

    _, t_all = timed(f"prefill+decode {MAX_NEW}", decode, params["lm"], embeds)
    t_dec = t_all - t_lm

    total = t_sam_g + t_sam_c + t_q2_g + t_q2_c + t_lm + t_dec
    print(f"{'decode tail (diff)':28s} {t_dec * 1e3:8.1f} ms")
    print(f"{'sum':28s} {total * 1e3:8.1f} ms -> {B / total:.2f} pages/s")


if __name__ == "__main__":
    main()
