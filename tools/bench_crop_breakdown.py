"""Crop-mode prefill breakdown: where does the time go?

Times each stage of the crop-mode (2x1 grid, batch 4) vision prefill on the
real chip — SAM on the crops batch, SAM on the global batch, Qwen2 at both
sequence lengths, the LM prefill — so kernel work (e.g. the SAM padded-window
Pallas path) can be attributed. np.asarray on a small slice is the barrier
(block_until_ready does not sync on the tunneled platform).
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.models import qwen2 as qwen2_mod
from deepseek_ocr2_tpu.models import sam as sam_mod
from deepseek_ocr2_tpu.runtime.kv_cache import bucket_capacity, make_kv_cache

B = 4  # pages
P = 2  # crops per page (2x1 grid)


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    ms = float(np.median(ts)) * 1e3
    print(f"{name:34s} {ms:9.2f} ms")
    return ms


def main() -> None:
    cfg = OCR2Config()
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )

    crops = jax.random.uniform(
        jax.random.PRNGKey(1), (B * P, 3, cfg.crop_image_size, cfg.crop_image_size),
        jnp.bfloat16, minval=-1, maxval=1,
    )
    base = jax.random.uniform(
        jax.random.PRNGKey(2), (B, 3, cfg.base_image_size, cfg.base_image_size),
        jnp.bfloat16, minval=-1, maxval=1,
    )

    sam_f = jax.jit(lambda p, x: sam_mod.sam_forward(p, cfg.sam, x))
    q2_f = jax.jit(lambda p, f: qwen2_mod.qwen2_encode(p, cfg.qwen2, f))

    t_sam_crop = timed("SAM crops   [8, 768^2]", sam_f, params["sam"], crops)
    t_sam_base = timed("SAM global  [4, 1024^2]", sam_f, params["sam"], base)

    feats_crop = sam_f(params["sam"], crops)
    feats_base = sam_f(params["sam"], base)
    t_q2_crop = timed("Qwen2 crops  (seq 288)", q2_f, params["qwen2"], feats_crop)
    t_q2_base = timed("Qwen2 global (seq 512)", q2_f, params["qwen2"], feats_base)

    # LM prefill at the crop-mode sequence length.
    n_img = cfg.image_token_count((2, 1))
    ids = np.asarray(
        [cfg.bos_token_id] + [cfg.image_token_id] * n_img + [185, 14689, 6192, 13],
        np.int32,
    )
    cap = bucket_capacity(len(ids) + 32)
    ids_b = jnp.asarray(np.tile(ids, (B, 1)))

    @jax.jit
    def lm_prefill(lm, embeds):
        cache = make_kv_cache(
            cfg.lm.num_hidden_layers, B, cfg.lm.num_attention_heads, cap,
            cfg.lm.head_dim, dtype=jnp.bfloat16,
        )
        hidden, _ = dsv2.lm_forward(lm, cfg.lm, embeds, cache, pos=0, is_prefill=True)
        return dsv2.logits_last(lm, hidden)

    embeds = jnp.take(params["lm"]["embed"], ids_b, axis=0)
    t_lm = timed(f"LM prefill  [4, {len(ids)}]", lm_prefill, params["lm"], embeds)

    @jax.jit
    def full_vision(p, ids_chunk, imgs, patches):
        return ocr2.ocr_prefill_embeds_batched(p, cfg, ids_chunk, imgs, patches, 1)

    patches = crops.reshape(B, P, 3, cfg.crop_image_size, cfg.crop_image_size)
    t_all = timed("full vision prefill (jit)", full_vision, params, ids_b, base, patches)

    total_parts = t_sam_crop + t_sam_base + t_q2_crop + t_q2_base + t_lm
    print(f"{'sum of parts (excl. fusion)':34s} {total_parts:9.2f} ms")
    print(f"{'pages/s at this prefill + decode':34s} "
          f"{B / ((t_all + t_lm) / 1e3):9.2f} (prefill-only bound)")


if __name__ == "__main__":
    main()
