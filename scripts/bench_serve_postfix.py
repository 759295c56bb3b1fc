"""Post-DUS-fix serving validation: decode_chunk cost + crop/no-crop serve.

One TPU process (one device claim): runs the decode_chunk per-step bench
at three capacities, then the traced crop-mode serve (16 x 2200x1700
pages) and the bench.py no-crop serve workload (16 x 960x1280). Compare
against the pre-fix numbers in docs/DESIGN.md (decode_chunk 21.9/42.6/65.5
ms/step at cap 448/1280/2176; crop serve 1.78 pages/s; no-crop serve
~4.3-4.8).

Run manually on an idle TPU.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["DEEPSEEK_DEBUG_SERVE"] = "1"

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tokenizers import Tokenizer, models, pre_tokenizers

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2
from deepseek_ocr2_tpu.runtime.continuous import ContinuousOCREngine
from deepseek_ocr2_tpu.runtime.kv_cache import bucket_capacity
from deepseek_ocr2_tpu.runtime.pipeline import OCR2Pipeline

MAX_NEW = 32
NGRAM = 20


def make_tok():
    tok = Tokenizer(
        models.WordLevel({"<unk>": 2, "Free": 10, "OCR.": 11}, unk_token="<unk>")
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    return tok


def serve_run(params, cfg, pages, no_crop, capacity):
    pipe = OCR2Pipeline(params, cfg, make_tok(), kv_dtype="bfloat16")
    engine = ContinuousOCREngine(
        pipe, slots=8, capacity=capacity, chunk_steps=16
    )

    def run():
        return engine.run(
            pages,
            prompt="<image> Free OCR.",
            max_new_tokens=MAX_NEW,
            no_crop=no_crop,
            ngram_size=NGRAM,
        )

    label = "no-crop" if no_crop else "crop"
    print(f"--- serve {label} warmup ---", flush=True)
    run()
    print(f"--- serve {label} traced ---", flush=True)
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    pps = len(pages) / dt
    print(f"[serve {label}: {len(pages)} pages in {dt:.2f}s = {pps:.2f} pages/s]", flush=True)
    return pps


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    from bench_serve_suspects import bench_decode_chunk

    print(f"device: {jax.devices()[0]}", flush=True)
    for b, cap, ngram in [(8, 448, 20), (8, 1280, 20), (8, 2176, 20)]:
        bench_decode_chunk(b, cap, ngram)

    cfg = OCR2Config()
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(7)
    crop_pages = [
        Image.fromarray(rng.integers(0, 256, (2200, 1700, 3), np.uint8))
        for _ in range(16)
    ]
    serve_run(params, cfg, crop_pages, False, bucket_capacity(1126 + MAX_NEW))
    nocrop_pages = [
        Image.fromarray(rng.integers(0, 256, (960, 1280, 3), np.uint8))
        for _ in range(16)
    ]
    serve_run(params, cfg, nocrop_pages, True, bucket_capacity(262 + MAX_NEW))


if __name__ == "__main__":
    main()
