"""Where does serve time go? One traced continuous-engine run.

Sets DEEPSEEK_DEBUG_SERVE=1 and runs the exact bench.py serve workload
(16 real PIL pages, no-crop, 32 new tokens, 8 slots), printing per-phase
lines: serve.preprocess / serve.admit / serve.iter grow+admit/decode/
harvest. The sum of those phases vs wall time exposes anything untracked.

Run manually on an idle TPU (one TPU process at a time).
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


def main():
    cfg = OCR2Config()
    print(f"device: {jax.devices()[0]}", flush=True)
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    tok = Tokenizer(
        models.WordLevel({"<unk>": 2, "Free": 10, "OCR.": 11}, unk_token="<unk>")
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()

    rng = np.random.default_rng(7)
    pages = [
        Image.fromarray(rng.integers(0, 256, (960, 1280, 3), np.uint8))
        for _ in range(16)
    ]
    pipe = OCR2Pipeline(params, cfg, tok, kv_dtype="bfloat16")
    engine = ContinuousOCREngine(
        pipe, slots=8, capacity=bucket_capacity(262 + MAX_NEW), chunk_steps=16
    )

    def run():
        return engine.run(
            pages,
            prompt="<image> Free OCR.",
            max_new_tokens=MAX_NEW,
            no_crop=True,
            ngram_size=NGRAM,
        )

    print("--- warmup ---", flush=True)
    run()
    print("--- traced run ---", flush=True)
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(f"[16 pages in {dt:.2f}s = {16 / dt:.2f} pages/s]", flush=True)


if __name__ == "__main__":
    main()
