"""Serve-path pages/s: host PIL preprocessing vs device-side resize.

The continuous engine on real PIL images is the only metric that pays for
host pixel work; on this 1-core host the PIL resize is the admission-path
ceiling (CLAUDE.md). --device-resize routes the Catmull-Rom resample to the
TPU as fixed-point digit-split GEMMs (preprocess/device_resize.py) — this
bench answers whether that wins end-to-end at serving shapes.

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


def measure(params, cfg, pages, device_resize: bool, no_crop: bool) -> float:
    pipe = OCR2Pipeline(
        params, cfg, make_tok(), kv_dtype="bfloat16", device_resize=device_resize
    )
    engine = ContinuousOCREngine(
        pipe, slots=8, capacity=bucket_capacity(1200 + MAX_NEW), chunk_steps=16
    )

    def run():
        return engine.run(
            pages,
            prompt="<image> Free OCR.",
            max_new_tokens=MAX_NEW,
            no_crop=no_crop,
            ngram_size=NGRAM,
        )

    run()  # warmup/compile
    t0 = time.perf_counter()
    run()
    return len(pages) / (time.perf_counter() - t0)


def main():
    cfg = OCR2Config()
    print(f"device: {jax.devices()[0]}", flush=True)
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    rng = np.random.default_rng(7)
    # Realistic page sizes: big enough that the resize is the host sink.
    pages = [
        Image.fromarray(rng.integers(0, 256, (2200, 1700, 3), np.uint8))
        for _ in range(8)
    ]
    for no_crop in (True, False):
        label = "no-crop" if no_crop else "crop"
        for dev in (False, True):
            pps = measure(params, cfg, pages, dev, no_crop)
            print(
                f"serve {label:8s} device_resize={int(dev)}: {pps:6.2f} pages/s",
                flush=True,
            )


if __name__ == "__main__":
    main()
