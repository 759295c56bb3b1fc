"""Crop-mode continuous serving: where do the pages/s go?

The realistic OCR workload (BASELINE configs #3/#4) is crop-mode: a
2200x1700 page tiles to a 2x3 grid (6 local views + global = 1121 image
tokens). r3 measured 1.59 pages/s/chip through the engine vs ~5.2 pages/s
device-compute-only (bench.py crop6) — this bench bills the gap.

Phases printed (DEEPSEEK_DEBUG_SERVE): serve.preprocess / serve.admit /
serve.iter decode/harvest, plus a host->device transfer probe for the raw
page ship (the device-resize path ships one ~12 MB uint8 image per page).

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
N_PAGES = 16
SLOTS = 8


def probe_transfer():
    """Raw host->device bandwidth for the bucket-padded page ship."""
    arr = np.random.default_rng(0).integers(0, 256, (2304, 1792, 3), np.uint8)
    dev = jax.device_put(arr)
    np.asarray(dev[0, 0, :1])  # materialize
    for _ in range(3):
        t0 = time.perf_counter()
        dev = jax.device_put(arr)
        np.asarray(dev[0, 0, :1])  # barrier
        dt = time.perf_counter() - t0
        print(
            f"device_put {arr.nbytes / 1e6:.1f} MB: {dt * 1e3:.1f} ms "
            f"= {arr.nbytes / dt / 1e6:.0f} MB/s",
            flush=True,
        )


def probe_host_side():
    """Host-only costs of the device-resize preprocess path."""
    rng = np.random.default_rng(1)
    img = Image.fromarray(rng.integers(0, 256, (2200, 1700, 3), np.uint8))
    from deepseek_ocr2_tpu.preprocess.device_resize import bucket_pad

    t0 = time.perf_counter()
    for _ in range(5):
        a = np.asarray(img.convert("RGB"))
    t1 = time.perf_counter()
    for _ in range(5):
        b = bucket_pad(np.ascontiguousarray(a))
    t2 = time.perf_counter()
    print(
        f"host convert+asarray {(t1 - t0) / 5 * 1e3:.1f} ms, "
        f"bucket_pad {(t2 - t1) / 5 * 1e3:.1f} ms",
        flush=True,
    )


def main():
    cfg = OCR2Config()
    print(f"device: {jax.devices()[0]}", flush=True)
    probe_transfer()
    probe_host_side()
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    tok = Tokenizer(
        models.WordLevel({"<unk>": 2, "Free": 10, "OCR.": 11}, unk_token="<unk>")
    )
    tok.pre_tokenizer = pre_tokenizers.WhitespaceSplit()

    rng = np.random.default_rng(7)
    pages = [
        Image.fromarray(rng.integers(0, 256, (2200, 1700, 3), np.uint8))
        for _ in range(N_PAGES)
    ]
    pipe = OCR2Pipeline(params, cfg, tok, kv_dtype="bfloat16")
    engine = ContinuousOCREngine(
        pipe, slots=SLOTS, capacity=bucket_capacity(1126 + MAX_NEW), chunk_steps=16
    )

    def run():
        return engine.run(
            pages,
            prompt="<image> Free OCR.",
            max_new_tokens=MAX_NEW,
            no_crop=False,
            ngram_size=NGRAM,
        )

    print("--- warmup ---", flush=True)
    t0 = time.perf_counter()
    run()
    print(f"[warmup {time.perf_counter() - t0:.1f}s]", flush=True)
    print("--- traced run ---", flush=True)
    t0 = time.perf_counter()
    run()
    dt = time.perf_counter() - t0
    print(f"[{N_PAGES} pages in {dt:.2f}s = {N_PAGES / dt:.2f} pages/s]", flush=True)

    # Staged mode (VERDICT r4 #3): pre-stage all device arrays, then clock
    # the engine e2e — the transfer-roofed claim becomes a measurement.
    print("--- staged run (transfers pre-paid) ---", flush=True)
    for tag in ("staged warmup", "staged"):
        reqs = engine.prestage(
            pages, prompt="<image> Free OCR.", max_new_tokens=MAX_NEW,
            no_crop=False,
        )
        t0 = time.perf_counter()
        engine.run_requests(reqs, ngram_size=NGRAM)
        dt = time.perf_counter() - t0
        print(
            f"[{tag}: {N_PAGES} pages in {dt:.2f}s = {N_PAGES / dt:.2f} pages/s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
