"""Phase-trace of the end-to-end serve bench (bench.py:_measure_serve).

Runs the identical workload (16 real PIL pages, no-crop, 32 new tokens,
8 slots, chunk 16) with DEEPSEEK_DEBUG_SERVE=1 so the engine prints
per-phase wall-clock: admission, decode chunks, harvest, host preprocess.
Use this to find where serve_pages_per_sec diverges from the device-only
no-crop number before touching any engine code.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ["DEEPSEEK_DEBUG_SERVE"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import deepseek_ocr2 as ocr2


def main() -> None:
    cfg = OCR2Config()
    t0 = time.perf_counter()
    params = ocr2.init_params(
        cfg, jax.random.PRNGKey(0), lm_dtype=jnp.bfloat16, vision_dtype=jnp.bfloat16
    )
    print(f"init_params {time.perf_counter() - t0:.1f} s", file=sys.stderr)

    t0 = time.perf_counter()
    pages_per_sec = bench._measure_serve(params, cfg)
    print(
        f"serve_pages_per_sec={pages_per_sec:.3f} "
        f"(warmup+timed total {time.perf_counter() - t0:.1f} s)"
    )


if __name__ == "__main__":
    main()
