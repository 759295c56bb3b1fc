"""Session canary: q4 lm_head wide kernel at b=1 (known-good: ~96 us).

Run before trusting any micro-bench session; a reading >1.3x off means the
session is contended/jittery — distrust absolute numbers from it.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import chain, time_chain  # noqa: E402

from deepseek_ocr2_tpu.ops.linear_q4 import linear_q4, quantize_linear_q4

IN, OUT = 1280, 129280


def main():
    print(f"device: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((IN, OUT)) * 0.02, jnp.float32)
    q4 = quantize_linear_q4(w)
    nbytes = q4["q4"].size + 4 * q4["scale"].size
    x = jnp.asarray(rng.standard_normal((1, IN)) * 0.5, jnp.bfloat16)
    t = time_chain(chain(lambda x: linear_q4(x, q4)), x)
    ok = t * 1e6 < 96 * 1.3
    print(
        f"canary q4 lm_head b=1: {t*1e6:.1f} us  {nbytes/t/1e9:.1f} GB/s  "
        f"({'CLEAN' if ok else 'DIRTY — distrust this session'})",
        flush=True,
    )


if __name__ == "__main__":
    main()
