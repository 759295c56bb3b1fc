"""Ablate the gmm prefill row-tile height bm.

The visit schedule costs V = M/bm + E full tiles, i.e. overcompute
1 + E*bm/M: at crop-prefill scale (M=13.2k, E=64) bm=256 computes 2.25x
the real rows. Smaller bm cuts that term; the floor is the per-expert
weight stream (~6.9 MB/expert, paid once per expert regardless of bm)
plus DMA-hiding on expert-change visits. This prints ms per full MoE FFN
(swiglu + down + combine) for bm in {32, 64, 128, 256} at two prefill
scales so the default can be picked from measurement.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from deepseek_ocr2_tpu.ops.moe_gmm import moe_ffn_gmm

from _bench_util import time_chain  # noqa: E402

E, H, I, K = 64, 1280, 896, 6


def main():
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}  E={E} H={H} I={I} k={K}")
    experts = {
        "gate": jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02,
        "up": jax.random.normal(key, (E, H, I), jnp.bfloat16) * 0.02,
        "down": jax.random.normal(key, (E, I, H), jnp.bfloat16) * 0.02,
    }

    for n in (700, 2200):
        m = n * K
        x = jax.random.normal(key, (n, H), jnp.bfloat16)
        idx = jax.random.randint(key, (n, K), 0, E, jnp.int32)
        w = jax.nn.softmax(jax.random.normal(key, (n, K), jnp.float32))
        ideal_ms = 3 * m * H * I * 2 / 80e12 * 1e3  # 80 TF/s plain-GEMM rate
        print(f"\nN={n} M={m}  (compute floor ~{ideal_ms:.2f} ms @80TF/s)")
        for bm in (32, 64, 128, 256):
            os.environ["DEEPSEEK_GMM_BM"] = str(bm)
            for fused in (0, 1):
                os.environ["DEEPSEEK_GMM_FUSED"] = str(fused)

                def make_run(iters, bm=bm):
                    @jax.jit
                    def run(x, experts, w, idx):
                        def body(c, _):
                            y = moe_ffn_gmm(c, experts, w, idx)
                            return c + y * jnp.bfloat16(1e-24), ()

                        out, _ = jax.lax.scan(body, x, None, length=iters)
                        return out

                    return run

                dt = time_chain(make_run, x, experts, w, idx)
                over = 1 + E * bm / m
                print(
                    f"  bm={bm:4d} fused={fused}  {dt * 1e3:7.3f} ms  "
                    f"(static overcompute {over:.2f}x)"
                )
        os.environ.pop("DEEPSEEK_GMM_BM", None)
        os.environ.pop("DEEPSEEK_GMM_FUSED", None)


if __name__ == "__main__":
    main()
