"""MXU calibration + prefill hot-spot decomposition.

1. Raw bf16 GEMM chains at several shapes -> achievable TFLOP/s on this chip
   (separates "the machine is slow" from "our code is slow").
2. LM prefill decomposition: attention-only vs MoE-only cost at crop-mode
   sequence lengths.

Run on the TPU: python scripts/bench_mfu.py
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

V5E_TFLOPS = 197.0
ITERS_LO, ITERS_HI = 8, 40


def _time_chain(make_run, *args) -> float:
    lo, hi = make_run(ITERS_LO), make_run(ITERS_HI)

    def once(fn):
        np.asarray(jax.device_get(fn(*args)))[:1]
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(once(hi) - once(lo), 1e-9) / (ITERS_HI - ITERS_LO)


def bench_gemm(m, k, n):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (m, k), jnp.bfloat16)
    b = jax.random.normal(key, (k, n), jnp.bfloat16)

    def make_run(iters):
        @jax.jit
        def run(a, b):
            def body(x, _):
                y = jnp.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
                # Rotate back to [m, k] shape with a cheap slice-pad to keep
                # the chain dependent; for square-ish shapes just feed through.
                if k == n:
                    return y, ()
                return a + y[:, :1].astype(a.dtype) * jnp.bfloat16(1e-24), ()

            x, _ = jax.lax.scan(body, a, None, length=iters)
            return x

        return run

    dt = _time_chain(make_run, a, b)
    tf = 2 * m * k * n / dt / 1e12
    print(f"gemm [{m:5d},{k:5d}]x[{k:5d},{n:5d}]  {dt * 1e6:9.1f} us  {tf:6.1f} TF/s  {100 * tf / V5E_TFLOPS:5.1f}% MXU")


def bench_lm_pieces():
    from deepseek_ocr2_tpu.configs import OCR2Config
    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
    from deepseek_ocr2_tpu.runtime.kv_cache import make_kv_cache

    cfg = OCR2Config().lm
    key = jax.random.PRNGKey(0)
    params = dsv2.init_params(cfg, key, dtype=jnp.bfloat16)
    B, S = 4, 550
    x = jax.random.normal(key, (B, S, cfg.hidden_size), jnp.bfloat16)

    def make_prefill(iters):
        @jax.jit
        def run(params, x):
            def body(c, _):
                cache = make_kv_cache(
                    cfg.num_hidden_layers, B, cfg.num_attention_heads, 640,
                    cfg.head_dim, dtype=jnp.bfloat16,
                )
                h, _ = dsv2.lm_forward(params, cfg, c, cache, pos=0, is_prefill=True)
                return x + h[:, :1, :1].astype(x.dtype) * jnp.bfloat16(1e-24), ()

            c, _ = jax.lax.scan(body, x, None, length=iters)
            return c

        return run

    dt = _time_chain(make_prefill, params, x)
    print(f"lm_forward prefill [B=4,S=550]      {dt * 1e3:9.2f} ms/iter")

    # MoE prefill alone at the same token count.
    from deepseek_ocr2_tpu.ops.moe import moe_ffn_prefill, route

    experts = {
        k: params["layers_moe"]["experts"][k][0] for k in ("gate", "up", "down")
    }
    xf = x.reshape(B * S, cfg.hidden_size)
    router = params["layers_moe"]["router"][0]

    def make_moe(iters):
        @jax.jit
        def run(experts, router, xf):
            def body(c, _):
                w, i = route(c, router, cfg.num_experts_per_tok)
                y = moe_ffn_prefill(c, experts, w, i)
                return xf + y[:, :1].astype(c.dtype) * jnp.bfloat16(1e-24), ()

            c, _ = jax.lax.scan(body, xf, None, length=iters)
            return c

        return run

    dt = _time_chain(make_moe, experts, router, xf)
    print(f"moe_ffn_prefill [2200 tok, 1 layer] {dt * 1e3:9.2f} ms/iter  (x11 layers = {11 * dt * 1e3:.0f} ms)")


def main():
    print(f"device: {jax.devices()[0]}")
    bench_gemm(2048, 2048, 2048)
    bench_gemm(8192, 1280, 1280)
    bench_gemm(2200, 1280, 6848)
    bench_gemm(512, 896, 896)
    bench_lm_pieces()


if __name__ == "__main__":
    main()
