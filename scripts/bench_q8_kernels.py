"""Micro-roofline for the int8 decode kernels.

Times each fused q8 Pallas kernel standalone at decode shapes and reports
achieved HBM GB/s vs the v5e peak (819 GB/s), so kernel-level regressions
and tuning wins are visible without running the full bench. A dependent
lax.scan chain defeats CSE between iterations.

Run on the TPU: python scripts/bench_q8_kernels.py
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

from deepseek_ocr2_tpu.ops.linear_q8 import linear_q8, quantize_linear
from deepseek_ocr2_tpu.ops.moe_q8 import moe_ffn_decode_q8, quantize_experts

V5E_GBPS = 819.0
ITERS_LO = 64
ITERS_HI = 512


def _time(make_run, *args) -> float:
    """Per-iteration time via the difference method: the ~30 ms dispatch
    round-trip (and any fixed prologue) cancels between the two scan lengths."""
    lo, hi = make_run(ITERS_LO), make_run(ITERS_HI)

    def once(fn):
        np.asarray(jax.device_get(fn(*args)))[:1]  # compile + settle
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(fn(*args)))[:1]
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(once(hi) - once(lo), 1e-9) / (ITERS_HI - ITERS_LO)


def bench_linear(name: str, b: int, in_dim: int, out_dim: int):
    key = jax.random.PRNGKey(0)
    w = quantize_linear(jax.random.normal(key, (in_dim, out_dim), jnp.float32) * 0.02)
    x0 = jax.random.normal(key, (b, in_dim), jnp.bfloat16)

    def make_run(iters):
        @jax.jit
        def run(x0, w):
            def body(x, _):
                y = linear_q8(x, w)
                # Data dependency between iterations; numerically negligible.
                x = x0 + (y[:, :1] * jnp.bfloat16(1e-24)).astype(x0.dtype)
                return x, ()

            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return x

        return run

    dt = _time(make_run, x0, w)
    byts = in_dim * out_dim + out_dim * 4  # int8 weights + f32 scales
    gbps = byts / dt / 1e9
    print(
        f"{name:22s} b={b:2d} [{in_dim:5d} -> {out_dim:6d}] "
        f"{dt * 1e6:8.1f} us  {gbps:6.1f} GB/s  {100 * gbps / V5E_GBPS:5.1f}%"
    )


def bench_moe(b: int, e: int = 64, h: int = 1280, i: int = 896, k: int = 6):
    key = jax.random.PRNGKey(1)
    experts = {
        "gate": jax.random.normal(key, (e, h, i), jnp.float32) * 0.02,
        "up": jax.random.normal(key, (e, h, i), jnp.float32) * 0.02,
        "down": jax.random.normal(key, (e, i, h), jnp.float32) * 0.02,
    }
    q8 = quantize_experts(experts)
    x0 = jax.random.normal(key, (b, h), jnp.bfloat16)
    idx = jnp.tile(jnp.arange(k, dtype=jnp.int32)[None], (b, 1))
    wts = jnp.full((b, k), 1.0 / k, jnp.float32)

    def make_run(iters):
        @jax.jit
        def run(x0, q8, wts, idx):
            def body(x, _):
                y = moe_ffn_decode_q8(x, q8, wts, idx)
                x = x0 + (y[:, :1] * jnp.bfloat16(1e-24)).astype(x0.dtype)
                return x, ()

            x, _ = jax.lax.scan(body, x0, None, length=iters)
            return x

        return run

    dt = _time(make_run, x0, q8, wts, idx)
    byts = b * k * (h * 2 * i + i * h)  # int8 gu + down per selected expert
    gbps = byts / dt / 1e9
    print(
        f"{'moe_q8':22s} b={b:2d} [k={k} of {e} experts]   "
        f"{dt * 1e6:8.1f} us  {gbps:6.1f} GB/s  {100 * gbps / V5E_GBPS:5.1f}%"
    )


def main():
    print(f"device: {jax.devices()[0]}")
    # Decode-step shapes of the full-size model (hidden 1280, inter 6848,
    # shared-inter 2*1792, vocab 129280).
    bench_linear("wqkv", 1, 1280, 3 * 1280)
    bench_linear("wo", 1, 1280, 1280)
    bench_linear("dense_gu", 1, 1280, 2 * 6848)
    bench_linear("dense_down", 1, 6848, 1280)
    bench_linear("shared_gu", 1, 1280, 2 * 3584)
    bench_linear("shared_down", 1, 3584, 1280)
    bench_linear("lm_head", 1, 1280, 129280)
    bench_moe(1)
    bench_moe(8)
    bench_linear("lm_head", 8, 1280, 129280)


if __name__ == "__main__":
    main()
