"""Weight-only int8 MoE decode: quantization quality + kernel parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.ops import moe as moe_ops
from deepseek_ocr2_tpu.ops.moe_q8 import (
    moe_ffn_decode_q8,
    moe_ffn_decode_q8_xla,
    quantize_experts,
    quantize_per_col,
)

INTERPRET = jax.default_backend() != "tpu"


def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((4, 64, 32)) * 0.1, jnp.float32)
    q, s = quantize_per_col(w)
    deq = q.astype(jnp.float32) * s
    err = np.abs(np.asarray(deq - w))
    # per-column scaling bounds the error by scale/2 ~ absmax/254
    assert err.max() < float(np.abs(np.asarray(w)).max()) / 100


def test_q8_kernel_matches_xla_reference():
    rng = np.random.default_rng(1)
    e, h, i, b, k = 8, 256, 128, 2, 3
    experts = {
        "gate": jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((e, h, i)) * 0.1, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((e, i, h)) * 0.1, jnp.float32),
    }
    q8 = quantize_experts(experts)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, e, (b, k)), jnp.int32)
    wts = jnp.asarray(rng.uniform(0, 1, (b, k)), jnp.float32)

    want = np.asarray(moe_ffn_decode_q8_xla(x, q8, wts, idx), np.float32)
    got = np.asarray(
        moe_ffn_decode_q8(x, q8, wts, idx, interpret=INTERPRET), np.float32
    )
    # bf16 outputs: allow a couple of ulps (the oracle runs under "highest"
    # matmul precision, the kernel pins DEFAULT).
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=8e-3)


def test_q8_close_to_bf16_path():
    """Quantized decode tracks the full-precision decode closely."""
    rng = np.random.default_rng(2)
    e, h, i, b, k = 8, 256, 128, 2, 3
    experts = {
        "gate": jnp.asarray(rng.standard_normal((e, h, i)) * 0.05, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((e, h, i)) * 0.05, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((e, i, h)) * 0.05, jnp.float32),
    }
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.float32)
    router = jnp.asarray(rng.standard_normal((h, e)) * 0.2, jnp.float32)
    wts, idx = moe_ops.route(x, router, k)

    full = np.asarray(moe_ops.moe_ffn_decode(x, experts, wts, idx), np.float32)
    q8 = quantize_experts(experts)
    quant = np.asarray(
        moe_ffn_decode_q8(x.astype(jnp.bfloat16), q8, wts, idx, interpret=INTERPRET),
        np.float32,
    )
    denom = max(np.abs(full).max(), 1e-6)
    assert np.abs(quant - full).max() / denom < 0.05
