"""Stacked-cache decode attention kernel vs the XLA sdpa path.

The kernel (ops/paged_attention.decode_attention_stacked) reads K/V straight
from the [L, B, Hh, cap, D] carry via a scalar-prefetched layer index; the
XLA decode path's slice/update pair copied each layer's whole K/V twice per
step (~870 us/layer at b=32 in the decode trace).
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.ops.attention import sdpa
from deepseek_ocr2_tpu.ops.paged_attention import decode_attention_stacked


def _ref(q, k_layer, v_layer, seq_lens, scale):
    cap = k_layer.shape[2]
    mask = (jnp.arange(cap)[None, :] >= seq_lens[:, None])[:, None, None, :]
    out = sdpa(
        q[:, :, None, :],
        k_layer.astype(jnp.float32),
        v_layer.astype(jnp.float32),
        scale=scale,
        mask=jnp.where(mask, -jnp.inf, 0.0),
        out_dtype=jnp.float32,
    )
    return out[:, :, 0, :]


@pytest.mark.parametrize("cap,lens", [
    (64, [1, 7, 33, 64, 40]),          # single chunk
    (1024, [1, 513, 1024, 640, 512]),  # chunked streaming softmax
])
def test_stacked_kernel_matches_sdpa(cap, lens):
    rng = np.random.default_rng(0)
    l, b, hh, d = 3, 5, 4, 32
    k_all = jnp.asarray(rng.standard_normal((l, b, hh, cap, d)).astype(np.float32))
    v_all = jnp.asarray(rng.standard_normal((l, b, hh, cap, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, hh, d)).astype(np.float32))
    seq_lens = jnp.asarray(lens, jnp.int32)
    scale = 1.0 / math.sqrt(d)
    for li in range(l):
        got = decode_attention_stacked(
            q, k_all, v_all, li, seq_lens, scale=scale, interpret=True
        )
        ref = _ref(q, k_all[li], v_all[li], seq_lens, scale)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-6, rtol=1e-6
        )


def test_stacked_kernel_bf16_cache():
    rng = np.random.default_rng(1)
    l, b, hh, cap, d = 2, 3, 2, 128, 64
    k_all = jnp.asarray(rng.standard_normal((l, b, hh, cap, d)), jnp.bfloat16)
    v_all = jnp.asarray(rng.standard_normal((l, b, hh, cap, d)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, hh, d)).astype(np.float32))
    seq_lens = jnp.asarray([5, 100, 128], jnp.int32)
    scale = 1.0 / math.sqrt(d)
    got = decode_attention_stacked(
        q, k_all, v_all, 1, seq_lens, scale=scale, interpret=True
    )
    ref = _ref(q, k_all[1], v_all[1], seq_lens, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3, rtol=2e-3)
