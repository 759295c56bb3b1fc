"""Fused decode-attention kernel (ops/attn_fused): parity vs the unfused
pool path (qmm projections + XLA flash-equivalent attention) on scalar and
ragged positions, int4 and int8 weights, single- and multi-chunk caches."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.configs import DeepseekV2Config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.ops.attn_fused import attn_decode_fused
from deepseek_ocr2_tpu.ops.linear_q4 import quantize_linear_q4
from deepseek_ocr2_tpu.ops.linear_q8 import quantize_linear

INTERPRET = jax.default_backend() != "tpu"

H, HEADS, D = 256, 2, 128
L, CAP = 3, 256


def tiny_cfg():
    return DeepseekV2Config(hidden_size=H, num_attention_heads=HEADS)


def make_attn(rng, bits):
    quant = quantize_linear_q4 if bits == 4 else quantize_linear
    wq = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.05, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.05, jnp.float32)
    return {"wqkv": quant(wq), "wo": quant(wo)}


def make_pool(rng, b, cap=CAP):
    k = jnp.asarray(rng.standard_normal((L, b, HEADS, cap, D)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((L, b, HEADS, cap, D)) * 0.3, jnp.bfloat16)
    return k, v


def run_both(attn, k_all, v_all, xn, li, pos, cfg):
    cos, sin = dsv2._rope_consts(cfg)
    out_f, kf, vf = attn_decode_fused(
        xn, attn, cfg, cos, sin, k_all, v_all, li, pos, interpret=INTERPRET
    )
    out_r, kr, vr = dsv2._attention_decode_pool(
        xn, attn, cfg, cos, sin, k_all, v_all, li, pos
    )
    return (out_f, kf, vf), (out_r, kr, vr)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("b", [1, 4])
def test_fused_matches_pool_scalar_pos(bits, b):
    rng = np.random.default_rng(0)
    cfg = tiny_cfg()
    attn = make_attn(rng, bits)
    k_all, v_all = make_pool(rng, b)
    xn = jnp.asarray(rng.standard_normal((b, 1, H)) * 0.5, jnp.bfloat16)
    pos = jnp.int32(37)

    (of, kf, vf), (orr, kr, vr) = run_both(attn, k_all, v_all, xn, 1, pos, cfg)

    # The new K/V row: same rope math on the same bf16 qkv (slab-wise vs
    # one-dot f32 accumulation may differ by ~1 bf16 ulp).
    np.testing.assert_allclose(
        np.asarray(kf[1, :, :, 37, :], np.float32),
        np.asarray(kr[1, :, :, 37, :], np.float32),
        rtol=2e-2, atol=8e-3,
    )
    np.testing.assert_allclose(
        np.asarray(vf[1, :, :, 37, :], np.float32),
        np.asarray(vr[1, :, :, 37, :], np.float32),
        rtol=2e-2, atol=8e-3,
    )
    # Untouched pool entries bit-identical.
    mask = np.ones(CAP, bool); mask[37] = False
    np.testing.assert_array_equal(
        np.asarray(kf[:, :, :, mask, :]), np.asarray(kr[:, :, :, mask, :])
    )
    # Attention output (bf16): flash vs softmax reduction within tolerance.
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(orr, np.float32),
        rtol=3e-2, atol=8e-3,
    )


@pytest.mark.parametrize("bits", [4, 8])
def test_fused_matches_pool_ragged_pos(bits):
    rng = np.random.default_rng(1)
    cfg = tiny_cfg()
    b = 4
    attn = make_attn(rng, bits)
    k_all, v_all = make_pool(rng, b)
    xn = jnp.asarray(rng.standard_normal((b, 1, H)) * 0.5, jnp.bfloat16)
    pos = jnp.asarray([5, 100, 255, 64], jnp.int32)

    (of, kf, vf), (orr, kr, vr) = run_both(attn, k_all, v_all, xn, 2, pos, cfg)

    rows = np.arange(b)
    np.testing.assert_allclose(
        np.asarray(kf[2, rows, :, np.asarray(pos), :], np.float32),
        np.asarray(kr[2, rows, :, np.asarray(pos), :], np.float32),
        rtol=2e-2, atol=8e-3,
    )
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(orr, np.float32),
        rtol=3e-2, atol=8e-3,
    )


def test_fused_multi_chunk_budget_skip():
    """cap > 512 exercises the chunk walk + beyond-budget index re-pointing."""
    rng = np.random.default_rng(2)
    cfg = tiny_cfg()
    b = 2
    attn = make_attn(rng, 4)
    k_all, v_all = make_pool(rng, b, cap=1024)
    xn = jnp.asarray(rng.standard_normal((b, 1, H)) * 0.5, jnp.bfloat16)
    # row 0 deep into chunk 2; row 1 inside chunk 0 (skips chunks 1+).
    pos = jnp.asarray([1000, 17], jnp.int32)

    (of, kf, vf), (orr, kr, vr) = run_both(attn, k_all, v_all, xn, 0, pos, cfg)
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(orr, np.float32),
        rtol=3e-2, atol=8e-3,
    )


def test_fused_pos_zero_attends_only_self():
    """pos==0: no history; the output must be wo(v_new) exactly (softmax
    weight 1 on the current token)."""
    rng = np.random.default_rng(3)
    cfg = tiny_cfg()
    attn = make_attn(rng, 4)
    k_all, v_all = make_pool(rng, 1)
    xn = jnp.asarray(rng.standard_normal((1, 1, H)) * 0.5, jnp.bfloat16)

    (of, kf, vf), (orr, kr, vr) = run_both(attn, k_all, v_all, xn, 0, jnp.int32(0), cfg)
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(orr, np.float32),
        rtol=3e-2, atol=8e-3,
    )


def test_fused_greedy_step_parity_full_config_shapes():
    """One decode step at the REAL per-layer shapes (H=1280, 10 heads) —
    the shapes bench.py runs; guards Mosaic-lowerability assumptions
    (slab widths, lane slices) at production dims."""
    rng = np.random.default_rng(4)
    cfg = DeepseekV2Config()  # H=1280, heads=10
    h = cfg.hidden_size
    attn = {
        "wqkv": quantize_linear_q4(
            jnp.asarray(rng.standard_normal((h, 3 * h)) * 0.03, jnp.float32)
        ),
        "wo": quantize_linear_q4(
            jnp.asarray(rng.standard_normal((h, h)) * 0.03, jnp.float32)
        ),
    }
    b, cap = 2, 512
    k_all = jnp.asarray(
        rng.standard_normal((2, b, cfg.num_attention_heads, cap, cfg.head_dim)) * 0.3,
        jnp.bfloat16,
    )
    v_all = jnp.asarray(
        rng.standard_normal((2, b, cfg.num_attention_heads, cap, cfg.head_dim)) * 0.3,
        jnp.bfloat16,
    )
    xn = jnp.asarray(rng.standard_normal((b, 1, h)) * 0.5, jnp.bfloat16)
    (of, kf, vf), (orr, kr, vr) = run_both(attn, k_all, v_all, xn, 1, jnp.int32(300), cfg)
    np.testing.assert_allclose(
        np.asarray(of, np.float32), np.asarray(orr, np.float32),
        rtol=3e-2, atol=8e-3,
    )
