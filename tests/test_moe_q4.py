"""int4 MoE decode kernels: per-selection and distinct-visit vs the XLA
oracle, shared pseudo-expert folding, and padded contraction dims."""

import numpy as np
import jax
import jax.numpy as jnp

from deepseek_ocr2_tpu.ops.moe_q4 import (
    dequantize_experts_q4,
    moe_ffn_decode_q4,
    moe_ffn_decode_q4_fused,
    moe_ffn_decode_q4_xla,
    quantize_experts_q4,
)

INTERPRET = jax.default_backend() != "tpu"


def _mk_experts(rng, e, h, i, scale=0.1):
    return {
        "gate": jnp.asarray(rng.standard_normal((e, h, i)) * scale, jnp.float32),
        "up": jnp.asarray(rng.standard_normal((e, h, i)) * scale, jnp.float32),
        "down": jnp.asarray(rng.standard_normal((e, i, h)) * scale, jnp.float32),
    }


def _mk_routing(rng, b, k, e):
    idx = np.stack([rng.choice(e, size=k, replace=False) for _ in range(b)])
    w = rng.random((b, k)).astype(np.float32)
    w /= w.sum(axis=1, keepdims=True)
    return jnp.asarray(w), jnp.asarray(idx, jnp.int32)


def test_quantize_experts_q4_shapes():
    rng = np.random.default_rng(0)
    e, h, i = 4, 64, 32  # tiny dims pad H: 64->256, I: 32->256
    q = quantize_experts_q4(_mk_experts(rng, e, h, i))
    assert q["gu_q4"].shape == (e, 128, 2 * i)
    assert q["gu_scale"].shape == (e, 2, 2 * i)
    assert q["down_q4"].shape == (e, 128, h)
    assert q["down_scale"].shape == (e, 2, h)
    deq = dequantize_experts_q4(q, jnp.float32, i, h)
    assert deq["gate"].shape == (e, h, i) and deq["down"].shape == (e, i, h)


def test_moe_q4_per_selection_matches_xla():
    rng = np.random.default_rng(1)
    e, h, i, b, k = 8, 256, 128, 2, 2
    experts = _mk_experts(rng, e, h, i)
    q = quantize_experts_q4(experts)
    weights, idx = _mk_routing(rng, b, k, e)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
    want = np.asarray(moe_ffn_decode_q4_xla(x, q, weights, idx), np.float32)
    got = np.asarray(
        moe_ffn_decode_q4(x, q, weights, idx, interpret=INTERPRET), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_moe_q4_per_selection_padded_dims():
    """Non-256-multiple H and I exercise the x/act zero-padding."""
    rng = np.random.default_rng(2)
    e, h, i, b, k = 4, 192, 96, 2, 2
    experts = _mk_experts(rng, e, h, i)
    q = quantize_experts_q4(experts)
    weights, idx = _mk_routing(rng, b, k, e)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
    want = np.asarray(moe_ffn_decode_q4_xla(x, q, weights, idx), np.float32)
    got = np.asarray(
        moe_ffn_decode_q4(x, q, weights, idx, interpret=INTERPRET), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_moe_q4_fused_matches_per_selection():
    rng = np.random.default_rng(3)
    e, h, i, b, k = 8, 256, 128, 5, 2
    experts = _mk_experts(rng, e, h, i)
    q = quantize_experts_q4(experts)
    weights, idx = _mk_routing(rng, b, k, e)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
    want = np.asarray(moe_ffn_decode_q4_xla(x, q, weights, idx), np.float32)
    got = np.asarray(
        moe_ffn_decode_q4_fused(x, q, weights, idx, interpret=INTERPRET), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_moe_q4_fused_duplicate_experts_across_rows():
    """Distinct-visit schedule: rows sharing experts must each get their own
    combine weights (the visit table, not the DMA, carries per-row terms)."""
    rng = np.random.default_rng(4)
    e, h, i, b, k = 4, 256, 128, 4, 2
    experts = _mk_experts(rng, e, h, i)
    q = quantize_experts_q4(experts)
    idx = jnp.asarray([[0, 1], [0, 1], [1, 2], [0, 2]], jnp.int32)
    weights = jnp.asarray(rng.random((b, k)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
    want = np.asarray(moe_ffn_decode_q4_xla(x, q, weights, idx), np.float32)
    got = np.asarray(
        moe_ffn_decode_q4_fused(x, q, weights, idx, interpret=INTERPRET), np.float32
    )
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def _with_pe(q, rng, n_sh, h, i):
    pe = quantize_experts_q4(_mk_experts(rng, n_sh, h, i))
    return {**q, **{f"pe_{k}": v for k, v in pe.items()}}


def test_moe_q4_pe_fold_equals_separate_shared():
    """pe_* folding (always-on visits, weight 1) must equal kernel-without-pe
    plus the dequantized shared SwiGLU sum."""
    rng = np.random.default_rng(5)
    e, h, i, b, k, n_sh = 8, 256, 128, 1, 2, 2
    experts = _mk_experts(rng, e, h, i)
    q = quantize_experts_q4(experts)
    qpe = _with_pe(q, rng, n_sh, h, i)
    weights, idx = _mk_routing(rng, b, k, e)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)

    got = np.asarray(
        moe_ffn_decode_q4(x, qpe, weights, idx, with_shared=True, interpret=INTERPRET),
        np.float32,
    )
    base = np.asarray(
        moe_ffn_decode_q4(x, q, weights, idx, interpret=INTERPRET), np.float32
    )
    # Shared term via the XLA oracle with weight-1 "routing" to each pe.
    pe_only = {
        kk[3:]: v for kk, v in qpe.items() if kk.startswith("pe_")
    }
    ones = jnp.ones((b, n_sh), jnp.float32)
    pe_idx = jnp.broadcast_to(jnp.arange(n_sh, dtype=jnp.int32), (b, n_sh))
    shared = np.asarray(moe_ffn_decode_q4_xla(x, pe_only, ones, pe_idx), np.float32)
    np.testing.assert_allclose(got, base + shared, rtol=3e-2, atol=3e-2)


def test_moe_q4_fused_pe_fold():
    rng = np.random.default_rng(6)
    e, h, i, b, k, n_sh = 8, 256, 128, 4, 2, 2
    experts = _mk_experts(rng, e, h, i)
    qpe = _with_pe(quantize_experts_q4(experts), rng, n_sh, h, i)
    weights, idx = _mk_routing(rng, b, k, e)
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)

    got = np.asarray(
        moe_ffn_decode_q4_fused(x, qpe, weights, idx, interpret=INTERPRET), np.float32
    )
    q = {kk: v for kk, v in qpe.items() if not kk.startswith("pe_")}
    base = np.asarray(
        moe_ffn_decode_q4_fused(x, q, weights, idx, interpret=INTERPRET), np.float32
    )
    pe_only = {kk[3:]: v for kk, v in qpe.items() if kk.startswith("pe_")}
    ones = jnp.ones((b, n_sh), jnp.float32)
    pe_idx = jnp.broadcast_to(jnp.arange(n_sh, dtype=jnp.int32), (b, n_sh))
    shared = np.asarray(moe_ffn_decode_q4_xla(x, pe_only, ones, pe_idx), np.float32)
    np.testing.assert_allclose(got, base + shared, rtol=3e-2, atol=3e-2)
