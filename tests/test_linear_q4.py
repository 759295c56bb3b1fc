"""int4 (w4a16) linear: pack/unpack roundtrip, kernel==XLA parity on the
real decode shapes, qmm dispatch, and the group-scale accuracy win."""

import numpy as np
import jax
import jax.numpy as jnp

from deepseek_ocr2_tpu.ops.linear_q4 import (
    dequantize_q4,
    linear_q4,
    linear_q4_xla,
    quantize_linear_q4,
    quantize_q4_grouped,
)
from deepseek_ocr2_tpu.ops.linear_q8 import is_qlinear, qmm

INTERPRET = jax.default_backend() != "tpu"


def test_q4_pack_roundtrip_exact():
    """Weights already on the int4 grid survive quantize->dequantize exactly."""
    rng = np.random.default_rng(0)
    k, n = 512, 256
    scale = 0.03
    q = rng.integers(-7, 8, (k, n)).astype(np.float32)
    w = jnp.asarray(q * scale, jnp.float32)
    qd = quantize_linear_q4(w)
    assert qd["q4"].shape == (k // 2, n) and qd["q4"].dtype == jnp.int8
    assert qd["scale"].shape == (k // 128, n)
    back = np.asarray(dequantize_q4(qd["q4"], qd["scale"], jnp.float32))
    np.testing.assert_allclose(back, np.asarray(w), rtol=1e-6, atol=1e-7)


def test_q4_pack_pads_to_256():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((300, 128)) * 0.1, jnp.float32)
    qd = quantize_linear_q4(w)
    kp = 512  # 300 -> 512
    assert qd["q4"].shape == (kp // 2, 128)
    assert qd["scale"].shape == (kp // 128, 128)
    back = np.asarray(dequantize_q4(qd["q4"], qd["scale"], jnp.float32))
    assert np.abs(back[300:]).max() == 0.0  # padded rows dequantize to zero


def test_q4_grouped_beats_per_column_absmax():
    """Group-128 scales must reconstruct better than one whole-column scale
    when magnitude varies along the input dim (the reason for grouping)."""
    rng = np.random.default_rng(2)
    k, n = 1024, 256
    w = rng.standard_normal((k, n)).astype(np.float32)
    w[: k // 2] *= 8.0  # top half dominates a whole-column absmax
    qd = quantize_linear_q4(jnp.asarray(w))
    back = np.asarray(dequantize_q4(qd["q4"], qd["scale"], jnp.float32))
    err_grouped = np.abs(back - w).mean()
    scale_col = np.abs(w).max(axis=0, keepdims=True) / 7.0
    back_col = np.clip(np.round(w / scale_col), -7, 7) * scale_col
    err_col = np.abs(back_col - w).mean()
    # Large-magnitude half keeps column-level error; the small half improves
    # ~8x, so the mean lands just above half the column error.
    assert err_grouped < 0.6 * err_col, (err_grouped, err_col)


def test_linear_q4_kernel_matches_xla():
    rng = np.random.default_rng(3)
    for b, h, o in [(1, 256, 512), (4, 512, 640), (8, 300, 384)]:
        w = jnp.asarray(rng.standard_normal((h, o)) * 0.1, jnp.float32)
        q = quantize_linear_q4(w)
        x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
        want = np.asarray(linear_q4_xla(x, q, out_dtype=jnp.float32))
        got = np.asarray(linear_q4(x, q, out_dtype=jnp.float32, interpret=INTERPRET))
        # Kernel folds group scales post-dot in f32; the XLA path dequantizes
        # to bf16 first — bf16 weight rounding bounds the difference.
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_linear_q4_kblocked_tall_weight():
    """Tall weights (the dense down shape 6848x1280) take the K-blocked
    accumulating kernel; 6848 pads to 6912 (kp2=3456 -> 128-multiple block)."""
    from deepseek_ocr2_tpu.ops.linear_q4 import _pick_block_k2

    rng = np.random.default_rng(4)
    h, o, b = 6848, 1280, 2
    w = jnp.asarray(rng.standard_normal((h, o)) * 0.02, jnp.float32)
    q = quantize_linear_q4(w)
    kp2 = q["q4"].shape[0]
    assert kp2 == 3456
    bk2 = _pick_block_k2(kp2, o)
    assert bk2 is not None and bk2 < kp2 and kp2 % bk2 == 0 and bk2 % 128 == 0
    x = jnp.asarray(rng.standard_normal((b, h)) * 0.5, jnp.bfloat16)
    want = np.asarray(linear_q4_xla(x, q, out_dtype=jnp.float32))
    got = np.asarray(linear_q4(x, q, out_dtype=jnp.float32, interpret=INTERPRET))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_qmm_dispatches_q4():
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((256, 384)) * 0.1, jnp.float32)
    q = quantize_linear_q4(w)
    assert is_qlinear(q)
    x = jnp.asarray(rng.standard_normal((2, 256)) * 0.5, jnp.bfloat16)
    got = np.asarray(qmm(x, q, decode=False, out_dtype=jnp.float32))
    want = np.asarray(linear_q4_xla(x, q, out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
    # Quantized product tracks the bf16 matmul within int4 group error.
    full = np.asarray(x.astype(jnp.float32) @ w)
    denom = max(np.abs(full).max(), 1e-6)
    assert np.abs(got - full).max() / denom < 0.12


def test_quantize_q4_grouped_leading_dims():
    """Expert-stacked [E, K, N] quantization packs each expert independently."""
    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((3, 256, 128)) * 0.1, jnp.float32)
    q4, sc = quantize_q4_grouped(w)
    assert q4.shape == (3, 128, 128) and sc.shape == (3, 2, 128)
    back = np.asarray(dequantize_q4(q4, sc, jnp.float32))
    for e in range(3):
        qe, se = quantize_q4_grouped(w[e])
        np.testing.assert_array_equal(np.asarray(q4[e]), np.asarray(qe))
        np.testing.assert_allclose(
            back[e], np.asarray(dequantize_q4(qe, se, jnp.float32))
        )


def test_pack_q4_offset_lo_identity():
    """Pin the offset-lo pack contract: a SIGN-EXTENDED byte view v of the
    packed data satisfies v == 16*hi + (lo+8) exactly — the identity every
    q4 kernel's dot decomposition (q4_dot_slabs) relies on. Also pin that a
    0xFF-masked widen corrupts every negative high nibble (off by +16), so
    a future caller can't regress the sign-extended-widen requirement."""
    from deepseek_ocr2_tpu.ops.linear_q4 import pack_q4, unpack_q4

    # All 225 (lo, hi) nibble pairs on the int4 grid, one packed block.
    lo_v = np.repeat(np.arange(-7, 8), 15)[:128]
    hi_v = np.tile(np.arange(-7, 8), 15)[:128]
    q = jnp.asarray(np.concatenate([lo_v, hi_v]), jnp.int32)[:, None]  # [256, 1]
    packed = pack_q4(q)  # int8 [128, 1]

    signed = np.asarray(packed.astype(jnp.int32))  # the contract: sign-extended
    np.testing.assert_array_equal(signed[:, 0], 16 * hi_v + lo_v + 8)

    lo, hi = unpack_q4(jnp.asarray(signed))
    np.testing.assert_array_equal(np.asarray(lo)[:, 0], lo_v)
    np.testing.assert_array_equal(np.asarray(hi)[:, 0], hi_v)

    masked = jnp.asarray(signed) & 0xFF  # the forbidden widen
    lo_m, hi_m = unpack_q4(masked)
    # Low nibble survives (the mask keeps bits 0..3)...
    np.testing.assert_array_equal(np.asarray(lo_m), np.asarray(lo))
    # ...but every negative high nibble reads wrong (off by +16).
    neg = hi_v < 0
    assert neg.any()
    np.testing.assert_array_equal(np.asarray(hi_m)[neg, 0], hi_v[neg] + 16)
    np.testing.assert_array_equal(np.asarray(hi_m)[~neg, 0], hi_v[~neg])
