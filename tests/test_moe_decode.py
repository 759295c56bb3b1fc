"""Fused distinct-expert batched-decode MoE kernels vs the XLA paths.

Kernels run in interpret mode (works on any backend); on TPU the same code
path is compiled. The distinct-visit schedule is unit-tested directly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.ops.moe import moe_ffn_dense, route
from deepseek_ocr2_tpu.ops.moe_decode import (
    _distinct_schedule,
    moe_ffn_decode_fused,
    moe_ffn_decode_q8_fused,
)
from deepseek_ocr2_tpu.ops.moe_q8 import moe_ffn_decode_q8_xla, quantize_experts


def _experts(e, h, i, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    return {
        "gate": jnp.asarray(rng.standard_normal((e, h, i)).astype(dtype) * 0.05),
        "up": jnp.asarray(rng.standard_normal((e, h, i)).astype(dtype) * 0.05),
        "down": jnp.asarray(rng.standard_normal((e, i, h)).astype(dtype) * 0.05),
    }


def _routing(b, e, k, h, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, h)).astype(np.float32))
    router = jnp.asarray(rng.standard_normal((h, e)).astype(np.float32) * 0.1)
    w, idx = route(x, router, k)
    return x, w, idx


@pytest.mark.parametrize("idx_rows", [
    [[0, 1], [2, 3]],            # all distinct
    [[5, 5], [5, 5]],            # single expert repeated (duplicate in a row)
    [[0, 7], [7, 0]],            # shared across rows
])
def test_distinct_schedule(idx_rows):
    e = 8
    idx = jnp.asarray(idx_rows, jnp.int32)
    ve, valid = jax.tree_util.tree_map(np.asarray, _distinct_schedule(idx, e))
    distinct = sorted(set(np.asarray(idx).ravel().tolist()))
    assert ve[: len(distinct)].tolist() == distinct
    assert valid.sum() == len(distinct)
    # pad slots repeat the last distinct id (so their DMA is index-skipped)
    assert all(v == distinct[-1] for v in ve[len(distinct) :])
    assert valid[len(distinct) :].sum() == 0


@pytest.mark.parametrize("b", [4, 13, 16])
def test_fused_matches_dense_f32(b):
    e, h, i, k = 16, 64, 96, 4
    experts = _experts(e, h, i)
    x, w, idx = _routing(b, e, k, h)
    ref = moe_ffn_dense(x, experts, w, idx)
    got = moe_ffn_decode_fused(x, experts, w, idx, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6, rtol=2e-6)


def test_fused_split_path_matches_dense():
    # Big enough that the contraction-split (n_s=2) path engages.
    e, h, i, k, b = 4, 1280, 896, 4, 8
    experts = _experts(e, h, i)
    x, w, idx = _routing(b, e, k, h)
    ref = np.asarray(moe_ffn_dense(x, experts, w, idx))
    got = np.asarray(moe_ffn_decode_fused(x, experts, w, idx, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=2e-5)


def test_fused_bf16_close_to_dense():
    e, h, i, k, b = 16, 64, 96, 4, 13
    experts = {kk: v.astype(jnp.bfloat16) for kk, v in _experts(e, h, i).items()}
    x, w, idx = _routing(b, e, k, h)
    x = x.astype(jnp.bfloat16)
    ref = np.asarray(moe_ffn_dense(x, experts, w, idx), np.float32)
    got = np.asarray(moe_ffn_decode_fused(x, experts, w, idx, interpret=True), np.float32)
    # bf16 rounding points differ only in the gate/up accumulation order
    # (f32 scratch vs per-dot rounding) — a few bf16 ULPs at these scales.
    np.testing.assert_allclose(got, ref, atol=0.05, rtol=0.05)


@pytest.mark.parametrize("b", [8, 32])
def test_q8_fused_matches_q8_xla(b):
    e, h, i, k = 16, 64, 96, 4
    experts = _experts(e, h, i)
    experts_q8 = quantize_experts(experts)
    x, w, idx = _routing(b, e, k, h)
    ref = np.asarray(moe_ffn_decode_q8_xla(x, experts_q8, w, idx))
    got = np.asarray(moe_ffn_decode_q8_fused(x, experts_q8, w, idx, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)


def test_fused_unselected_experts_do_not_contribute():
    # Poison every expert that routing did not select with NaN weights: the
    # fused kernel must never read them into the result.
    e, h, i, k, b = 16, 64, 96, 2, 3
    experts = _experts(e, h, i)
    x, w, idx = _routing(b, e, k, h)
    selected = np.unique(np.asarray(idx).ravel())
    mask = np.ones((e,), bool)
    mask[selected] = False
    poisoned = {
        kk: jnp.asarray(
            np.where(mask[:, None, None], np.nan, np.asarray(v))
        )
        for kk, v in experts.items()
    }
    got = np.asarray(moe_ffn_decode_fused(x, poisoned, w, idx, interpret=True))
    assert np.isfinite(got).all()
