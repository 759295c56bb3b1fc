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


def _pe_streams(h, i_e, n_sh, seed=7):
    """Shared-MLP pseudo-expert streams, split as quantize_lm_params does."""
    rng = np.random.default_rng(seed)
    i_tot = n_sh * i_e
    gate = jnp.asarray(rng.standard_normal((h, i_tot)).astype(np.float32) * 0.05)
    up = jnp.asarray(rng.standard_normal((h, i_tot)).astype(np.float32) * 0.05)
    down = jnp.asarray(rng.standard_normal((i_tot, h)).astype(np.float32) * 0.05)
    pe = quantize_experts(
        {
            "gate": jnp.stack([gate[:, t * i_e : (t + 1) * i_e] for t in range(n_sh)]),
            "up": jnp.stack([up[:, t * i_e : (t + 1) * i_e] for t in range(n_sh)]),
            "down": jnp.stack([down[t * i_e : (t + 1) * i_e, :] for t in range(n_sh)]),
        }
    )
    return {f"pe_{k}": v for k, v in pe.items()}


def _pe_reference(x, pe, n_sh):
    """Shared contribution via the per-selection XLA reference: every row
    'selects' each pseudo-expert once with weight 1."""
    b = x.shape[0]
    as_experts = {k[len("pe_") :]: v for k, v in pe.items()}
    ids = jnp.tile(jnp.arange(n_sh, dtype=jnp.int32)[None], (b, 1))
    ones = jnp.ones((b, n_sh), jnp.float32)
    return np.asarray(moe_ffn_decode_q8_xla(x, as_experts, ones, ids))


@pytest.mark.parametrize("b", [8, 32])
def test_q8_fused_with_shared_pe(b):
    e, h, i, k, n_sh = 16, 64, 96, 4, 2
    experts_q8 = quantize_experts(_experts(e, h, i))
    pe = _pe_streams(h, i, n_sh)
    x, w, idx = _routing(b, e, k, h)
    ref = np.asarray(moe_ffn_decode_q8_xla(x, experts_q8, w, idx)) + _pe_reference(
        x, pe, n_sh
    )
    got = np.asarray(
        moe_ffn_decode_q8_fused(x, {**experts_q8, **pe}, w, idx, interpret=True)
    )
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)


def test_q8_per_selection_with_shared_pe():
    from deepseek_ocr2_tpu.ops.moe_q8 import moe_ffn_decode_q8

    e, h, i, k, n_sh, b = 16, 64, 96, 4, 2, 1
    experts_q8 = quantize_experts(_experts(e, h, i))
    pe = _pe_streams(h, i, n_sh)
    x, w, idx = _routing(b, e, k, h)
    ref = np.asarray(moe_ffn_decode_q8_xla(x, experts_q8, w, idx)) + _pe_reference(
        x, pe, n_sh
    )
    got = np.asarray(
        moe_ffn_decode_q8(
            x, {**experts_q8, **pe}, w, idx, with_shared=True, interpret=True
        )
    )
    np.testing.assert_allclose(got, ref, atol=2e-6, rtol=2e-6)


def test_quantize_lm_params_builds_pe_streams():
    """Full-scope quantization splits the shared MLP into expert-shaped
    pseudo-experts whose dequantized halves reassemble the shared weights."""
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from reference_torch import random_lm_flat
    from deepseek_ocr2_tpu.configs import tiny_lm_config
    from deepseek_ocr2_tpu.io import DtypePolicy
    from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2

    cfg = tiny_lm_config()
    flat = {k: jnp.asarray(v) for k, v in random_lm_flat(cfg, seed=3).items()}
    params, rep = dsv2.params_from_flat(flat, cfg)
    rep.raise_on_errors()
    params = jax.tree_util.tree_map(jnp.asarray, params)
    shared = params["layers_moe"]["shared"]
    q = dsv2.quantize_lm_params(params, scope="full")
    ent = q["moe_q8"][0]
    assert "pe_gu_q8" in ent
    i_e = ent["gu_q8"].shape[-1] // 2
    n_sh = shared["gate"].shape[-1] // i_e
    assert ent["pe_gu_q8"].shape[0] == n_sh
    # Dequantized pe halves stitch back into the shared weights (to int8
    # rounding error of the per-half scales).
    gu = np.asarray(ent["pe_gu_q8"], np.float32) * np.asarray(ent["pe_gu_scale"])
    gate_re = np.concatenate([gu[t, :, :i_e] for t in range(n_sh)], axis=-1)
    np.testing.assert_allclose(
        gate_re, np.asarray(shared["gate"][0], np.float32), atol=2e-3, rtol=2e-2
    )


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
