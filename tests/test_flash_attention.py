"""Pallas attention kernel parity vs the XLA reference path.

Runs compiled on TPU, interpreted elsewhere, so CI without TPU still checks
the kernel math.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepseek_ocr2_tpu.ops.attention import causal_mask, prefix_lm_mask, sdpa
from deepseek_ocr2_tpu.ops.flash_attention import mha_pallas

INTERPRET = jax.default_backend() != "tpu"


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("lq,lk", [(256, 256), (300, 300), (128, 512)])
def test_plain_attention(lq, lk):
    b, h, d = 2, 3, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand(ks[0], b, h, lq, d)
    k = _rand(ks[1], b, h, lk, d)
    v = _rand(ks[2], b, h, lk, d)
    scale = 1.0 / math.sqrt(d)
    want = np.asarray(sdpa(q, k, v, scale=scale))
    got = np.asarray(mha_pallas(q, k, v, scale=scale, interpret=INTERPRET))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("s", [256, 384, 901])
def test_causal_attention(s):
    b, h, d = 1, 4, 128
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand(ks[0], b, h, s, d)
    k = _rand(ks[1], b, h, s, d)
    v = _rand(ks[2], b, h, s, d)
    scale = 1.0 / math.sqrt(d)
    want = np.asarray(sdpa(q, k, v, scale=scale, mask=causal_mask(s, s)[None, None]))
    got = np.asarray(mha_pallas(q, k, v, scale=scale, mode="causal", interpret=INTERPRET))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("n_query", [144, 256])
def test_prefix_lm_attention(n_query):
    b, h, d = 2, 2, 64
    s = 2 * n_query
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand(ks[0], b, h, s, d)
    k = _rand(ks[1], b, h, s, d)
    v = _rand(ks[2], b, h, s, d)
    scale = 1.0 / math.sqrt(d)
    want = np.asarray(
        sdpa(q, k, v, scale=scale, mask=prefix_lm_mask(s, n_query)[None, None])
    )
    got = np.asarray(
        mha_pallas(q, k, v, scale=scale, mode="prefix", n_prefix=n_query, interpret=INTERPRET)
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("side", [16, 48])
def test_relpos_attention(side):
    """SAM-style decomposed rel-pos bias folded into the kernel."""
    b, h, d = 1, 2, 64
    l = side * side
    ks = jax.random.split(jax.random.PRNGKey(3), 5)
    q = _rand(ks[0], b, h, l, d)
    k = _rand(ks[1], b, h, l, d)
    v = _rand(ks[2], b, h, l, d)
    rel_h = _rand(ks[3], b, h, l, side) * 0.3
    rel_w = _rand(ks[4], b, h, l, side) * 0.3
    scale = 1.0 / math.sqrt(d)

    bias = (rel_h[..., :, None] + rel_w[..., None, :]).reshape(b, h, l, l)
    want = np.asarray(sdpa(q, k, v, scale=scale, bias=bias))
    got = np.asarray(
        mha_pallas(q, k, v, scale=scale, rel_h=rel_h, rel_w=rel_w, interpret=INTERPRET)
    )
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_sam_padded_window_attention():
    """SAM 14x14 windows padded to 16x16 for the fused kernel: the padded
    path (keys masked through the rel bias) must match the unpadded XLA
    reference exactly on the valid region."""
    from deepseek_ocr2_tpu.models.sam import _attention

    heads, hd, win, pad = 2, 64, 14, 16
    dim = heads * hd
    ks = jax.random.split(jax.random.PRNGKey(7), 4)
    wins = jax.random.normal(ks[0], (3, win, win, dim), jnp.float32)
    attn = {
        "qkv_w": jax.random.normal(ks[1], (dim, 3 * dim), jnp.float32) * 0.05,
        "qkv_b": jax.random.normal(ks[2], (3 * dim,), jnp.float32) * 0.02,
        "proj_w": jax.random.normal(ks[3], (dim, dim), jnp.float32) * 0.05,
        "proj_b": jnp.zeros((dim,), jnp.float32),
        "rel_h": jax.random.normal(ks[0], (2 * win - 1, hd), jnp.float32) * 0.1,
        "rel_w": jax.random.normal(ks[1], (2 * win - 1, hd), jnp.float32) * 0.1,
    }
    want = np.asarray(_attention(wins, attn, heads))  # L=196: XLA path
    padded = jnp.pad(wins, ((0, 0), (0, pad - win), (0, pad - win), (0, 0)))
    got = np.asarray(_attention(padded, attn, heads, valid_hw=(win, win)))
    np.testing.assert_allclose(got[:, :win, :win, :], want, rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("win,valid", [(16, 14), (16, 16)])
def test_windowed_inkernel_relpos(win, valid):
    """mha_win_pallas computes the decomposed rel bias from the flattened
    tables inside the kernel; must match the streamed-bias reference on the
    valid region (padded-query rows are specified garbage)."""
    from deepseek_ocr2_tpu.ops.flash_attention import mha_win_pallas

    b, h, d = 3, 2, 64
    t2 = win * win
    ks = jax.random.split(jax.random.PRNGKey(11), 5)
    q = _rand(ks[0], b, h, t2, d)
    k = _rand(ks[1], b, h, t2, d)
    v = _rand(ks[2], b, h, t2, d)
    # Zero out padded token positions like the model's window pad does.
    pos = np.arange(t2)
    valid_tok = ((pos // win < valid) & (pos % win < valid)).astype(np.float32)
    q = q * valid_tok[None, None, :, None]
    k = k * valid_tok[None, None, :, None]
    v = v * valid_tok[None, None, :, None]
    rh_tab = _rand(ks[3], valid, valid, d) * 0.3  # [h, kh, c]
    rw_tab = _rand(ks[4], valid, valid, d) * 0.3
    scale = 1.0 / math.sqrt(d)

    # Reference: explicit [T2, T2] bias with -1e30 on padded keys.
    q4 = np.asarray(q).reshape(b, h, win, win, d)
    rel_h = np.einsum("bhywc,yxc->bhywx", q4[:, :, :valid, :valid], np.asarray(rh_tab))
    rel_w = np.einsum("bhywc,wxc->bhywx", q4[:, :, :valid, :valid], np.asarray(rw_tab))
    bias = np.full((b, h, win, win, win, win), -1.0e30, np.float32)
    bias[:, :, :valid, :valid, :valid, :valid] = (
        rel_h[:, :, :, :, :, None] + rel_w[:, :, :, :, None, :]
    )
    bias_flat = jnp.asarray(bias.reshape(b, h, t2, t2))
    want = np.asarray(sdpa(q, k, v, scale=scale, bias=bias_flat))

    pad = win - valid
    rhf = (
        jnp.pad(rh_tab, ((0, pad), (0, pad), (0, 0))).transpose(2, 0, 1).reshape(d, t2)
    )
    rwf = (
        jnp.pad(rw_tab, ((0, pad), (0, pad), (0, 0))).transpose(2, 0, 1).reshape(d, t2)
    )
    got = np.asarray(
        mha_win_pallas(
            q, k, v, rhf, rwf, scale=scale, win=win, valid=valid, interpret=INTERPRET
        )
    )
    vq = valid_tok.reshape(win, win).astype(bool)
    np.testing.assert_allclose(
        got.reshape(b, h, win, win, d)[:, :, vq],
        want.reshape(b, h, win, win, d)[:, :, vq],
        rtol=3e-5,
        atol=3e-5,
    )
