"""Unit tests for core ops: RoPE, norms, MoE dispatch, sampling."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from deepseek_ocr2_tpu.ops import moe as moe_ops
from deepseek_ocr2_tpu.ops.norms import layer_norm, layer_norm_2d, rms_norm
from deepseek_ocr2_tpu.ops.rope import apply_rope, rope_cache
from deepseek_ocr2_tpu.ops.sampling import greedy_pick, ngram_ban_mask

import reference_torch as ref


def test_rope_matches_torch():
    b, h, s, d = 2, 3, 7, 16
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)

    cos_t, sin_t = ref.rope_cos_sin(s, d, 10000.0, start=5)
    qt, kt = ref.apply_rope(torch.from_numpy(q), torch.from_numpy(k), cos_t, sin_t)

    cos, sin = rope_cache(64, d, 10000.0)
    qj, kj = apply_rope(jnp.asarray(q), jnp.asarray(k), jnp.asarray(cos), jnp.asarray(sin), start=5)

    np.testing.assert_allclose(np.asarray(qj), qt.numpy(), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(kj), kt.numpy(), rtol=1e-5, atol=1e-5)


def test_rms_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 5, 32)).astype(np.float32)
    w = rng.standard_normal(32).astype(np.float32)
    want = ref.rms_norm(torch.from_numpy(x), torch.from_numpy(w), 1e-6).numpy()
    got = np.asarray(rms_norm(jnp.asarray(x), jnp.asarray(w), 1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_layer_norm_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 4, 16)).astype(np.float32)
    w = rng.standard_normal(16).astype(np.float32)
    b = rng.standard_normal(16).astype(np.float32)
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), 1e-6
    ).numpy()
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-6))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_layer_norm_2d_matches_reference():
    """SAM LayerNorm2d: normalize over channels with biased var (sam.rs:161-175)."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 8, 5, 5)).astype(np.float32)
    w = rng.standard_normal(8).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    xt = torch.from_numpy(x)
    mean = xt.mean(1, keepdim=True)
    var = (xt - mean).pow(2).mean(1, keepdim=True)
    want = (xt - mean) / torch.sqrt(var + 1e-6)
    want = want * torch.from_numpy(w)[None, :, None, None] + torch.from_numpy(b)[
        None, :, None, None
    ]
    got = np.asarray(layer_norm_2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 1e-6))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-5)


def _moe_oracle(x, router, experts, top_k):
    """Naive MoE in numpy (token loop)."""
    n, h = x.shape
    logits = x @ router
    e_probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e_probs / e_probs.sum(-1, keepdims=True)
    out = np.zeros_like(x)
    for t in range(n):
        idx = np.argsort(-probs[t], kind="stable")[:top_k]
        for e in idx:
            g = x[t] @ experts["gate"][e]
            u = x[t] @ experts["up"][e]
            act = g / (1 + np.exp(-g)) * u
            out[t] += probs[t, e] * (act @ experts["down"][e])
    return out


def test_moe_prefill_and_decode_match_oracle():
    rng = np.random.default_rng(4)
    n, h, i, e, k = 13, 16, 8, 6, 2
    x = rng.standard_normal((n, h)).astype(np.float32) * 0.5
    router = rng.standard_normal((h, e)).astype(np.float32) * 0.3
    experts = {
        "gate": rng.standard_normal((e, h, i)).astype(np.float32) * 0.3,
        "up": rng.standard_normal((e, h, i)).astype(np.float32) * 0.3,
        "down": rng.standard_normal((e, i, h)).astype(np.float32) * 0.3,
    }
    want = _moe_oracle(x, router, experts, k)

    xj = jnp.asarray(x)
    ej = {kk: jnp.asarray(v) for kk, v in experts.items()}
    weights, idx = moe_ops.route(xj, jnp.asarray(router), k)
    for name, fn in (
        ("dense", moe_ops.moe_ffn_dense),
        ("ragged", moe_ops.moe_ffn_ragged),
        ("decode", moe_ops.moe_ffn_decode),
        ("prefill", moe_ops.moe_ffn_prefill),
    ):
        got = np.asarray(fn(xj, ej, weights, idx))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5, err_msg=name)

    # decode slice branch (N*k <= E): same answer
    got = np.asarray(moe_ops.moe_ffn_decode(xj[:3], ej, weights[:3], idx[:3]))
    np.testing.assert_allclose(got, want[:3], rtol=1e-4, atol=1e-5)


def test_ngram_ban_mask_matches_reference():
    rng = np.random.default_rng(5)
    vocab = 50
    for n in (0, 2, 3, 4):
        for trial in range(20):
            length = int(rng.integers(1, 30))
            ids = rng.integers(0, 8, size=length).tolist()  # small alphabet → collisions
            want = set(ref.no_repeat_ngram_banned_ids(ids, n))

            buf = np.zeros(40, np.int32)
            buf[:length] = ids
            mask = np.asarray(
                ngram_ban_mask(jnp.asarray(buf), jnp.int32(length), n, vocab)
            )
            got = set(np.nonzero(mask)[0].tolist())
            assert got == want, (n, ids)


def test_greedy_pick():
    logits = jnp.asarray([1.0, 5.0, 5.0, np.nan, 2.0])
    assert int(greedy_pick(logits)) == 1  # first max wins; NaN skipped
    ban = jnp.asarray([False, True, False, False, False])
    assert int(greedy_pick(logits, ban)) == 2
