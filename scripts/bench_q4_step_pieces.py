"""Where does the int4 b=1 decode step spend its ~720 us?

Replays the unrolled q4 decode layer loop (_lm_forward_q8's decode path)
with pieces ablated, at the full LM config (12 layers, cap=512, pos=300):

  full        — the real step: attention + MoE + lm_head + ban/argmax
  no_head     — stop at the final hidden (drops lm_head + sampling head)
  no_attnmath — keep wqkv/wo kernels, replace the attention math (rope, KV
                write, masked sdpa over the pool) with a reshape of q
  no_attn     — drop the whole attention block (isolates ln/residual+FFN)
  no_moe      — attention full, FFN replaced with identity
  moe_only    — router + fused expert kernel alone per layer

Differences between rows attribute the step: XLA attention glue =
no_head - no_attnmath_no_head, etc. Diff-method timings (64 vs 512 scan).
Run manually on an idle TPU.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

from _bench_util import chain, time_chain  # noqa: E402

from deepseek_ocr2_tpu.configs import DeepseekV2Config
from deepseek_ocr2_tpu.models import deepseek_v2 as dsv2
from deepseek_ocr2_tpu.ops.norms import rms_norm
from deepseek_ocr2_tpu.ops.sampling import greedy_pick, ngram_ban_mask

B = 1
CAP = 512
POS = 300
NGRAM = 20


def build():
    cfg = DeepseekV2Config()
    key = jax.random.PRNGKey(0)
    params = dsv2.init_params(cfg, key, dtype=jnp.bfloat16)
    params = dsv2.quantize_lm_params(params, scope="full", bits=4)
    cache = {
        "k": jax.random.normal(
            key, (cfg.num_hidden_layers, B, cfg.num_attention_heads, CAP, cfg.head_dim),
            jnp.bfloat16,
        ),
        "v": jax.random.normal(
            key, (cfg.num_hidden_layers, B, cfg.num_attention_heads, CAP, cfg.head_dim),
            jnp.bfloat16,
        ),
    }
    return cfg, params, cache


def step(x, params, cfg, cache, *, attn="full", ffn="full", head=True,
         tokens=None, lens=None):
    """x: [B, 1, H]. Returns a small tensor to force execution."""
    cos, sin = dsv2._rope_consts(cfg)
    ld = cfg.first_k_dense_replace
    b, s, h = x.shape
    k_all, v_all = cache["k"], cache["v"]
    pos = jnp.int32(POS)

    def attn_block(xn, layer, li):
        nonlocal k_all, v_all
        if attn == "full":
            out, k_all, v_all = dsv2._decode_attention(
                xn, layer["attn"], cfg, cos, sin, k_all, v_all, li, pos, "pool"
            )
            return out
        if attn == "gemms":
            nh, d = cfg.num_attention_heads, cfg.head_dim
            q, k, v = dsv2._qkv_proj(xn, layer["attn"], b, s, nh, d, decode=True)
            ctx = (q + 0.0 * k[:, :, :1] + 0.0 * v[:, :, :1]).transpose(0, 2, 1, 3)
            ctx = ctx.reshape(b, s, h).astype(xn.dtype)
            return dsv2._o_proj(ctx, layer["attn"], decode=True)
        return jnp.zeros_like(xn)

    def ffn_block(x_flat, layer, q8):
        if ffn == "full":
            return dsv2._q8_ffn(x_flat, layer, cfg, q8, decode=True, is_prefill=False)
        if ffn == "moe_only" and q8 is not None:
            # routed kernel only (no shared / dense fallbacks)
            return dsv2._q8_ffn(
                x_flat,
                {k: v for k, v in layer.items() if k in ("router",)},
                cfg,
                q8,
                decode=True,
                is_prefill=False,
            )
        return jnp.zeros_like(x_flat)

    for i in range(ld):
        layer = dsv2._q8_layer_weights(params, "dense", i)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        x = res + attn_block(xn, layer, i)
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        if ffn in ("full",):
            mlp = dsv2._q8_ffn(
                xn.reshape(b * s, h), layer, cfg, None, decode=True, is_prefill=False
            )
        else:
            mlp = jnp.zeros((b * s, h), x.dtype)
        x = res + mlp.reshape(b, s, h)

    for j, q8 in enumerate(params["moe_q8"]):
        li = ld + j
        layer = dsv2._q8_layer_weights(params, "moe", j)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        x = res + attn_block(xn, layer, li)
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        x = res + ffn_block(xn.reshape(b * s, h), layer, q8).reshape(b, s, h)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    if not head:
        return hidden[:, -1, :8]
    logits = dsv2.logits_last(params, hidden).astype(jnp.float32)
    if tokens is not None:
        ban = jax.vmap(ngram_ban_mask, in_axes=(0, 0, None, None))(
            tokens, lens, NGRAM, logits.shape[-1]
        )
        pick = jax.vmap(greedy_pick)(logits, ban)
        return pick[:, None].astype(jnp.float32)
    return logits[:, :8]


def main():
    print(f"device: {jax.devices()[0]}  B={B} cap={CAP}")
    cfg, params, cache = build()
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, 1, cfg.hidden_size), jnp.bfloat16)
    tokens = jax.random.randint(key, (B, 2048), 0, cfg.vocab_size, jnp.int32)
    lens = jnp.full((B,), POS, jnp.int32)

    rows = [
        ("full step (+ban/argmax)", dict(attn="full", ffn="full", head=True, tokens=tokens, lens=lens)),
        ("full, plain logits", dict(attn="full", ffn="full", head=True)),
        ("no_head", dict(attn="full", ffn="full", head=False)),
        ("no_attnmath (gemms kept)", dict(attn="gemms", ffn="full", head=False)),
        ("no_attn", dict(attn="none", ffn="full", head=False)),
        ("no_moe (attn only)", dict(attn="full", ffn="none", head=False)),
        ("moe_only", dict(attn="none", ffn="moe_only", head=False)),
        ("norms only", dict(attn="none", ffn="none", head=False)),
    ]
    for name, kw in rows:
        use_tok = kw.pop("tokens", None) is not None
        kw.pop("lens", None)
        if use_tok:
            body = lambda x, p, c, tk, ln, kw=kw: step(
                x, p, cfg, c, tokens=tk, lens=ln, **kw
            )
            dt = time_chain(chain(body), x, params, cache, tokens, lens)
        else:
            body = lambda x, p, c, kw=kw: step(x, p, cfg, c, **kw)
            dt = time_chain(chain(body), x, params, cache)
        print(f"{name:28s}  {dt * 1e6:8.1f} us/step")


if __name__ == "__main__":
    main()
