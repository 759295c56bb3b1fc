"""Qwen2 tower ablations (crop shape: 8 views of 12x12 features, seq 288).

FLOP ledger per layer at B=8, S=288 (tokens 2304): qkv 4.76G + wo 3.70G +
gateup 40.2G + down 20.1G bf16, attention dots 2.38G in f32 (parity
requirement) — ~71 GFLOP/layer, 1.71 TFLOP for the 24-layer tower, i.e.
~21 ms at the measured 80 TF/s plain-GEMM rate. Use the variant deltas to
attribute anything above that, not single-layer timings (noisy on this
backend).
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

from deepseek_ocr2_tpu.configs import OCR2Config
from deepseek_ocr2_tpu.models import qwen2 as q2
from deepseek_ocr2_tpu.ops.attention import prefix_lm_mask, repeat_kv, sdpa
from deepseek_ocr2_tpu.ops.flash_attention import mha_pallas
from deepseek_ocr2_tpu.ops.norms import rms_norm
from deepseek_ocr2_tpu.ops.rope import apply_rope

from _bench_util import chain, time_chain  # noqa: E402

ITERS = dict(reps=3)
B = 8


def layer_variant(x, lp, cfg, mask, cos, sin, n_prefix, *, attn=True, mlp=True,
                  attn_bf16=False, use_sdpa=False):
    b, s, h = x.shape
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    dt = x.dtype
    if attn:
        res = x
        xn = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
        qkv = xn @ lp["wqkv"] + lp["bqkv"].astype(dt)
        q = qkv[..., :h].reshape(b, s, nh, d).transpose(0, 2, 1, 3)
        kvh = nkv * d
        k = qkv[..., h : h + kvh].reshape(b, s, nkv, d).transpose(0, 2, 1, 3)
        v = qkv[..., h + kvh :].reshape(b, s, nkv, d).transpose(0, 2, 1, 3)
        q32, k32 = apply_rope(q, k, cos, sin, start=0)
        k32 = repeat_kv(k32, cfg.gqa_groups)
        v32 = repeat_kv(v.astype(jnp.float32), cfg.gqa_groups)
        if attn_bf16:
            q32, k32, v32 = (t.astype(jnp.bfloat16) for t in (q32, k32, v32))
        if use_sdpa:
            ctx = sdpa(q32, k32, v32, scale=1.0 / math.sqrt(d), mask=mask, out_dtype=dt)
        else:
            ctx = mha_pallas(q32, k32, v32, scale=1.0 / math.sqrt(d), mode="prefix",
                             n_prefix=n_prefix, out_dtype=dt)
        x = res + ctx.transpose(0, 2, 1, 3).reshape(b, s, h) @ lp["wo"]
    if mlp:
        res = x
        xn = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
        gu = xn @ lp["gateup"]
        i_dim = gu.shape[-1] // 2
        act = jax.nn.silu(gu[..., :i_dim].astype(jnp.float32)).astype(dt) * gu[..., i_dim:]
        x = res + act @ lp["down"]
    return x


def main():
    run_shape(OCR2Config().qwen2, crop=True)
    run_shape(OCR2Config().qwen2, crop=False)


def run_shape(cfg, crop: bool):
    key = jax.random.PRNGKey(0)
    params = q2.init_params(cfg, key, dtype=jnp.bfloat16)
    n_query = cfg.n_query_768 if crop else cfg.n_query_1024
    seq = 2 * n_query
    x = jax.random.normal(key, (B, seq, cfg.hidden_size), jnp.bfloat16)
    mask = prefix_lm_mask(seq, n_query)[None, None]
    cos, sin = q2._rope_consts(cfg, seq)
    print(f"device: {jax.devices()[0]}  B={B} seq={seq}")

    def tower(x, layers, **kw):
        def body(c, lp):
            return layer_variant(c, lp, cfg, mask, cos, sin, n_query, **kw), None

        out, _ = jax.lax.scan(body, x, layers)
        return out

    variants = [
        ("full tower", {}),
        ("attn bf16 (bench only)", {"attn_bf16": True}),
        ("xla sdpa attention", {"use_sdpa": True}),
        ("no attention", {"attn": False}),
        ("no MLP", {"mlp": False}),
    ]
    base = None
    for name, kw in variants:
        dt = time_chain(chain(lambda x, layers, kw=kw: tower(x, layers, **kw)), x, params["layers"], **ITERS)
        delta = "" if base is None else f"  (delta {1e3 * (base - dt):+7.2f} ms)"
        if base is None:
            base = dt
        print(f"{name:24s}  {dt * 1e3:8.2f} ms{delta}")


if __name__ == "__main__":
    main()
