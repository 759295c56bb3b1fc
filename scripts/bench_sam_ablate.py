"""SAM tower ablations: time the 12-block tower with one piece removed per
variant. Tower-level diffs are the only reliable signal on this backend
(single-block timings swing 2x run to run); each variant's delta vs the full
tower is that piece's in-context cost including whatever XLA fuses around it.
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
from deepseek_ocr2_tpu.models import sam as sam_mod
from deepseek_ocr2_tpu.ops.flash_attention import mha_pallas

from _bench_util import chain, time_chain  # noqa: E402

ITERS = dict(iters_lo=16, iters_hi=80, reps=3)
B = 4


def block_variant(x, blk, cfg, window, *, mlp=True, ln=True, rel=True, attn=True):
    shortcut = x
    if ln:
        x = sam_mod.layer_norm(x, blk["ln1"]["w"], blk["ln1"]["b"], cfg.layer_norm_eps)
    if attn:
        if window > 0:
            _, h, w, _ = x.shape
            wins, pad_hw = sam_mod.window_partition(x, window)
            t = sam_mod._window_pad_target(window)
            if t > window:
                pad = t - window
                wins = jnp.pad(wins, ((0, 0), (0, pad), (0, pad), (0, 0)))
                x = _attention_variant(wins, blk["attn"], cfg, valid_hw=(window, window), rel=rel)
                x = x[:, :window, :window, :]
            else:
                x = _attention_variant(wins, blk["attn"], cfg, rel=rel)
            x = sam_mod.window_unpartition(x, window, pad_hw, (h, w))
        else:
            x = _attention_variant(x, blk["attn"], cfg, rel=rel)
        x = shortcut + x
    else:
        x = shortcut
    if not mlp:
        return x
    xn = sam_mod.layer_norm(x, blk["ln2"]["w"], blk["ln2"]["b"], cfg.layer_norm_eps) if ln else x
    m = blk["mlp"]
    from deepseek_ocr2_tpu.ops.fused_mlp import mlp_gelu

    bb, hh, ww, cc = xn.shape
    out = mlp_gelu(xn.reshape(bb * hh * ww, cc), m["w1"], m["b1"], m["w2"], m["b2"]).reshape(
        bb, hh, ww, cc
    )
    return x + out


def _attention_variant(x, attn, cfg, valid_hw=None, rel=True):
    b, h, w, dim = x.shape
    nh = cfg.num_heads
    hd = dim // nh
    l = h * w
    qkv = (x @ attn["qkv_w"].astype(x.dtype) + attn["qkv_b"].astype(x.dtype)).reshape(
        b, l, 3, nh, hd
    )
    q = qkv[:, :, 0].transpose(0, 2, 1, 3)
    k = qkv[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv[:, :, 2].transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(hd)
    if rel:
        vh, vw = valid_hw if valid_hw is not None else (h, w)
        rh = sam_mod.get_rel_pos(vh, vh, attn["rel_h"])
        rw = sam_mod.get_rel_pos(vw, vw, attn["rel_w"])
        if (vh, vw) != (h, w):
            rh = jnp.pad(rh, ((0, h - vh), (0, h - vh), (0, 0)))
            rw = jnp.pad(rw, ((0, w - vw), (0, w - vw), (0, 0)))
        q32 = q.astype(jnp.float32)
        r_q = q32.reshape(b * nh, h, w, hd)
        rel_h = jnp.einsum("nhwc,hkc->nhwk", r_q, rh)
        rel_w = jnp.einsum("nhwc,wkc->nhwk", r_q, rw)
        if (vh, vw) != (h, w):
            rel_h = jnp.where(jnp.arange(h) >= vh, jnp.float32(sam_mod._PAD_NEG), rel_h)
            rel_w = jnp.where(jnp.arange(w) >= vw, jnp.float32(sam_mod._PAD_NEG), rel_w)
        ctx = mha_pallas(
            q, k, v, scale=scale,
            rel_h=rel_h.reshape(b, nh, l, h), rel_w=rel_w.reshape(b, nh, l, w),
            out_dtype=x.dtype,
        )
    else:
        ctx = mha_pallas(q, k, v, scale=scale, out_dtype=x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, h, w, dim)
    return ctx @ attn["proj_w"].astype(x.dtype) + attn["proj_b"].astype(x.dtype)


def main():
    cfg = OCR2Config().sam
    key = jax.random.PRNGKey(0)
    params = sam_mod.init_params(cfg, key, dtype=jnp.bfloat16)
    x = jax.random.normal(key, (B, 64, 64, 768), jnp.bfloat16)
    blocks = params["blocks"]
    print(f"device: {jax.devices()[0]}  B={B}  iters {ITERS['iters_lo']}/{ITERS['iters_hi']}")

    def tower(x, blocks, *, window_size=cfg.window_size, **kw):
        for i, blk in enumerate(blocks):
            window = 0 if i in cfg.global_attn_indexes else window_size
            x = block_variant(x, blk, cfg, window, **kw)
        return x

    variants = [
        ("full tower", {}),
        ("window=16 (pad-free)", {"window_size": 16}),
        ("no rel bias", {"rel": False}),
        ("no MLP", {"mlp": False}),
        ("no LN", {"ln": False}),
        ("no attention", {"attn": False}),
    ]
    base = None
    for name, kw in variants:
        dt = time_chain(chain(lambda x, blocks, kw=kw: tower(x, blocks, **kw)), x, blocks, **ITERS)
        delta = "" if base is None else f"  (delta {1e3 * (base - dt):+7.2f} ms)"
        if base is None:
            base = dt
        print(f"{name:24s}  {dt * 1e3:8.2f} ms{delta}")


if __name__ == "__main__":
    main()
