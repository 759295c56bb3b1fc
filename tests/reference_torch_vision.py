"""Independent PyTorch oracle for the vision towers (SAM + Qwen2 + composite).

Mirrors the HF DeepEncoderV2 semantics that the reference documents
(/root/reference/src/model/sam.rs, qwen2.rs, deepseek_ocr2.rs): window
partition, decomposed rel-pos attention, bicubic+antialias pos-embed resize,
prefix-LM GQA, injection order local->global->separator.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np
import torch
import torch.nn.functional as F

from reference_torch import rms_norm, rope_cos_sin, apply_rope

MASK_VALUE = -1.0e4


def _t(flat, name):
    return torch.from_numpy(np.asarray(flat[name])).float()


# ---------------------------------------------------------------------------
# SAM
# ---------------------------------------------------------------------------


def window_partition(x: torch.Tensor, window: int):
    b, h, w, c = x.shape
    pad_h = (window - h % window) % window
    pad_w = (window - w % window) % window
    if pad_h or pad_w:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h))
    hp, wp = h + pad_h, w + pad_w
    x = x.view(b, hp // window, window, wp // window, window, c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window, window, c)
    return x, (hp, wp)


def window_unpartition(x, window, pad_hw, hw):
    hp, wp = pad_hw
    h, w = hw
    c = x.shape[-1]
    b = x.shape[0] // ((hp // window) * (wp // window))
    x = x.view(b, hp // window, wp // window, window, window, c)
    x = x.permute(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    return x[:, :h, :w, :]


def get_rel_pos(q_size, k_size, rel_pos):
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = F.interpolate(
            rel_pos.T[None], size=max_rel_dist, mode="linear", align_corners=False
        )[0].T
    q_coords = torch.arange(q_size)[:, None]
    k_coords = torch.arange(k_size)[None, :]
    rel = q_coords - k_coords + (k_size - 1)
    return rel_pos[rel.reshape(-1)].reshape(q_size, k_size, -1)


def sam_attention(flat, bp, x, num_heads):
    b, h, w, dim = x.shape
    hd = dim // num_heads
    l = h * w
    qkv = (x @ _t(flat, bp + "attn.qkv.weight").T + _t(flat, bp + "attn.qkv.bias")).view(
        b, l, 3, num_heads, hd
    )
    q = qkv[:, :, 0].permute(0, 2, 1, 3)
    k = qkv[:, :, 1].permute(0, 2, 1, 3)
    v = qkv[:, :, 2].permute(0, 2, 1, 3)

    rh = get_rel_pos(h, h, _t(flat, bp + "attn.rel_pos_h"))
    rw = get_rel_pos(w, w, _t(flat, bp + "attn.rel_pos_w"))
    r_q = q.reshape(b * num_heads, h, w, hd)
    rel_h = torch.einsum("nhwc,hkc->nhwk", r_q, rh)
    rel_w = torch.einsum("nhwc,wkc->nhwk", r_q, rw)
    bias = (rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]).reshape(
        b, num_heads, l, l
    )
    scores = q @ k.transpose(-1, -2) / math.sqrt(hd) + bias
    weights = torch.softmax(scores, dim=-1)
    ctx = (weights @ v).permute(0, 2, 1, 3).reshape(b, h, w, dim)
    return ctx @ _t(flat, bp + "attn.proj.weight").T + _t(flat, bp + "attn.proj.bias")


def sam_forward_torch(flat, cfg, x: np.ndarray, prefix="model.sam_model.") -> torch.Tensor:
    xt = torch.from_numpy(np.asarray(x)).float()
    w = _t(flat, prefix + "patch_embed.proj.weight")
    b = _t(flat, prefix + "patch_embed.proj.bias")
    xt = F.conv2d(xt, w, b, stride=cfg.patch_size)
    xt = xt.permute(0, 2, 3, 1)  # NHWC
    _, h, ww, _ = xt.shape

    pos = _t(flat, prefix + "pos_embed")  # [1, ph, pw, c]
    if pos.shape[1] != h or pos.shape[2] != ww:
        pos = F.interpolate(
            pos.permute(0, 3, 1, 2),
            size=(h, ww),
            mode="bicubic",
            antialias=True,
            align_corners=False,
        ).permute(0, 2, 3, 1)
    xt = xt + pos

    for i in range(cfg.depth):
        bp = f"{prefix}blocks.{i}."
        window = 0 if i in cfg.global_attn_indexes else cfg.window_size
        shortcut = xt
        xn = F.layer_norm(
            xt,
            (cfg.embed_dim,),
            _t(flat, bp + "norm1.weight"),
            _t(flat, bp + "norm1.bias"),
            cfg.layer_norm_eps,
        )
        if window > 0:
            _, hh, www, _ = xn.shape
            wins, pad_hw = window_partition(xn, window)
            wins = sam_attention(flat, bp, wins, cfg.num_heads)
            attn_out = window_unpartition(wins, window, pad_hw, (hh, www))
        else:
            attn_out = sam_attention(flat, bp, xn, cfg.num_heads)
        xt = shortcut + attn_out
        xn = F.layer_norm(
            xt,
            (cfg.embed_dim,),
            _t(flat, bp + "norm2.weight"),
            _t(flat, bp + "norm2.bias"),
            cfg.layer_norm_eps,
        )
        mlp = F.gelu(xn @ _t(flat, bp + "mlp.lin1.weight").T + _t(flat, bp + "mlp.lin1.bias"))
        mlp = mlp @ _t(flat, bp + "mlp.lin2.weight").T + _t(flat, bp + "mlp.lin2.bias")
        xt = xt + mlp

    xt = xt.permute(0, 3, 1, 2)  # NCHW

    def ln2d(x, wname, bname):
        wt = _t(flat, wname)
        bt = _t(flat, bname)
        mean = x.mean(1, keepdim=True)
        var = (x - mean).pow(2).mean(1, keepdim=True)
        x = (x - mean) / torch.sqrt(var + cfg.layer_norm_eps)
        return x * wt[None, :, None, None] + bt[None, :, None, None]

    xt = F.conv2d(xt, _t(flat, prefix + "neck.0.weight"))
    xt = ln2d(xt, prefix + "neck.1.weight", prefix + "neck.1.bias")
    xt = F.conv2d(xt, _t(flat, prefix + "neck.2.weight"), padding=1)
    xt = ln2d(xt, prefix + "neck.3.weight", prefix + "neck.3.bias")
    xt = F.conv2d(xt, _t(flat, prefix + "net_2.weight"), stride=2, padding=1)
    xt = F.conv2d(xt, _t(flat, prefix + "net_3.weight"), stride=2, padding=1)
    return xt


# ---------------------------------------------------------------------------
# Qwen2
# ---------------------------------------------------------------------------


def prefix_lm_mask_torch(seq, n_prefix):
    pos = torch.arange(seq)
    row = pos[:, None]
    col = pos[None, :]
    disallow_prefix = (row < n_prefix) & (col >= n_prefix)
    disallow_query = (row >= n_prefix) & (col >= n_prefix) & (col > row)
    return disallow_prefix | disallow_query


def qwen2_encode_torch(flat, cfg, feats: np.ndarray, prefix="model.qwen2_model.") -> torch.Tensor:
    x = torch.from_numpy(np.asarray(feats)).float()  # [B, C, H, W]
    b, hidden, h, w = x.shape
    n_query = h * w
    x = x.reshape(b, hidden, n_query).transpose(1, 2)

    if n_query == cfg.n_query_768:
        query = _t(flat, prefix + "query_768.weight")
    else:
        query = _t(flat, prefix + "query_1024.weight")
    x = torch.cat([x, query[None].expand(b, -1, -1)], dim=1)

    seq = 2 * n_query
    mask = prefix_lm_mask_torch(seq, n_query)
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = rope_cos_sin(seq, d, cfg.rope_theta)
    mp = prefix + "model.model."

    for i in range(cfg.num_hidden_layers):
        lp = f"{mp}layers.{i}."
        res = x
        xn = rms_norm(x, _t(flat, lp + "input_layernorm.weight"), cfg.rms_norm_eps)
        q = (xn @ _t(flat, lp + "self_attn.q_proj.weight").T + _t(flat, lp + "self_attn.q_proj.bias")).view(b, seq, nh, d).transpose(1, 2)
        k = (xn @ _t(flat, lp + "self_attn.k_proj.weight").T + _t(flat, lp + "self_attn.k_proj.bias")).view(b, seq, nkv, d).transpose(1, 2)
        v = (xn @ _t(flat, lp + "self_attn.v_proj.weight").T + _t(flat, lp + "self_attn.v_proj.bias")).view(b, seq, nkv, d).transpose(1, 2)
        q, k = apply_rope(q, k, cos, sin)
        group = nh // nkv
        k = k[:, :, None].expand(b, nkv, group, seq, d).reshape(b, nh, seq, d)
        v = v[:, :, None].expand(b, nkv, group, seq, d).reshape(b, nh, seq, d)
        scores = q @ k.transpose(-1, -2) / math.sqrt(d)
        scores = scores.masked_fill(mask, MASK_VALUE)
        ctx = (torch.softmax(scores, -1) @ v).transpose(1, 2).reshape(b, seq, hidden)
        x = res + ctx @ _t(flat, lp + "self_attn.o_proj.weight").T

        res = x
        xn = rms_norm(x, _t(flat, lp + "post_attention_layernorm.weight"), cfg.rms_norm_eps)
        mlp = F.silu(xn @ _t(flat, lp + "mlp.gate_proj.weight").T) * (
            xn @ _t(flat, lp + "mlp.up_proj.weight").T
        )
        x = res + mlp @ _t(flat, lp + "mlp.down_proj.weight").T

    x = rms_norm(x, _t(flat, mp + "norm.weight"), cfg.rms_norm_eps)
    return x[:, n_query:, :]


# ---------------------------------------------------------------------------
# Random weight factories (PyTorch layout, HF names)
# ---------------------------------------------------------------------------


def random_sam_flat(cfg, seed=0, prefix="model.sam_model.") -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    e, hd = cfg.embed_dim, cfg.head_dim
    side = cfg.img_size // cfg.patch_size

    def rand(*shape, s=0.2):
        return (rng.standard_normal(shape) * s / math.sqrt(shape[-1])).astype(np.float32)

    flat = {
        prefix + "patch_embed.proj.weight": rand(e, 3, cfg.patch_size, cfg.patch_size, s=1.0),
        prefix + "patch_embed.proj.bias": rand(e),
        prefix + "pos_embed": rand(1, side, side, e),
        prefix + "neck.0.weight": rand(cfg.out_chans, e, 1, 1, s=1.0),
        prefix + "neck.1.weight": 1 + rand(cfg.out_chans),
        prefix + "neck.1.bias": rand(cfg.out_chans),
        prefix + "neck.2.weight": rand(cfg.out_chans, cfg.out_chans, 3, 3, s=1.0),
        prefix + "neck.3.weight": 1 + rand(cfg.out_chans),
        prefix + "neck.3.bias": rand(cfg.out_chans),
        prefix + "net_2.weight": rand(cfg.net_2_chans, cfg.out_chans, 3, 3, s=1.0),
        prefix + "net_3.weight": rand(cfg.net_3_chans, cfg.net_2_chans, 3, 3, s=1.0),
    }
    m = int(e * cfg.mlp_ratio)
    for i in range(cfg.depth):
        bp = f"{prefix}blocks.{i}."
        bsize = cfg.window_size if i not in cfg.global_attn_indexes else side
        flat.update(
            {
                bp + "norm1.weight": 1 + rand(e),
                bp + "norm1.bias": rand(e),
                bp + "norm2.weight": 1 + rand(e),
                bp + "norm2.bias": rand(e),
                bp + "attn.qkv.weight": rand(3 * e, e),
                bp + "attn.qkv.bias": rand(3 * e),
                bp + "attn.proj.weight": rand(e, e),
                bp + "attn.proj.bias": rand(e),
                bp + "attn.rel_pos_h": rand(2 * bsize - 1, hd),
                bp + "attn.rel_pos_w": rand(2 * bsize - 1, hd),
                bp + "mlp.lin1.weight": rand(m, e),
                bp + "mlp.lin1.bias": rand(m),
                bp + "mlp.lin2.weight": rand(e, m),
                bp + "mlp.lin2.bias": rand(e),
            }
        )
    return flat


def random_qwen2_flat(cfg, seed=1, prefix="model.qwen2_model.") -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    h, i = cfg.hidden_size, cfg.intermediate_size
    kvh = cfg.num_key_value_heads * cfg.head_dim
    mp = prefix + "model.model."

    def rand(*shape, s=0.3):
        return (rng.standard_normal(shape) * s / math.sqrt(shape[-1])).astype(np.float32)

    flat = {
        mp + "norm.weight": 1 + rand(h),
        prefix + "query_768.weight": rand(cfg.n_query_768, h),
        prefix + "query_1024.weight": rand(cfg.n_query_1024, h),
    }
    for li in range(cfg.num_hidden_layers):
        lp = f"{mp}layers.{li}."
        flat.update(
            {
                lp + "input_layernorm.weight": 1 + rand(h),
                lp + "post_attention_layernorm.weight": 1 + rand(h),
                lp + "self_attn.q_proj.weight": rand(h, h),
                lp + "self_attn.q_proj.bias": rand(h),
                lp + "self_attn.k_proj.weight": rand(kvh, h),
                lp + "self_attn.k_proj.bias": rand(kvh),
                lp + "self_attn.v_proj.weight": rand(kvh, h),
                lp + "self_attn.v_proj.bias": rand(kvh),
                lp + "self_attn.o_proj.weight": rand(h, h),
                lp + "mlp.gate_proj.weight": rand(i, h),
                lp + "mlp.up_proj.weight": rand(i, h),
                lp + "mlp.down_proj.weight": rand(h, i),
            }
        )
    return flat


def random_ocr2_flat(cfg, seed=2) -> Dict[str, np.ndarray]:
    """Full composite checkpoint: LM + SAM + Qwen2 + projector + separator."""
    from reference_torch import random_lm_flat

    rng = np.random.default_rng(seed)
    flat = {}
    flat.update(random_lm_flat(cfg.lm, seed=seed))
    flat.update(random_sam_flat(cfg.sam, seed=seed + 1))
    flat.update(random_qwen2_flat(cfg.qwen2, seed=seed + 2))
    h = cfg.lm.hidden_size
    flat["model.projector.layers.weight"] = (
        rng.standard_normal((h, cfg.projector_in)) * 0.1
    ).astype(np.float32)
    flat["model.projector.layers.bias"] = (rng.standard_normal(h) * 0.02).astype(
        np.float32
    )
    flat["model.view_seperator"] = (rng.standard_normal(h) * 0.02).astype(np.float32)
    return flat
