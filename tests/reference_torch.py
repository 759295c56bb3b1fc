"""Independent PyTorch reference of the DeepSeek-OCR-2 numeric semantics.

This is the test oracle: a straight-line float32 implementation of the HF
model semantics that the reference implementation documents
(/root/reference/src/model/*.rs). The JAX stack must match it numerically.

Weights come in as a flat {hf_name: np.ndarray} dict in PyTorch layout
([out, in] linears), exactly what a safetensors checkpoint holds — so these
tests also pin the weight-layout contract of `params_from_flat`.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch

MASK_VALUE = -1.0e4


def _t(flat: Dict[str, np.ndarray], name: str) -> torch.Tensor:
    return torch.from_numpy(np.asarray(flat[name])).float()


def rms_norm(x: torch.Tensor, w: torch.Tensor, eps: float) -> torch.Tensor:
    rms = torch.sqrt(x.pow(2).mean(-1, keepdim=True) + eps)
    return w * (x / rms)


def rope_cos_sin(seq: int, head_dim: int, theta: float, start: int = 0):
    inv_freq = 1.0 / (
        theta ** (torch.arange(0, head_dim, 2, dtype=torch.float32) / head_dim)
    )
    pos = torch.arange(start, start + seq, dtype=torch.float32)
    freqs = torch.outer(pos, inv_freq)
    emb = torch.cat([freqs, freqs], dim=-1)
    return emb.cos(), emb.sin()


def apply_rope(q, k, cos, sin):
    def rot(x):
        half = x.shape[-1] // 2
        return torch.cat([-x[..., half:], x[..., :half]], dim=-1)

    cos = cos[None, None]
    sin = sin[None, None]
    return q * cos + rot(q) * sin, k * cos + rot(k) * sin


def swiglu(x, w_gate, w_up, w_down):
    return torch.nn.functional.silu(x @ w_gate.T) * (x @ w_up.T) @ w_down.T


def deepseek_v2_forward(
    flat: Dict[str, np.ndarray],
    cfg,
    input_ids: Optional[np.ndarray] = None,  # [B, S]
    prefix: str = "model.",
    inputs_embeds: Optional[torch.Tensor] = None,  # [B, S, H]
) -> torch.Tensor:
    """Full-sequence forward; returns logits [B, S, V]."""
    if inputs_embeds is not None:
        x = inputs_embeds.float()
    else:
        ids = torch.from_numpy(np.asarray(input_ids)).long()
        embed = _t(flat, f"{prefix}embed_tokens.weight")
        x = embed[ids]  # [B, S, H]
    b, s, h = x.shape
    nh = cfg.num_attention_heads
    d = h // nh

    cos, sin = rope_cos_sin(s, d, cfg.rope_theta)
    causal = torch.triu(torch.ones(s, s, dtype=torch.bool), diagonal=1)

    for i in range(cfg.num_hidden_layers):
        lp = f"{prefix}layers.{i}."
        res = x
        xn = rms_norm(x, _t(flat, lp + "input_layernorm.weight"), cfg.rms_norm_eps)
        q = (xn @ _t(flat, lp + "self_attn.q_proj.weight").T).view(b, s, nh, d).transpose(1, 2)
        k = (xn @ _t(flat, lp + "self_attn.k_proj.weight").T).view(b, s, nh, d).transpose(1, 2)
        v = (xn @ _t(flat, lp + "self_attn.v_proj.weight").T).view(b, s, nh, d).transpose(1, 2)
        q, k = apply_rope(q, k, cos, sin)
        scores = (q @ k.transpose(-1, -2)) / math.sqrt(d)
        scores = scores.masked_fill(causal, MASK_VALUE)
        w = torch.softmax(scores, dim=-1)
        ctx = (w @ v).transpose(1, 2).reshape(b, s, h)
        x = res + ctx @ _t(flat, lp + "self_attn.o_proj.weight").T

        res = x
        xn = rms_norm(
            x, _t(flat, lp + "post_attention_layernorm.weight"), cfg.rms_norm_eps
        )
        if i < cfg.first_k_dense_replace:
            mlp = swiglu(
                xn,
                _t(flat, lp + "mlp.gate_proj.weight"),
                _t(flat, lp + "mlp.up_proj.weight"),
                _t(flat, lp + "mlp.down_proj.weight"),
            )
        else:
            mlp = moe_forward(flat, cfg, xn.reshape(-1, h), lp).reshape(b, s, h)
        x = res + mlp

    x = rms_norm(x, _t(flat, f"{prefix}norm.weight"), cfg.rms_norm_eps)
    return x @ _t(flat, "lm_head.weight").T


def moe_forward(flat, cfg, x_flat: torch.Tensor, lp: str) -> torch.Tensor:
    """MoE block: f32 gate softmax -> top-k -> expert SwiGLUs + shared."""
    logits = x_flat @ _t(flat, lp + "mlp.gate.weight").T
    probs = torch.softmax(logits.float(), dim=-1)
    weights, idx = torch.topk(probs, cfg.num_experts_per_tok, dim=-1)
    out = torch.zeros_like(x_flat)
    for t in range(x_flat.shape[0]):
        acc = torch.zeros(x_flat.shape[1])
        for j in range(cfg.num_experts_per_tok):
            e = int(idx[t, j])
            ep = f"{lp}mlp.experts.{e}."
            y = swiglu(
                x_flat[t : t + 1],
                _t(flat, ep + "gate_proj.weight"),
                _t(flat, ep + "up_proj.weight"),
                _t(flat, ep + "down_proj.weight"),
            )
            acc = acc + weights[t, j] * y[0]
        out[t] = acc
    shared = swiglu(
        x_flat,
        _t(flat, lp + "mlp.shared_experts.gate_proj.weight"),
        _t(flat, lp + "mlp.shared_experts.up_proj.weight"),
        _t(flat, lp + "mlp.shared_experts.down_proj.weight"),
    )
    return out + shared


def no_repeat_ngram_banned_ids(ids: List[int], n: int) -> List[int]:
    """Direct port of reference main.rs:96-120 (the test oracle)."""
    if n == 0 or len(ids) < n:
        return []
    prefix_len = n - 1
    cur_prefix = tuple(ids[len(ids) - prefix_len :])
    table: Dict[Tuple[int, ...], List[int]] = {}
    for i in range(len(ids) - n + 1):
        key = tuple(ids[i : i + prefix_len])
        table.setdefault(key, []).append(ids[i + prefix_len])
    return table.get(cur_prefix, [])


def greedy_generate_reference(
    flat,
    cfg,
    prompt_ids: List[int],
    max_new_tokens: int,
    eos_id: int = 1,
    ngram_size: int = 0,
) -> List[int]:
    """Reference greedy loop (recomputes the full sequence every step)."""
    ids = list(prompt_ids)
    for _ in range(max_new_tokens):
        logits = deepseek_v2_forward(flat, cfg, np.asarray([ids]))[0, -1]
        banned = no_repeat_ngram_banned_ids(ids, ngram_size)
        if banned:
            logits = logits.clone()
            logits[banned] = float("-inf")
        nxt = int(torch.argmax(logits))
        ids.append(nxt)
        if nxt == eos_id:
            break
    return ids


def greedy_from_embeds(
    flat,
    cfg,
    prompt_embeds: torch.Tensor,  # [1, S, H]
    prompt_ids: List[int],
    max_new_tokens: int,
    eos_id: int = 1,
    ngram_size: int = 0,
) -> List[int]:
    """Greedy loop over multimodal prompt embeddings (recompute each step)."""
    embed_tab = _t(flat, "model.embed_tokens.weight")
    embeds = prompt_embeds.float()
    ids = list(prompt_ids)
    for _ in range(max_new_tokens):
        logits = deepseek_v2_forward(flat, cfg, inputs_embeds=embeds)[0, -1]
        banned = no_repeat_ngram_banned_ids(ids, ngram_size)
        if banned:
            logits = logits.clone()
            logits[banned] = float("-inf")
        nxt = int(torch.argmax(logits))
        ids.append(nxt)
        if nxt == eos_id:
            break
        embeds = torch.cat([embeds, embed_tab[nxt][None, None]], dim=1)
    return ids


def random_lm_flat(cfg, seed: int = 0, scale: float = 0.5) -> Dict[str, np.ndarray]:
    """Random float32 weights in PyTorch layout under HF names."""
    rng = np.random.default_rng(seed)
    h, v = cfg.hidden_size, cfg.vocab_size
    flat: Dict[str, np.ndarray] = {}

    def rand(*shape):
        return (rng.standard_normal(shape) * scale / math.sqrt(shape[-1])).astype(
            np.float32
        )

    flat["model.embed_tokens.weight"] = rand(v, h)
    flat["model.norm.weight"] = 1.0 + 0.1 * rng.standard_normal(h).astype(np.float32)
    flat["lm_head.weight"] = rand(v, h)
    for i in range(cfg.num_hidden_layers):
        lp = f"model.layers.{i}."
        for w in ("q_proj", "k_proj", "v_proj", "o_proj"):
            flat[lp + f"self_attn.{w}.weight"] = rand(h, h)
        for ln in ("input_layernorm", "post_attention_layernorm"):
            flat[lp + f"{ln}.weight"] = 1.0 + 0.1 * rng.standard_normal(h).astype(
                np.float32
            )
        if i < cfg.first_k_dense_replace:
            ii = cfg.intermediate_size
            flat[lp + "mlp.gate_proj.weight"] = rand(ii, h)
            flat[lp + "mlp.up_proj.weight"] = rand(ii, h)
            flat[lp + "mlp.down_proj.weight"] = rand(h, ii)
        else:
            im = cfg.moe_intermediate_size
            ish = im * cfg.n_shared_experts
            flat[lp + "mlp.gate.weight"] = rand(cfg.n_routed_experts, h)
            for e in range(cfg.n_routed_experts):
                ep = f"{lp}mlp.experts.{e}."
                flat[ep + "gate_proj.weight"] = rand(im, h)
                flat[ep + "up_proj.weight"] = rand(im, h)
                flat[ep + "down_proj.weight"] = rand(h, im)
            flat[lp + "mlp.shared_experts.gate_proj.weight"] = rand(ish, h)
            flat[lp + "mlp.shared_experts.up_proj.weight"] = rand(ish, h)
            flat[lp + "mlp.shared_experts.down_proj.weight"] = rand(h, ish)
    return flat
