"""Qwen2 decoder-as-encoder (vision token compressor) — functional JAX.

Capability-parity with /root/reference/src/model/qwen2.rs, TPU-first:
- 24 uniform GQA layers stacked into one pytree and run under `lax.scan`;
- prefix-LM mask: image-feature prefix attends within the prefix only, the
  learned-query suffix attends to prefix + causal self (qwen2.rs:45-72);
- RoPE (theta 1e6) in f32, GQA KV expansion matching HF repeat_kv ordering;
- input [B, C, H, W] SAM features flattened to H*W tokens, concatenated with
  the learned query table selected by token count (144 for 768-crops, 256 for
  the 1024 global view); output is the query half [B, n_query, C]
  (qwen2.rs:377-400).

MXU utilization: the HF checkpoint stores q/k/v and gate/up as separate
matrices; the k/v projections are only num_kv_heads*head_dim wide (one MXU
tile), so running them as separate GEMMs wastes the systolic array. Params
are fused at load time into one qkv stream [H, H+2*KVH] and one gate||up
stream [H, 2*I] (output columns are independent, so the fused GEMM is
bit-exact vs the split form); `flat_from_params` splits them back to the HF
layout for checkpoint saving.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Qwen2Config
from ..io.safetensors_io import FlatSource, LoadReport
from ..ops.attention import prefix_lm_mask, repeat_kv, sdpa
from ..ops.flash_attention import mha_pallas, pallas_enabled
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cache

Params = Dict[str, Any]


def init_params(cfg: Qwen2Config, key: jax.Array, dtype=jnp.float32) -> Params:
    h, i = cfg.hidden_size, cfg.intermediate_size
    kvh = cfg.num_key_value_heads * cfg.head_dim
    L = cfg.num_hidden_layers
    s = 1.0 / math.sqrt(h)
    ks = iter(jax.random.split(key, 16))

    def rnd(*shape, scale=s):
        return jax.random.normal(next(ks), shape, dtype) * scale

    layers = {
        "ln1": jnp.ones((L, h), dtype),
        "ln2": jnp.ones((L, h), dtype),
        "wqkv": rnd(L, h, h + 2 * kvh),
        "bqkv": jnp.zeros((L, h + 2 * kvh), dtype),
        "wo": rnd(L, h, h),
        "gateup": rnd(L, h, 2 * i),
        "down": jax.random.normal(next(ks), (L, i, h), dtype) / math.sqrt(i),
    }
    return {
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        "query_768": rnd(cfg.n_query_768, h, scale=0.02),
        "query_1024": rnd(cfg.n_query_1024, h, scale=0.02),
    }


def params_from_flat(
    flat: Dict[str, np.ndarray], cfg: Qwen2Config, prefix: str = "model.qwen2_model."
) -> Tuple[Params, LoadReport]:
    """HF key path `qwen2_model.model.model.*` (reference qwen2.rs:334-346)."""
    src = FlatSource(flat)
    t = src.take
    mp = prefix + "model.model."

    def stacked(fmt, transpose=False):
        arrs = [t(fmt.format(i=i), transpose=transpose) for i in range(cfg.num_hidden_layers)]
        return np.stack(arrs) if all(a is not None for a in arrs) else None

    def fused(fmts, transpose=False):
        parts = [stacked(f, transpose=transpose) for f in fmts]
        return np.concatenate(parts, axis=-1) if all(p is not None for p in parts) else None

    layers = {
        "ln1": stacked(mp + "layers.{i}.input_layernorm.weight"),
        "ln2": stacked(mp + "layers.{i}.post_attention_layernorm.weight"),
        # q||k||v fused along the output axis (see module docstring).
        "wqkv": fused(
            [mp + f"layers.{{i}}.self_attn.{n}_proj.weight" for n in "qkv"],
            transpose=True,
        ),
        "bqkv": fused([mp + f"layers.{{i}}.self_attn.{n}_proj.bias" for n in "qkv"]),
        "wo": stacked(mp + "layers.{i}.self_attn.o_proj.weight", transpose=True),
        "gateup": fused(
            [mp + "layers.{i}.mlp.gate_proj.weight", mp + "layers.{i}.mlp.up_proj.weight"],
            transpose=True,
        ),
        "down": stacked(mp + "layers.{i}.mlp.down_proj.weight", transpose=True),
    }
    params = {
        "layers": layers,
        "norm": t(mp + "norm.weight"),
        "query_768": t(prefix + "query_768.weight"),
        "query_1024": t(prefix + "query_1024.weight"),
    }
    return params, src.report


def flat_from_params(
    params: Params, cfg: Qwen2Config, prefix: str = "model.qwen2_model."
) -> Dict[str, np.ndarray]:
    """Inverse of params_from_flat (PyTorch layout) for checkpoint saving."""
    flat: Dict[str, np.ndarray] = {}
    mp = prefix + "model.model."

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        flat[name] = np.ascontiguousarray(a.T) if transpose else a

    layers = params["layers"]
    h = cfg.hidden_size
    kvh = cfg.num_key_value_heads * cfg.head_dim
    i_dim = cfg.intermediate_size
    for i in range(cfg.num_hidden_layers):
        lp = f"{mp}layers.{i}."
        put(lp + "input_layernorm.weight", layers["ln1"][i])
        put(lp + "post_attention_layernorm.weight", layers["ln2"][i])
        wqkv, bqkv = np.asarray(layers["wqkv"][i]), np.asarray(layers["bqkv"][i])
        put(lp + "self_attn.q_proj.weight", wqkv[:, :h], transpose=True)
        put(lp + "self_attn.q_proj.bias", bqkv[:h])
        put(lp + "self_attn.k_proj.weight", wqkv[:, h : h + kvh], transpose=True)
        put(lp + "self_attn.k_proj.bias", bqkv[h : h + kvh])
        put(lp + "self_attn.v_proj.weight", wqkv[:, h + kvh :], transpose=True)
        put(lp + "self_attn.v_proj.bias", bqkv[h + kvh :])
        put(lp + "self_attn.o_proj.weight", layers["wo"][i], transpose=True)
        gu = np.asarray(layers["gateup"][i])
        put(lp + "mlp.gate_proj.weight", gu[:, :i_dim], transpose=True)
        put(lp + "mlp.up_proj.weight", gu[:, i_dim:], transpose=True)
        put(lp + "mlp.down_proj.weight", layers["down"][i], transpose=True)
    put(mp + "norm.weight", params["norm"])
    put(prefix + "query_768.weight", params["query_768"])
    put(prefix + "query_1024.weight", params["query_1024"])
    return flat


def _force_sdpa() -> bool:
    """Qwen2 attention runs plain XLA sdpa by DEFAULT; DEEPSEEK_QWEN2_SDPA=0
    restores the flash kernel (ablation only).

    r4 ablation (bench_qwen2_ablate, B=8, two independent sessions): sdpa
    runs the 24-layer tower 17.2-18.4 -> 12.0-12.3 ms at seq 288 (-30%)
    and 25.3 -> 21.7 ms at seq 512 (-14%) — the flash kernel's tiled grid
    underperforms XLA's fused softmax at these short prefix-LM shapes
    (d=64, 288/512 keys fit VMEM without streaming). sdpa is also the
    existing oracle/CPU path, so parity coverage is unchanged."""
    import os

    return os.environ.get("DEEPSEEK_QWEN2_SDPA", "1") != "0"


def _layer(
    x: jnp.ndarray, lp: Params, cfg: Qwen2Config, mask, cos, sin, n_prefix: int
) -> jnp.ndarray:
    b, s, h = x.shape
    nh, nkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    dt = x.dtype

    res = x
    xn = rms_norm(x, lp["ln1"], cfg.rms_norm_eps)
    qkv = xn @ lp["wqkv"] + lp["bqkv"].astype(dt)  # [B, S, H + 2*KVH]
    q = qkv[..., :h].reshape(b, s, nh, d).transpose(0, 2, 1, 3)
    kvh = nkv * d
    k = qkv[..., h : h + kvh].reshape(b, s, nkv, d).transpose(0, 2, 1, 3)
    v = qkv[..., h + kvh :].reshape(b, s, nkv, d).transpose(0, 2, 1, 3)

    # RoPE + attention in f32 (reference qwen2.rs:198-206).
    q32, k32 = apply_rope(q, k, cos, sin, start=0)
    k32 = repeat_kv(k32, cfg.gqa_groups)
    v32 = repeat_kv(v.astype(jnp.float32), cfg.gqa_groups)

    if pallas_enabled() and s >= 256 and not _force_sdpa():
        ctx = mha_pallas(
            q32,
            k32,
            v32,
            scale=1.0 / math.sqrt(d),
            mode="prefix",
            n_prefix=n_prefix,
            out_dtype=dt,
        )
    else:
        ctx = sdpa(q32, k32, v32, scale=1.0 / math.sqrt(d), mask=mask, out_dtype=dt)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h)
    x = res + ctx @ lp["wo"]

    res = x
    xn = rms_norm(x, lp["ln2"], cfg.rms_norm_eps)
    gu = xn @ lp["gateup"]  # [B, S, 2*I]
    i_dim = gu.shape[-1] // 2
    gate, up = gu[..., :i_dim], gu[..., i_dim:]
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * up
    return res + act @ lp["down"]


def qwen2_encode(params: Params, cfg: Qwen2Config, feats: jnp.ndarray) -> jnp.ndarray:
    """[B, C, H, W] SAM features -> [B, n_query, C] compressed tokens."""
    b, hidden, h, w = feats.shape
    assert hidden == cfg.hidden_size
    n_query = h * w
    x = feats.reshape(b, hidden, n_query).transpose(0, 2, 1)  # [B, n_query, C]

    if n_query == cfg.n_query_768:
        query = params["query_768"]
    elif n_query == cfg.n_query_1024:
        query = params["query_1024"]
    else:
        raise ValueError(f"unsupported n_query={n_query}")

    batch_query = jnp.broadcast_to(query[None].astype(x.dtype), (b, n_query, hidden))
    x = jnp.concatenate([x, batch_query], axis=1)  # [B, 2*n_query, C]

    seq = 2 * n_query
    mask = prefix_lm_mask(seq, n_query)[None, None]
    cos, sin = _rope_consts(cfg, seq)

    def body(x, lp):
        return _layer(x, lp, cfg, mask, cos, sin, n_query), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return x[:, n_query:, :]


_ROPE_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}


def _rope_consts(cfg: Qwen2Config, seq: int):
    key = (seq, cfg.head_dim, cfg.rope_theta)
    if key not in _ROPE_CACHE:
        _ROPE_CACHE[key] = rope_cache(seq, cfg.head_dim, cfg.rope_theta)
    cos, sin = _ROPE_CACHE[key]
    return jnp.asarray(cos), jnp.asarray(sin)
