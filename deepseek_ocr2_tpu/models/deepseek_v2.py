"""DeepSeek-V2 decoder-only language backbone — functional JAX.

Capability-parity with the reference implementation
(/root/reference/src/model/deepseek_v2.rs), redesigned TPU-first:

- params are a pytree of stacked per-layer arrays (dense layers and MoE
  layers stacked separately) so the layer loop is a `lax.scan`, not an
  unrolled module list;
- one function covers prefill and decode; KV cache is a preallocated
  static-shape buffer updated with `dynamic_update_slice`;
- MoE routing runs on-device (ops/moe.py) — the reference's CPU routing
  (deepseek_v2.rs:581-660) exists only to dodge Vulkan driver bugs;
- numeric policy matches HF/the reference: RMSNorm/RoPE/softmax/attention
  and MoE gate in f32, GEMMs in the model dtype (bf16 on TPU).

Weight layout contract: HF PyTorch checkpoints store Linear weights as
[out, in]; `params_from_flat` transposes to [in, out] so forward GEMMs are
plain `x @ w` (reference relies on burn's PyTorchToBurnAdapter for the same
transform, store_adapters.rs + main.rs:1385).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import DeepseekV2Config
from ..io.safetensors_io import FlatSource, LoadReport
from ..ops.attention import causal_mask, decode_mask, sdpa
from ..ops.flash_attention import mha_pallas, pallas_enabled
from ..ops.moe import moe_ffn_decode, moe_ffn_prefill, route, swiglu
from ..ops.norms import rms_norm
from ..ops.rope import apply_rope, rope_cache

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter init / loading
# ---------------------------------------------------------------------------


def _attn_init(key, n, h, dtype, scale):
    ks = jax.random.split(key, 4)
    shape = (n, h, h)
    return {
        "wq": jax.random.normal(ks[0], shape, dtype) * scale,
        "wk": jax.random.normal(ks[1], shape, dtype) * scale,
        "wv": jax.random.normal(ks[2], shape, dtype) * scale,
        "wo": jax.random.normal(ks[3], shape, dtype) * scale,
    }


def init_params(
    cfg: DeepseekV2Config, key: jax.Array, dtype=jnp.bfloat16
) -> Params:
    """Random-init parameters (testing / benchmarking with synthetic weights)."""
    h, i_dense = cfg.hidden_size, cfg.intermediate_size
    i_moe = cfg.moe_intermediate_size
    i_shared = cfg.moe_intermediate_size * cfg.n_shared_experts
    e = cfg.n_routed_experts
    ld = cfg.first_k_dense_replace
    lm = cfg.num_moe_layers
    scale = 1.0 / math.sqrt(h)
    keys = iter(jax.random.split(key, 16))

    def norm_like(n_layers):
        return jnp.ones((n_layers, h), dtype)

    dense = {
        "ln1": norm_like(ld),
        "ln2": norm_like(ld),
        "attn": _attn_init(next(keys), ld, h, dtype, scale),
        "mlp": {
            "gate": jax.random.normal(next(keys), (ld, h, i_dense), dtype) * scale,
            "up": jax.random.normal(next(keys), (ld, h, i_dense), dtype) * scale,
            "down": jax.random.normal(next(keys), (ld, i_dense, h), dtype)
            * (1.0 / math.sqrt(i_dense)),
        },
    }
    moe = {
        "ln1": norm_like(lm),
        "ln2": norm_like(lm),
        "attn": _attn_init(next(keys), lm, h, dtype, scale),
        "router": jax.random.normal(next(keys), (lm, h, e), dtype) * scale,
        "experts": {
            "gate": jax.random.normal(next(keys), (lm, e, h, i_moe), dtype) * scale,
            "up": jax.random.normal(next(keys), (lm, e, h, i_moe), dtype) * scale,
            "down": jax.random.normal(next(keys), (lm, e, i_moe, h), dtype)
            * (1.0 / math.sqrt(i_moe)),
        },
        "shared": {
            "gate": jax.random.normal(next(keys), (lm, h, i_shared), dtype) * scale,
            "up": jax.random.normal(next(keys), (lm, h, i_shared), dtype) * scale,
            "down": jax.random.normal(next(keys), (lm, i_shared, h), dtype)
            * (1.0 / math.sqrt(i_shared)),
        },
    }
    return {
        "embed": jax.random.normal(next(keys), (cfg.vocab_size, h), dtype) * 0.02,
        "layers_dense": dense,
        "layers_moe": moe,
        "norm": jnp.ones((h,), dtype),
        "lm_head": jax.random.normal(next(keys), (h, cfg.vocab_size), dtype) * scale,
    }


def params_from_flat(
    flat: Dict[str, np.ndarray],
    cfg: DeepseekV2Config,
    prefix: str = "model.",
    lm_head_key: Optional[str] = "lm_head.weight",
    include_embed: bool = True,
) -> Tuple[Params, LoadReport]:
    """Assemble the stacked param pytree from HF tensor names.

    Key paths mirror the reference module tree (deepseek_v2.rs:866-930):
    `model.embed_tokens`, `model.layers.N.self_attn.{q,k,v,o}_proj`,
    `model.layers.N.mlp.{gate,up,down}_proj` (dense layer 0) or
    `model.layers.N.mlp.{gate,experts.M,shared_experts}` (MoE), `model.norm`,
    `lm_head`.
    """
    src = FlatSource(flat)
    t = src.take

    def stack(arrs):
        return np.stack([a for a in arrs]) if all(a is not None for a in arrs) else None

    def attn_for(layers):
        out = {}
        for name, hf in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "o_proj")):
            out[name] = stack(
                [t(f"{prefix}layers.{i}.self_attn.{hf}.weight", transpose=True) for i in layers]
            )
        return out

    def ln_for(layers, which):
        return stack([t(f"{prefix}layers.{i}.{which}.weight") for i in layers])

    ld_range = list(range(cfg.first_k_dense_replace))
    lm_range = list(range(cfg.first_k_dense_replace, cfg.num_hidden_layers))

    def mlp_for(layers, sub=""):
        base = {}
        for name in ("gate", "up", "down"):
            base[name] = stack(
                [t(f"{prefix}layers.{i}.mlp.{sub}{name}_proj.weight", transpose=True) for i in layers]
            )
        return base

    dense = {
        "ln1": ln_for(ld_range, "input_layernorm"),
        "ln2": ln_for(ld_range, "post_attention_layernorm"),
        "attn": attn_for(ld_range),
        "mlp": mlp_for(ld_range),
    }

    experts = {}
    for name in ("gate", "up", "down"):
        per_layer = []
        for i in lm_range:
            per_expert = [
                t(f"{prefix}layers.{i}.mlp.experts.{e}.{name}_proj.weight", transpose=True)
                for e in range(cfg.n_routed_experts)
            ]
            per_layer.append(stack(per_expert))
        experts[name] = stack(per_layer)

    moe = {
        "ln1": ln_for(lm_range, "input_layernorm"),
        "ln2": ln_for(lm_range, "post_attention_layernorm"),
        "attn": attn_for(lm_range),
        "router": stack(
            [t(f"{prefix}layers.{i}.mlp.gate.weight", transpose=True) for i in lm_range]
        ),
        "experts": experts,
        "shared": mlp_for(lm_range, sub="shared_experts."),
    }

    params: Params = {
        "layers_dense": dense,
        "layers_moe": moe,
        "norm": t(f"{prefix}norm.weight"),
    }
    if include_embed:
        params["embed"] = t(f"{prefix}embed_tokens.weight")
    if lm_head_key is not None:
        params["lm_head"] = t(lm_head_key, transpose=True)

    report = src.report
    return params, report


def flat_from_params(
    params: Params, cfg: DeepseekV2Config, prefix: str = "model.", lm_head_key="lm_head.weight"
) -> Dict[str, np.ndarray]:
    """Inverse of `params_from_flat` — PyTorch layout ([out,in] linears).

    Pins the weight-layout contract the same way the reference's round-trip
    test does (tests/safetensors_pytorch_roundtrip.rs:28-59).
    """
    flat: Dict[str, np.ndarray] = {}

    def put(name, arr, transpose=False):
        a = np.asarray(arr)
        if transpose:
            a = np.ascontiguousarray(a.T)
        flat[name] = a

    if "embed" in params:
        put(f"{prefix}embed_tokens.weight", params["embed"])
    put(f"{prefix}norm.weight", params["norm"])
    if lm_head_key and "lm_head" in params:
        put(lm_head_key, params["lm_head"], transpose=True)

    def put_layer(i, stack_idx, group):
        for name, hf in (("wq", "q_proj"), ("wk", "k_proj"), ("wv", "v_proj"), ("wo", "o_proj")):
            put(
                f"{prefix}layers.{i}.self_attn.{hf}.weight",
                group["attn"][name][stack_idx],
                transpose=True,
            )
        put(f"{prefix}layers.{i}.input_layernorm.weight", group["ln1"][stack_idx])
        put(f"{prefix}layers.{i}.post_attention_layernorm.weight", group["ln2"][stack_idx])

    for si, i in enumerate(range(cfg.first_k_dense_replace)):
        put_layer(i, si, params["layers_dense"])
        for name in ("gate", "up", "down"):
            put(
                f"{prefix}layers.{i}.mlp.{name}_proj.weight",
                params["layers_dense"]["mlp"][name][si],
                transpose=True,
            )

    for si, i in enumerate(range(cfg.first_k_dense_replace, cfg.num_hidden_layers)):
        moe = params["layers_moe"]
        put_layer(i, si, moe)
        put(f"{prefix}layers.{i}.mlp.gate.weight", moe["router"][si], transpose=True)
        for name in ("gate", "up", "down"):
            for e in range(cfg.n_routed_experts):
                put(
                    f"{prefix}layers.{i}.mlp.experts.{e}.{name}_proj.weight",
                    moe["experts"][name][si, e],
                    transpose=True,
                )
            put(
                f"{prefix}layers.{i}.mlp.shared_experts.{name}_proj.weight",
                moe["shared"][name][si],
                transpose=True,
            )
    return flat


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _attention(
    x: jnp.ndarray,  # [B, S, H]
    attn: Dict[str, jnp.ndarray],  # each [H, H]
    cfg: DeepseekV2Config,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,  # [B, Hh, cap, D]
    cache_v: jnp.ndarray,
    pos,  # scalar start position of x within the sequence
    is_prefill: bool,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    b, s, h = x.shape
    nh, d = cfg.num_attention_heads, cfg.head_dim
    kv_dtype = cache_k.dtype

    q, k, v = _qkv_proj(x, attn, b, s, nh, d, decode=not is_prefill)

    # RoPE + attention math in f32 (reference deepseek_v2.rs:319-324, 456-470).
    q32, k32 = apply_rope(q, k, cos, sin, start=pos)
    v32 = v.astype(jnp.float32)

    cache_k = jax.lax.dynamic_update_slice(
        cache_k, k32.astype(kv_dtype), (0, 0, pos, 0)
    )
    cache_v = jax.lax.dynamic_update_slice(
        cache_v, v32.astype(kv_dtype), (0, 0, pos, 0)
    )

    scale = 1.0 / math.sqrt(d)
    if is_prefill:
        # Fresh K/V in f32 for the prompt pass (reference deepseek_v2.rs:452).
        if pallas_enabled() and s >= 256:
            ctx = mha_pallas(
                q32, k32, v32, scale=scale, mode="causal", out_dtype=jnp.float32
            )
        else:
            mask = causal_mask(s, s)[None, None]
            ctx = sdpa(q32, k32, v32, scale=scale, mask=mask, out_dtype=jnp.float32)
    else:
        cap = cache_k.shape[2]
        mask = decode_mask(cap, pos + s - 1)[None, None]
        ctx = sdpa(
            q32,
            cache_k.astype(jnp.float32),
            cache_v.astype(jnp.float32),
            scale=scale,
            mask=mask,
            out_dtype=jnp.float32,
        )

    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h).astype(x.dtype)
    return _o_proj(ctx, attn, decode=not is_prefill), cache_k, cache_v


def _qkv_proj(x, attn, b, s, nh, d, *, decode):
    """Q/K/V projections; handles the q8 fused [H, 3H] stream transparently."""
    if "wqkv" in attn:
        from ..ops.linear_q8 import qmm

        qkv = qmm(x.reshape(b * s, -1), attn["wqkv"], decode=decode)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q, k, v = x @ attn["wq"], x @ attn["wk"], x @ attn["wv"]
    to_heads = lambda t: t.reshape(b, s, nh, d).transpose(0, 2, 1, 3)
    return to_heads(q), to_heads(k), to_heads(v)


def _o_proj(ctx, attn, *, decode):
    """Output projection [B, S, H] -> [B, S, H]; q8-aware."""
    from ..ops.linear_q8 import is_qlinear, qmm

    if is_qlinear(attn["wo"]):
        b, s, h = ctx.shape
        return qmm(ctx.reshape(b * s, h), attn["wo"], decode=decode).reshape(b, s, h)
    return ctx @ attn["wo"]


def _index_tree(tree, i):
    return jax.tree_util.tree_map(lambda a: a[i], tree)


def _decode_attn_mode() -> str:
    """Cache-update strategy for decode attention on the stacked [L,...] cache.

    - "pool" (default): one-timestep write straight into the pool + an XLA
      dynamic layer slice feeding sdpa — no per-layer copy.
    - "slice": materialize cache[li], update the timestep, write the whole
      layer back (two ~42 MB copies per layer at b=32, cap=512; the r2
      behavior, kept for ablation via DEEPSEEK_DECODE_ATTN=slice).
    - "stacked": the Pallas layer-indexed pool kernel. Measured on the v5e
      (2026-08-17) as a 3-5x decode REGRESSION (b=32: 100.4 ms/step vs 17.3
      slice; b=8: 30.9 vs 9.5), so it is ablation-only
      (DEEPSEEK_DECODE_ATTN=stacked) and needs Pallas.
    """
    import os

    mode = os.environ.get("DEEPSEEK_DECODE_ATTN", "pool")
    if mode == "stacked":
        from ..ops.flash_attention import pallas_enabled

        if not pallas_enabled():
            return "pool"
    return mode


# Prefill expert-lift escape hatch: training wraps its grad computation in
# no_prefill_lift() so the backward never sees stacked experts (the stacked
# cotangent is a zeros+scatter of the whole stack per layer).
_PREFILL_LIFT = True


def no_prefill_lift():
    import contextlib

    @contextlib.contextmanager
    def _cm():
        global _PREFILL_LIFT
        prev = _PREFILL_LIFT
        _PREFILL_LIFT = False
        try:
            yield
        finally:
            _PREFILL_LIFT = prev

    return _cm()


def _lift_experts_for_prefill(layers_moe, n_rows: int, cfg: DeepseekV2Config):
    """Prefill analogue of _lift_experts_for_decode: when the Pallas grouped
    GEMM will run (rows > 512), lift the expert stack out of the scan xs so
    each layer's call reads the stack directly instead of paying a ~440 MB
    scan-slice copy per layer."""
    from ..ops.flash_attention import pallas_enabled

    import os

    mode = os.environ.get("DEEPSEEK_MOE_PREFILL")
    gmm = mode == "gmm" or (mode is None and n_rows > 512 and pallas_enabled())
    if gmm and _PREFILL_LIFT:
        return (
            {k: v for k, v in layers_moe.items() if k != "experts"},
            layers_moe["experts"],
        )
    return layers_moe, None


def _lift_experts_for_decode(layers_moe, n_rows: int, cfg: DeepseekV2Config):
    """Decide whether batched decode should use the fused distinct-expert
    kernel, and if so lift the expert stack OUT of the scan xs: a scan-sliced
    stacked operand feeding an opaque Pallas call materializes a ~440 MB
    copy per layer per step (measured 34 vs 19 ms/step at b=32), while the
    layer-indexed kernel DMAs straight from the full stack.

    Returns (layers_moe_for_xs, experts_stack_or_None)."""
    from ..ops.flash_attention import pallas_enabled

    if n_rows * cfg.num_experts_per_tok > cfg.n_routed_experts and pallas_enabled():
        return (
            {k: v for k, v in layers_moe.items() if k != "experts"},
            layers_moe["experts"],
        )
    return layers_moe, None


def quantize_lm_params(params: Params, scope: str = "experts", bits: int = 8) -> Params:
    """Weight-only quantization (opt-in), int8 (default) or int4.

    scope="experts": routed experts only — replaces the stacked
    `layers_moe.experts` with a per-layer list of quantized tensors + scales
    under `moe_q8`. Per-layer (unstacked) storage matters: the fused Pallas
    decode kernel is an opaque custom call, so a scan-sliced stacked operand
    would be materialized (copying the whole layer's experts every step) —
    separate buffers stream exactly the selected experts.

    scope="full": additionally quantizes the rest of the decode-step weight
    bandwidth — attention projections (q/k/v fused into one [H, 3H] stream),
    shared experts and the dense layer's MLP (gate||up fused), and lm_head —
    stored per-layer under `q8_layers` / `q8_lm_head`. Routers, norms and the
    embedding stay in the model dtype (routing is discontinuous: quantizing
    the gate risks flipping expert selection; the embedding is a gather).

    bits=4 stores the same containers with int4 payloads (block-local
    split-half packing + group-128 scales, ops/linear_q4) — the `q8`-named
    top-level keys then hold self-describing `q4`/`gu_q4` dicts so every
    downstream dispatch (qmm, _q8_ffn, paged decode, sharding specs) keys on
    the leaf names, not the container names.
    """
    from ..ops.linear_q8 import quantize_linear as quantize_linear_q8
    from ..ops.moe_q8 import quantize_experts as quantize_experts_q8

    assert scope in ("experts", "full"), scope
    assert bits in (8, 4), bits
    if bits == 4:
        from ..ops.linear_q4 import quantize_linear_q4 as quantize_linear
        from ..ops.moe_q4 import quantize_experts_q4 as quantize_experts
    else:
        quantize_linear = quantize_linear_q8
        quantize_experts = quantize_experts_q8
    new = dict(params)
    moe = dict(params["layers_moe"])
    experts = moe.pop("experts")
    n_moe = experts["gate"].shape[0]
    new["layers_moe"] = moe
    new["moe_q8"] = [
        quantize_experts({k: experts[k][j] for k in ("gate", "up", "down")})
        for j in range(n_moe)
    ]
    if scope == "experts":
        return new

    def qfuse(*ws):
        w = jnp.concatenate(ws, axis=-1) if len(ws) > 1 else ws[0]
        return quantize_linear(w)

    dense = dict(params["layers_dense"])
    attn_d = dense.pop("attn")
    mlp_d = dense.pop("mlp")
    new["layers_dense"] = dense
    q8_dense = [
        {
            "wqkv": qfuse(attn_d["wq"][j], attn_d["wk"][j], attn_d["wv"][j]),
            "wo": quantize_linear(attn_d["wo"][j]),
            "gu": qfuse(mlp_d["gate"][j], mlp_d["up"][j]),
            "down": quantize_linear(mlp_d["down"][j]),
        }
        for j in range(attn_d["wq"].shape[0])
    ]
    attn_m = moe.pop("attn")
    shared = moe.pop("shared")
    q8_moe = [
        {
            "wqkv": qfuse(attn_m["wq"][j], attn_m["wk"][j], attn_m["wv"][j]),
            "wo": quantize_linear(attn_m["wo"][j]),
            "shared_gu": qfuse(shared["gate"][j], shared["up"][j]),
            "shared_down": quantize_linear(shared["down"][j]),
        }
        for j in range(n_moe)
    ]
    # Shared-expert pseudo-experts for the decode kernels: the shared MLP
    # (intermediate n_shared*I) splits along its intermediate dim into
    # n_shared expert-shaped [H, I] SwiGLUs whose down-projections sum —
    # exactly the accumulation the distinct-expert visit kernels already do.
    # Folding them in as always-selected visits removes the separate shared
    # swiglu_q8 launch per layer and lets the shared bytes ride the same
    # double-buffered weight stream. Per-column scales over the halves are
    # at least as tight as over the fused stream.
    gu_key = "gu_q4" if bits == 4 else "gu_q8"
    i_e = new["moe_q8"][0][gu_key].shape[-1] // 2
    i_tot = shared["gate"].shape[-1]
    if i_tot % i_e == 0:
        n_sh = i_tot // i_e
        for j in range(n_moe):
            pe = quantize_experts(
                {
                    "gate": jnp.stack(
                        [shared["gate"][j][:, t * i_e : (t + 1) * i_e] for t in range(n_sh)]
                    ),
                    "up": jnp.stack(
                        [shared["up"][j][:, t * i_e : (t + 1) * i_e] for t in range(n_sh)]
                    ),
                    "down": jnp.stack(
                        [shared["down"][j][t * i_e : (t + 1) * i_e, :] for t in range(n_sh)]
                    ),
                }
            )
            new["moe_q8"][j].update({f"pe_{k}": v for k, v in pe.items()})
    new["q8_layers"] = {"dense": q8_dense, "moe": q8_moe}
    new["q8_lm_head"] = quantize_linear(new.pop("lm_head"))
    return new


def vocab_size_of(params: Params) -> int:
    if "lm_head" in params:
        return params["lm_head"].shape[-1]
    head = params["q8_lm_head"]
    return head["q4" if "q4" in head else "q8"].shape[-1]


def _dequantize_experts(qd, dtype, cfg: "DeepseekV2Config" = None):
    """Rebuild gate/up/down from the fused gu stream for the XLA MoE paths
    (int8 or int4 expert dicts)."""
    if "gu_q4" in qd:
        from ..ops.moe_q4 import dequantize_experts_q4

        h = qd["down_q4"].shape[-1]
        return dequantize_experts_q4(qd, dtype, cfg.moe_intermediate_size, h)
    gu = (qd["gu_q8"].astype(jnp.float32) * qd["gu_scale"]).astype(dtype)
    i = gu.shape[-1] // 2
    down = (qd["down_q8"].astype(jnp.float32) * qd["down_scale"]).astype(dtype)
    return {"gate": gu[..., :i], "up": gu[..., i:], "down": down}


def lm_forward(
    params: Params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [B, S, H]
    cache,  # KVCache dict: k/v [L, B, Hh, cap, D]
    pos=0,  # scalar: absolute position of embeds[:, 0]
    is_prefill: bool = True,
    remat: bool = False,  # rematerialize MoE layers (training memory)
) -> Tuple[jnp.ndarray, Any]:
    """Run the decoder stack. Returns (hidden [B,S,H], updated cache).

    Covers both prefill (S>1, causal mask, pos=0) and decode (S==1,
    attends over the cache up to `pos`). Params produced by
    `quantize_lm_params` take the unrolled int8 MoE path.
    """
    if "moe_q8" in params:
        return _lm_forward_q8(params, cfg, embeds, cache, pos, is_prefill)
    cos, sin = _rope_consts(cfg)
    x = embeds
    ld = cfg.first_k_dense_replace

    # The stacked [L, ...] cache is carried through the layer loops and
    # updated with dynamic_update_index_in_dim, never re-assembled: the r1
    # design (scan over cache xs/ys + dense/moe concat) re-materialized the
    # whole pool every decode step; in-place carry updates let XLA alias the
    # loop buffers (VERDICT r1 #10).
    # Decode: one-timestep pool write + fused layer-slice read by default
    # (see _decode_attn_mode); prefill slices/updates the layer's whole K/V
    # through the carry (it writes S timesteps at once).
    attn_mode = None if is_prefill else _decode_attn_mode()
    k_all, v_all = cache["k"], cache["v"]
    for i in range(ld):
        layer = _index_tree(params["layers_dense"], i)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        if is_prefill:
            attn_out, ck, cv = _attention(
                xn, layer["attn"], cfg, cos, sin, k_all[i], v_all[i], pos, is_prefill
            )
            k_all = jax.lax.dynamic_update_index_in_dim(k_all, ck, i, 0)
            v_all = jax.lax.dynamic_update_index_in_dim(v_all, cv, i, 0)
        else:
            attn_out, k_all, v_all = _decode_attention(
                xn, layer["attn"], cfg, cos, sin, k_all, v_all, i, pos, attn_mode
            )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        b, s, h = xn.shape
        mlp_out = swiglu(
            xn.reshape(b * s, h), layer["mlp"]["gate"], layer["mlp"]["up"], layer["mlp"]["down"]
        ).reshape(b, s, h)
        x = res + mlp_out

    def moe_layer_body(carry, xs):
        x, k_all, v_all = carry
        layer, li = xs
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        if is_prefill:
            ck = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
            cv = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
            attn_out, ck, cv = _attention(
                xn, layer["attn"], cfg, cos, sin, ck, cv, pos, is_prefill
            )
            k_all = jax.lax.dynamic_update_index_in_dim(k_all, ck, li, 0)
            v_all = jax.lax.dynamic_update_index_in_dim(v_all, cv, li, 0)
        else:
            attn_out, k_all, v_all = _decode_attention(
                xn, layer["attn"], cfg, cos, sin, k_all, v_all, li, pos, attn_mode
            )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        b, s, h = xn.shape
        x_flat = xn.reshape(b * s, h)
        weights, idx = route(x_flat, layer["router"], cfg.num_experts_per_tok)
        if is_prefill:
            routed = moe_ffn_prefill(
                x_flat,
                experts_stack if experts_stack is not None else layer["experts"],
                weights,
                idx,
                layer_idx=li - ld,
            )
        elif experts_stack is not None:
            from ..ops.moe_decode import moe_ffn_decode_fused

            routed = moe_ffn_decode_fused(
                x_flat, experts_stack, weights, idx, layer_idx=li - ld
            )
        else:
            routed = moe_ffn_decode(x_flat, layer["experts"], weights, idx)
        shared = swiglu(
            x_flat, layer["shared"]["gate"], layer["shared"]["up"], layer["shared"]["down"]
        )
        x = res + (routed + shared).reshape(b, s, h)
        return (x, k_all, v_all), None

    moe_layers = params["layers_moe"]
    if not is_prefill:
        moe_layers, experts_stack = _lift_experts_for_decode(
            moe_layers, embeds.shape[0] * embeds.shape[1], cfg
        )
    else:
        moe_layers, experts_stack = _lift_experts_for_prefill(
            moe_layers, embeds.shape[0] * embeds.shape[1], cfg
        )
    moe_xs = (moe_layers, jnp.arange(ld, cfg.num_hidden_layers))
    body = moe_layer_body
    if remat and is_prefill:
        # Per-layer rematerialization: backward recomputes each MoE layer's
        # activations instead of saving them — trades ~1 extra forward of
        # FLOPs for O(1-layer) activation memory, enabling long-seq
        # fine-tuning on one chip.
        body = jax.checkpoint(moe_layer_body)
    (x, k_all, v_all), _ = jax.lax.scan(body, (x, k_all, v_all), moe_xs)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, {"k": k_all, "v": v_all}


def _attention_decode_stacked(
    x: jnp.ndarray,  # [B, 1, H]
    attn: Dict[str, jnp.ndarray],
    cfg: DeepseekV2Config,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, B, Hh, cap, D] full stacked cache
    v_all: jnp.ndarray,
    li,  # scalar i32 layer index (python int or traced)
    pos,  # scalar i32 shared position OR [B] per-slot positions
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode attention operating on the layer-stacked cache IN PLACE.

    The XLA decode path slices cache[li] out of the carry and writes the
    whole layer back every step — two ~42 MB copies per layer at b=32,
    measured ~870 us/layer in the decode trace (the dominant step cost,
    bigger than the MoE weights). Here the new token's K/V is scattered
    directly at [li, rows, :, pos, :] (one timestep, ~0.3 MB) and attention
    reads the cache through the layer-indexed Pallas kernel
    (ops/paged_attention.decode_attention_stacked) — the cache is streamed
    exactly once per layer and never copied.
    """
    from ..ops.paged_attention import decode_attention_stacked

    b, s, h = x.shape
    assert s == 1
    nh, d = cfg.num_attention_heads, cfg.head_dim
    kv_dtype = k_all.dtype

    q, k, v = _qkv_proj(x, attn, b, 1, nh, d, decode=True)

    pos_b = jnp.broadcast_to(jnp.asarray(pos, jnp.int32).reshape(-1), (b,))
    cos_b = jnp.take(cos, pos_b, axis=0)[:, None, None, :]  # [B,1,1,D]
    sin_b = jnp.take(sin, pos_b, axis=0)[:, None, None, :]
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)

    def rot(t):
        half = t.shape[-1] // 2
        return jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)

    q32 = q32 * cos_b + rot(q32) * sin_b
    k32 = k32 * cos_b + rot(k32) * sin_b
    v32 = v.astype(jnp.float32)

    rows = jnp.arange(b)
    li = jnp.asarray(li, jnp.int32)
    k_all = k_all.at[li, rows, :, pos_b, :].set(k32[:, :, 0, :].astype(kv_dtype))
    v_all = v_all.at[li, rows, :, pos_b, :].set(v32[:, :, 0, :].astype(kv_dtype))

    ctx = decode_attention_stacked(
        q32[:, :, 0, :], k_all, v_all, li, pos_b + 1, scale=1.0 / math.sqrt(d)
    )  # [B, Hh, D] f32
    ctx = ctx.reshape(b, 1, h).astype(x.dtype)
    return _o_proj(ctx, attn, decode=True), k_all, v_all


def _attention_decode_ragged(
    x: jnp.ndarray,  # [B, 1, H]
    attn: Dict[str, jnp.ndarray],
    cfg: DeepseekV2Config,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    cache_k: jnp.ndarray,  # [B, Hh, cap, D]
    cache_v: jnp.ndarray,
    pos: jnp.ndarray,  # [B] per-slot positions (continuous batching)
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode attention where every batch slot sits at its own position.

    Powers continuous batching: slots hold sequences of different lengths, so
    RoPE, the KV write, and the valid-key mask are all per-slot.
    """
    b, s, h = x.shape
    assert s == 1
    nh, d = cfg.num_attention_heads, cfg.head_dim
    kv_dtype = cache_k.dtype

    q, k, v = _qkv_proj(x, attn, b, 1, nh, d, decode=True)

    # Per-slot RoPE: gather each slot's cos/sin row.
    cos_b = jnp.take(cos, pos, axis=0)[:, None, None, :]  # [B,1,1,D]
    sin_b = jnp.take(sin, pos, axis=0)[:, None, None, :]
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)

    def rot(t):
        half = t.shape[-1] // 2
        return jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)

    q32 = q32 * cos_b + rot(q32) * sin_b
    k32 = k32 * cos_b + rot(k32) * sin_b
    v32 = v.astype(jnp.float32)

    # Per-slot KV write: scatter one timestep per batch row.
    rows = jnp.arange(b)
    cache_k = cache_k.at[rows, :, pos, :].set(k32[:, :, 0, :].astype(kv_dtype))
    cache_v = cache_v.at[rows, :, pos, :].set(v32[:, :, 0, :].astype(kv_dtype))

    cap = cache_k.shape[2]
    mask = (jnp.arange(cap)[None, :] > pos[:, None])[:, None, None, :]  # [B,1,1,cap]
    ctx = sdpa(
        q32,
        cache_k.astype(jnp.float32),
        cache_v.astype(jnp.float32),
        scale=1.0 / math.sqrt(d),
        mask=mask,
        out_dtype=jnp.float32,
    )
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, 1, h).astype(x.dtype)
    return _o_proj(ctx, attn, decode=True), cache_k, cache_v


def _attention_decode_pool(
    x: jnp.ndarray,  # [B, 1, H]
    attn: Dict[str, jnp.ndarray],
    cfg: DeepseekV2Config,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    k_all: jnp.ndarray,  # [L, B, Hh, cap, D] full stacked cache
    v_all: jnp.ndarray,
    li,  # scalar layer index (python int or traced)
    pos,  # scalar i32 shared position OR [B] per-slot positions
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode attention on the layer-stacked cache with no per-layer copy.

    The "slice" strategy materializes cache[li] out of the carry and writes
    the whole layer back every step — two ~42 MB copies per layer at b=32,
    cap=512. Here the new token's K/V goes straight into the pool (a
    one-timestep dynamic_update_slice, or a per-row scatter when positions
    are ragged) and the attention dot reads the pool through a dynamic layer
    slice that XLA fuses into the score/context GEMMs, so the layer's cache
    is streamed once per step and never duplicated. Same math as the slice
    strategy (f32 RoPE/softmax per reference deepseek_v2.rs:319-324).

    Chunk mode (s > 1 — speculative-decode verification): the s draft
    tokens write at pos..pos+s-1 (one dynamic_update_slice for a shared
    scalar pos; a per-(row, step) scatter for ragged [B] positions), and
    query j's mask extends to its row's pos+j so each draft position sees
    exactly its causal prefix.
    """
    b, s, h = x.shape
    nh, d = cfg.num_attention_heads, cfg.head_dim
    kv_dtype = k_all.dtype

    q, k, v = _qkv_proj(x, attn, b, s, nh, d, decode=True)
    li = jnp.asarray(li, jnp.int32)
    pos_arr = jnp.asarray(pos, jnp.int32)

    def rot(t):
        half = t.shape[-1] // 2
        return jnp.concatenate([-t[..., half:], t[..., :half]], axis=-1)

    if pos_arr.ndim == 0:
        q32, k32 = apply_rope(q, k, cos, sin, start=pos_arr)
        v32 = v.astype(jnp.float32)
        k_all = jax.lax.dynamic_update_slice(
            k_all, k32.astype(kv_dtype)[None], (li, 0, 0, pos_arr, 0)
        )
        v_all = jax.lax.dynamic_update_slice(
            v_all, v32.astype(kv_dtype)[None], (li, 0, 0, pos_arr, 0)
        )
        posq = pos_arr + jnp.arange(s)[None, :]  # [1, S] query positions
    else:
        # Per-slot RoPE + scatter (continuous batching / ragged chunks).
        posq = pos_arr[:, None] + jnp.arange(s)[None, :]  # [B, S]
        cos_b = jnp.take(cos, posq, axis=0)[:, None]  # [B, 1, S, D]
        sin_b = jnp.take(sin, posq, axis=0)[:, None]
        q32 = q.astype(jnp.float32)
        k32 = k.astype(jnp.float32)
        q32 = q32 * cos_b + rot(q32) * sin_b
        k32 = k32 * cos_b + rot(k32) * sin_b
        v32 = v.astype(jnp.float32)
        rows = jnp.arange(b)
        if s == 1:
            k_all = k_all.at[li, rows, :, pos_arr, :].set(
                k32[:, :, 0, :].astype(kv_dtype)
            )
            v_all = v_all.at[li, rows, :, pos_arr, :].set(
                v32[:, :, 0, :].astype(kv_dtype)
            )
        else:
            # [B, S] (row, position) scatter; values ordered [B, S, Hh, D].
            k_all = k_all.at[li, rows[:, None], :, posq, :].set(
                k32.transpose(0, 2, 1, 3).astype(kv_dtype)
            )
            v_all = v_all.at[li, rows[:, None], :, posq, :].set(
                v32.transpose(0, 2, 1, 3).astype(kv_dtype)
            )

    ck = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
    cv = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
    cap = ck.shape[2]
    # Per-query causal budget: query j of row b (at posq[b, j]) sees keys
    # <= posq[b, j]. Broadcasts over rows when pos was a shared scalar.
    mask = jnp.arange(cap)[None, None, None, :] > posq[:, None, :, None]
    ctx = sdpa(
        q32, ck, cv, scale=1.0 / math.sqrt(d), mask=mask, out_dtype=jnp.float32
    )
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, s, h).astype(x.dtype)
    return _o_proj(ctx, attn, decode=True), k_all, v_all


def _decode_attention(
    xn, attn, cfg, cos, sin, k_all, v_all, li, pos, mode
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode-attention step against the stacked cache.

    `mode` selects the cache-update strategy (see _decode_attn_mode);
    returns (attn_out, k_all, v_all) with the pool updated in place.
    """
    if xn.shape[1] > 1:
        mode = "pool"  # only the pool strategy implements chunk decode
    cap = k_all.shape[3]
    if (
        xn.shape[1] == 1
        and mode == "pool"
        and isinstance(attn.get("wqkv"), dict)
        and isinstance(attn.get("wo"), dict)
        and cfg.head_dim % 128 == 0  # kernel lane slices need 128-alignment
        and (cap <= 512 or cap % 512 == 0)  # even chunk walk
    ):
        # Quantized attention weights at s==1: one fused launch per layer
        # (qkv GEMM + RoPE + flash attention over the pool + wo GEMM)
        # instead of two qmm launches + the XLA attention chain.
        from ..ops.attn_fused import attn_decode_fused, fused_attn_enabled

        if fused_attn_enabled():
            return attn_decode_fused(
                xn, attn, cfg, cos, sin, k_all, v_all, li, pos
            )
    if mode == "stacked":
        return _attention_decode_stacked(xn, attn, cfg, cos, sin, k_all, v_all, li, pos)
    if mode == "pool":
        return _attention_decode_pool(xn, attn, cfg, cos, sin, k_all, v_all, li, pos)
    # "slice": the r2 layer slice / write-back strategy.
    if isinstance(li, int):
        ck, cv = k_all[li], v_all[li]
    else:
        ck = jax.lax.dynamic_index_in_dim(k_all, li, 0, keepdims=False)
        cv = jax.lax.dynamic_index_in_dim(v_all, li, 0, keepdims=False)
    if jnp.asarray(pos).ndim == 0:
        out, ck, cv = _attention(xn, attn, cfg, cos, sin, ck, cv, pos, is_prefill=False)
    else:
        out, ck, cv = _attention_decode_ragged(xn, attn, cfg, cos, sin, ck, cv, pos)
    k_all = jax.lax.dynamic_update_index_in_dim(k_all, ck, li, 0)
    v_all = jax.lax.dynamic_update_index_in_dim(v_all, cv, li, 0)
    return out, k_all, v_all


def lm_decode_step_ragged(
    params: Params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [B, 1, H]
    cache,
    pos: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, Any]:
    """One decode step with per-slot positions. Returns (hidden [B,1,H], cache)."""
    if "moe_q8" in params:
        return _lm_decode_step_ragged_q8(params, cfg, embeds, cache, pos)
    cos, sin = _rope_consts(cfg)
    x = embeds
    ld = cfg.first_k_dense_replace

    # In-place pool carry (see lm_forward / _decode_attn_mode).
    attn_mode = _decode_attn_mode()
    k_all, v_all = cache["k"], cache["v"]
    for i in range(ld):
        layer = _index_tree(params["layers_dense"], i)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _decode_attention(
            xn, layer["attn"], cfg, cos, sin, k_all, v_all, i, pos, attn_mode
        )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        b, s, h = xn.shape
        mlp_out = swiglu(
            xn.reshape(b * s, h), layer["mlp"]["gate"], layer["mlp"]["up"], layer["mlp"]["down"]
        ).reshape(b, s, h)
        x = res + mlp_out

    def moe_layer_body(carry, xs):
        x, k_all, v_all = carry
        layer, li = xs
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _decode_attention(
            xn, layer["attn"], cfg, cos, sin, k_all, v_all, li, pos, attn_mode
        )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        b, s, h = xn.shape
        x_flat = xn.reshape(b * s, h)
        weights, idx = route(x_flat, layer["router"], cfg.num_experts_per_tok)
        if experts_stack is not None:
            from ..ops.moe_decode import moe_ffn_decode_fused

            routed = moe_ffn_decode_fused(
                x_flat, experts_stack, weights, idx, layer_idx=li - ld
            )
        else:
            routed = moe_ffn_decode(x_flat, layer["experts"], weights, idx)
        shared = swiglu(
            x_flat, layer["shared"]["gate"], layer["shared"]["up"], layer["shared"]["down"]
        )
        x = res + (routed + shared).reshape(b, s, h)
        return (x, k_all, v_all), None

    moe_layers, experts_stack = _lift_experts_for_decode(
        params["layers_moe"], embeds.shape[0], cfg
    )
    moe_xs = (moe_layers, jnp.arange(ld, cfg.num_hidden_layers))
    (x, k_all, v_all), _ = jax.lax.scan(moe_layer_body, (x, k_all, v_all), moe_xs)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, {"k": k_all, "v": v_all}


def _q8_layer_weights(params: Params, which: str, j: int):
    """Per-layer weights for the unrolled q8 paths, merging the bf16 stacked
    entries (norms, router, and — in experts-only scope — attn/mlp/shared)
    with the per-layer q8 dicts when scope="full"."""
    base = _index_tree(params[f"layers_{which}"], j)
    q8l = params.get("q8_layers")
    if q8l is None:
        return base
    merged = dict(base)
    q = q8l[which][j]
    merged["attn"] = {"wqkv": q["wqkv"], "wo": q["wo"]}
    if which == "dense":
        merged["mlp_q8"] = {"gu": q["gu"], "down": q["down"]}
    else:
        merged["shared_q8"] = {"gu": q["shared_gu"], "down": q["shared_down"]}
    return merged


def _q8_ffn(
    x_flat: jnp.ndarray,
    layer,
    cfg: DeepseekV2Config,
    q8_experts,
    *,
    decode: bool,
    is_prefill: bool,
) -> jnp.ndarray:
    """FFN for the quantized paths: dense SwiGLU or routed+shared MoE, with
    each weight either bf16 (experts-only scope), int8, or int4 (the expert
    dict's key names select the kernel family)."""
    from ..ops.flash_attention import pallas_enabled
    from ..ops.linear_q8 import swiglu_q8
    from ..ops.moe_q8 import moe_ffn_decode_q8

    if "mlp_q8" in layer:
        return swiglu_q8(x_flat, layer["mlp_q8"]["gu"], layer["mlp_q8"]["down"], decode=decode)
    if "mlp" in layer:
        return swiglu(x_flat, layer["mlp"]["gate"], layer["mlp"]["up"], layer["mlp"]["down"])

    weights, idx = route(x_flat, layer["router"], cfg.num_experts_per_tok)
    q4 = "gu_q4" in q8_experts
    pe_key = "pe_gu_q4" if q4 else "pe_gu_q8"
    # When pe_* streams exist (full-scope quantization), the decode kernels
    # fold the shared MLP in as always-on pseudo-expert visits — no separate
    # shared launch. The per-selection kernel only merges at b=1 (larger b
    # would re-read the pe streams once per row).
    shared_merged = False
    if decode and pallas_enabled():
        if x_flat.shape[0] * cfg.num_experts_per_tok > cfg.n_routed_experts:
            # Serving batches: one visit per distinct expert (the per-
            # selection kernel re-reads shared experts ~3x at b=32).
            shared_merged = pe_key in q8_experts
            if q4:
                from ..ops.moe_q4 import moe_ffn_decode_q4_fused

                routed = moe_ffn_decode_q4_fused(x_flat, q8_experts, weights, idx)
            else:
                from ..ops.moe_decode import moe_ffn_decode_q8_fused

                routed = moe_ffn_decode_q8_fused(x_flat, q8_experts, weights, idx)
        else:
            shared_merged = pe_key in q8_experts and x_flat.shape[0] == 1
            if q4:
                from ..ops.moe_q4 import moe_ffn_decode_q4

                routed = moe_ffn_decode_q4(
                    x_flat, q8_experts, weights, idx, with_shared=shared_merged
                )
            else:
                routed = moe_ffn_decode_q8(
                    x_flat, q8_experts, weights, idx, with_shared=shared_merged
                )
    else:
        deq = _dequantize_experts(q8_experts, x_flat.dtype, cfg)
        if is_prefill:
            routed = moe_ffn_prefill(x_flat, deq, weights, idx)
        else:
            routed = moe_ffn_decode(x_flat, deq, weights, idx)
    if shared_merged:
        return routed
    if "shared_q8" in layer:
        shared = swiglu_q8(
            x_flat, layer["shared_q8"]["gu"], layer["shared_q8"]["down"], decode=decode
        )
    else:
        shared = swiglu(
            x_flat, layer["shared"]["gate"], layer["shared"]["up"], layer["shared"]["down"]
        )
    return routed + shared


def _lm_forward_q8(
    params: Params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,
    cache,
    pos,
    is_prefill: bool,
) -> Tuple[jnp.ndarray, Any]:
    """Unrolled layer loop for quantized params (see quantize_lm_params)."""
    cos, sin = _rope_consts(cfg)
    x = embeds
    ld = cfg.first_k_dense_replace
    b, s, h = x.shape
    decode = not is_prefill

    # In-place pool carry (see lm_forward / _decode_attn_mode) — the unrolled
    # loop previously re-stacked all L per-layer caches every step.
    attn_mode = None if is_prefill else _decode_attn_mode()
    k_all, v_all = cache["k"], cache["v"]
    for i in range(ld):
        layer = _q8_layer_weights(params, "dense", i)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        if is_prefill:
            attn_out, ck, cv = _attention(
                xn, layer["attn"], cfg, cos, sin, k_all[i], v_all[i], pos, is_prefill
            )
            k_all = jax.lax.dynamic_update_index_in_dim(k_all, ck, i, 0)
            v_all = jax.lax.dynamic_update_index_in_dim(v_all, cv, i, 0)
        else:
            attn_out, k_all, v_all = _decode_attention(
                xn, layer["attn"], cfg, cos, sin, k_all, v_all, i, pos, attn_mode
            )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        mlp_out = _q8_ffn(
            xn.reshape(b * s, h), layer, cfg, None, decode=decode, is_prefill=is_prefill
        ).reshape(b, s, h)
        x = res + mlp_out

    for j, q8 in enumerate(params["moe_q8"]):
        li = ld + j
        layer = _q8_layer_weights(params, "moe", j)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        if is_prefill:
            attn_out, ck, cv = _attention(
                xn, layer["attn"], cfg, cos, sin, k_all[li], v_all[li], pos, is_prefill
            )
            k_all = jax.lax.dynamic_update_index_in_dim(k_all, ck, li, 0)
            v_all = jax.lax.dynamic_update_index_in_dim(v_all, cv, li, 0)
        else:
            attn_out, k_all, v_all = _decode_attention(
                xn, layer["attn"], cfg, cos, sin, k_all, v_all, li, pos, attn_mode
            )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        ffn = _q8_ffn(
            xn.reshape(b * s, h), layer, cfg, q8, decode=decode, is_prefill=is_prefill
        )
        x = res + ffn.reshape(b, s, h)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, {"k": k_all, "v": v_all}


def _lm_decode_step_ragged_q8(
    params: Params,
    cfg: DeepseekV2Config,
    embeds: jnp.ndarray,  # [B, 1, H]
    cache,
    pos: jnp.ndarray,  # [B]
) -> Tuple[jnp.ndarray, Any]:
    """Ragged (per-slot position) decode step for quantized params."""
    cos, sin = _rope_consts(cfg)
    x = embeds
    ld = cfg.first_k_dense_replace
    b, s, h = x.shape

    k_all, v_all = cache["k"], cache["v"]
    attn_mode = _decode_attn_mode()
    for i in range(ld):
        layer = _q8_layer_weights(params, "dense", i)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _decode_attention(
            xn, layer["attn"], cfg, cos, sin, k_all, v_all, i, pos, attn_mode
        )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        mlp_out = _q8_ffn(
            xn.reshape(b, h), layer, cfg, None, decode=True, is_prefill=False
        ).reshape(b, 1, h)
        x = res + mlp_out

    for j, q8 in enumerate(params["moe_q8"]):
        li = ld + j
        layer = _q8_layer_weights(params, "moe", j)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        attn_out, k_all, v_all = _decode_attention(
            xn, layer["attn"], cfg, cos, sin, k_all, v_all, li, pos, attn_mode
        )
        x = res + attn_out
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        ffn = _q8_ffn(xn.reshape(b, h), layer, cfg, q8, decode=True, is_prefill=False)
        x = res + ffn.reshape(b, 1, h)

    hidden = rms_norm(x, params["norm"], cfg.rms_norm_eps)
    return hidden, {"k": k_all, "v": v_all}


def logits_last(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """lm_head on the last position only (reference deepseek_v2.rs:981-990)."""
    last = hidden[:, -1, :]
    if "q8_lm_head" in params:
        from ..ops.linear_q8 import qmm

        # Rows here are at most the decode batch — always the kernel path.
        return qmm(last, params["q8_lm_head"], decode=True, out_dtype=jnp.float32)
    return last @ params["lm_head"]


def lm_forward_debug(params: Params, cfg: DeepseekV2Config, embeds: jnp.ndarray) -> jnp.ndarray:
    """Eager prefill with the reference's debug stat dumps.

    Mirrors the env-gated channels DEEPSEEK_DEBUG_ATTN (per-attention stats,
    reference deepseek_v2.rs:18-43), DEEPSEEK_DEBUG_MOE (routing counts,
    :662-665, :738), and DEEPSEEK_DEBUG_LAYER0 (layer-0 breakdown,
    main.rs:865-948). Runs layer-by-layer without jit so every intermediate
    can be materialized; debugging only.
    """
    from ..utils.debug import dbg_print, dbg_stats, enabled

    cos, sin = _rope_consts(cfg)
    b, s, h = embeds.shape
    cache = {
        "k": jnp.zeros(
            (cfg.num_hidden_layers, b, cfg.num_attention_heads, s, cfg.head_dim),
            jnp.float32,
        ),
        "v": jnp.zeros(
            (cfg.num_hidden_layers, b, cfg.num_attention_heads, s, cfg.head_dim),
            jnp.float32,
        ),
    }
    x = embeds
    ld = cfg.first_k_dense_replace
    for i in range(cfg.num_hidden_layers):
        if i < ld:
            layer = _index_tree(params["layers_dense"], i)
        else:
            layer = _index_tree(params["layers_moe"], i - ld)
        res = x
        xn = rms_norm(x, layer["ln1"], cfg.rms_norm_eps)
        dbg_stats("DEEPSEEK_DEBUG_ATTN", f"layer{i}.attn.in_x", xn)
        attn_out, _, _ = _attention(
            xn, layer["attn"], cfg, cos, sin, cache["k"][i], cache["v"][i], 0, True
        )
        dbg_stats("DEEPSEEK_DEBUG_ATTN", f"layer{i}.attn.out", attn_out)
        x = res + attn_out
        if i == 0:
            dbg_stats("DEEPSEEK_DEBUG_LAYER0", "layer0.after_attn", x)
        res = x
        xn = rms_norm(x, layer["ln2"], cfg.rms_norm_eps)
        x_flat = xn.reshape(b * s, h)
        if i < ld:
            mlp_out = swiglu(
                x_flat, layer["mlp"]["gate"], layer["mlp"]["up"], layer["mlp"]["down"]
            )
        else:
            weights, idx = route(x_flat, layer["router"], cfg.num_experts_per_tok)
            if enabled("DEEPSEEK_DEBUG_MOE"):
                idx_h = np.asarray(idx)
                counts = np.bincount(idx_h.reshape(-1), minlength=cfg.n_routed_experts)
                dbg_print("DEEPSEEK_DEBUG_MOE", f"layer{i} moe counts={counts.tolist()}")
                dbg_print(
                    "DEEPSEEK_DEBUG_MOE",
                    f"layer{i} moe topk_idx[:4]={idx_h[:4].tolist()} "
                    f"topk_weight[:4]={np.asarray(weights)[:4].round(5).tolist()}",
                )
            routed = moe_ffn_prefill(x_flat, layer["experts"], weights, idx)
            shared = swiglu(
                x_flat, layer["shared"]["gate"], layer["shared"]["up"], layer["shared"]["down"]
            )
            mlp_out = routed + shared
            dbg_stats("DEEPSEEK_DEBUG_MOE", f"layer{i}.moe.out_total", mlp_out)
        x = res + mlp_out.reshape(b, s, h)
        if i == 0:
            dbg_stats("DEEPSEEK_DEBUG_LAYER0", "layer0.out", x)
    return rms_norm(x, params["norm"], cfg.rms_norm_eps)


def logits_all(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """lm_head on every position (training loss; speculative verification)."""
    if "q8_lm_head" in params:
        from ..ops.linear_q8 import qmm

        b, s, h = hidden.shape
        out = qmm(
            hidden.reshape(b * s, h), params["q8_lm_head"],
            decode=True, out_dtype=jnp.float32,
        )
        return out.reshape(b, s, -1)
    if "lm_head" not in params:
        raise ValueError("logits_all requires an lm_head (full or q8)")
    return hidden @ params["lm_head"]


def _rope_consts(cfg: DeepseekV2Config) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RoPE cos/sin consts; computed with numpy, embedded as constants.

    The cache is tiny ([max_pos, head_dim] f32 ~ 4 MB) and folding it as a
    jit constant avoids re-tracing trig each step (reference precomputes the
    same cache once per module, deepseek_v2.rs:259-265).
    """
    cos, sin = _ROPE_CACHE.get((cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta), (None, None))
    if cos is None:
        cos, sin = rope_cache(cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta)
        _ROPE_CACHE[(cfg.max_position_embeddings, cfg.head_dim, cfg.rope_theta)] = (cos, sin)
    return jnp.asarray(cos), jnp.asarray(sin)


_ROPE_CACHE: Dict[Tuple, Tuple[np.ndarray, np.ndarray]] = {}
