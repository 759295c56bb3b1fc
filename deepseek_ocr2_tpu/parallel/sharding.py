"""Partition specs for the DeepSeek-V2 param pytree.

Megatron-style tensor parallelism over the `mp` axis:
- attention q/k/v projections column-sharded (heads split), o row-sharded;
- MLP gate/up column-sharded, down row-sharded;
- routed experts expert-sharded over `mp` (expert parallelism);
- lm_head vocab-sharded;
- norms/router/embed replicated.

XLA inserts the all-reduces (psum over `mp`) at the row-sharded GEMMs; data
(batch) shards over `dp`.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import DeepseekV2Config


def lm_param_specs(cfg: DeepseekV2Config) -> Dict[str, Any]:
    """PartitionSpec pytree matching models.deepseek_v2 params."""

    def attn_specs():
        return {
            "wq": P(None, None, "mp"),
            "wk": P(None, None, "mp"),
            "wv": P(None, None, "mp"),
            "wo": P(None, "mp", None),
        }

    def mlp_specs():
        return {
            "gate": P(None, None, "mp"),
            "up": P(None, None, "mp"),
            "down": P(None, "mp", None),
        }

    return {
        "embed": P(None, None),
        "layers_dense": {
            "ln1": P(None, None),
            "ln2": P(None, None),
            "attn": attn_specs(),
            "mlp": mlp_specs(),
        },
        "layers_moe": {
            "ln1": P(None, None),
            "ln2": P(None, None),
            "attn": attn_specs(),
            "router": P(None, None, None),
            # Expert parallelism: experts sharded over mp.
            "experts": {
                "gate": P(None, "mp", None, None),
                "up": P(None, "mp", None, None),
                "down": P(None, "mp", None, None),
            },
            "shared": mlp_specs(),
        },
        "norm": P(None),
        "lm_head": P(None, "mp"),
    }


def lm_param_specs_q8(cfg: DeepseekV2Config, params: Dict[str, Any]) -> Dict[str, Any]:
    """PartitionSpec pytree for params produced by `quantize_lm_params`.

    Mirrors the quantized tree for either scope ("experts" or "full"):
    - `moe_q8` per-layer expert dicts stay expert-sharded over `mp` (EP);
    - `q8_layers` fused streams are row-sharded over `mp` on the contraction
      axis (wqkv/gu/shared_gu/wo/down) — the fused gate||up and q||k||v
      column boundaries do not align with an `mp` split of the output axis,
      so sharding the input axis keeps the post-dot `split` local and lets
      GSPMD insert one psum per projection;
    - `q8_lm_head` is vocab-sharded (column) like the bf16 lm_head;
    - int8 tensors and their f32 scales shard on matching axes (scales whose
      only non-unit axis is the *output* stay replicated under row sharding).

    Multi-chip note: the fused Pallas q8 kernels are single-device custom
    calls; under a >1-chip `mp` mesh run with DEEPSEEK_NO_PALLAS=1 so the
    XLA dequant paths (which GSPMD partitions) are used. The multichip
    dryrun (__graft_entry__.dryrun_multichip) validates exactly that
    configuration token-exactly against the unsharded q8 decode.
    """

    q4 = any("gu_q4" in e for e in params["moe_q8"])

    def qlin_row():  # contraction-axis (input) sharded
        if q4:
            # int4 packed rows come in 128-row blocks (256 original rows,
            # ops/linear_q4 block-local split-half); an `mp` cut of the
            # packed axis need not land on a block boundary, so q4 linears
            # shard the *output* axis instead — always block-safe, and the
            # group scales follow the same axis.
            return {"q4": P(None, "mp"), "scale": P(None, "mp")}
        return {"q8": P("mp", None), "scale": P(None, None)}

    def qlin_col():  # output-axis sharded (scales follow the output axis)
        if q4:
            return {"q4": P(None, "mp"), "scale": P(None, "mp")}
        return {"q8": P(None, "mp"), "scale": P(None, "mp")}

    def expert_q8_specs(entry):
        # q8: gu (gate||up fused) [E, H, 2I], scale [E, 1, 2I]; down [E, I, H].
        # q4: gu_q4 [E, Hp/2, 2I], gu_scale [E, Hp/128, 2I], ... — the E axis
        # is unpacked either way, so EP sharding is identical.
        names = ("gu_q4", "gu_scale", "down_q4", "down_scale") if "gu_q4" in entry else (
            "gu_q8", "gu_scale", "down_q8", "down_scale"
        )
        s = {name: P("mp", None, None) for name in names}
        # Shared pseudo-expert streams (full scope): [n_sh, ...] with n_sh
        # tiny and always-on for every token — replicate.
        for key in entry:
            if key.startswith("pe_"):
                s[key] = P(None, None, None)
        return s

    specs: Dict[str, Any] = {
        "embed": P(None, None),
        "norm": P(None),
        "moe_q8": [expert_q8_specs(e) for e in params["moe_q8"]],
    }
    full = "q8_layers" in params

    dense: Dict[str, Any] = {"ln1": P(None, None), "ln2": P(None, None)}
    moe: Dict[str, Any] = {
        "ln1": P(None, None),
        "ln2": P(None, None),
        "router": P(None, None, None),
    }
    if not full:
        dense["attn"] = {
            "wq": P(None, None, "mp"),
            "wk": P(None, None, "mp"),
            "wv": P(None, None, "mp"),
            "wo": P(None, "mp", None),
        }
        dense["mlp"] = {
            "gate": P(None, None, "mp"),
            "up": P(None, None, "mp"),
            "down": P(None, "mp", None),
        }
        moe["attn"] = dict(dense["attn"])
        moe["shared"] = dict(dense["mlp"])
        specs["lm_head"] = P(None, "mp")
    else:
        specs["q8_layers"] = {
            "dense": [
                {"wqkv": qlin_row(), "wo": qlin_row(), "gu": qlin_row(), "down": qlin_row()}
                for _ in params["q8_layers"]["dense"]
            ],
            "moe": [
                {
                    "wqkv": qlin_row(),
                    "wo": qlin_row(),
                    "shared_gu": qlin_row(),
                    "shared_down": qlin_row(),
                }
                for _ in params["q8_layers"]["moe"]
            ],
        }
        specs["q8_lm_head"] = qlin_col()
    specs["layers_dense"] = dense
    specs["layers_moe"] = moe
    return specs


def shard_params(params, mesh: Mesh, specs) -> Any:
    """Place a param pytree on the mesh with the given specs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
