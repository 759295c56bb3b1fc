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


def shard_params(params, mesh: Mesh, specs) -> Any:
    """Place a param pytree on the mesh with the given specs."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )
