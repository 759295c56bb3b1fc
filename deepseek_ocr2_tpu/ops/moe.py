"""Mixture-of-Experts ops — fully on-device, deterministic.

The reference routes on the CPU purely to dodge Vulkan driver bugs
(deepseek_v2.rs:578-660). On TPU, XLA `top_k`/`sort` are deterministic, so
routing stays on-device and the decode loop never syncs with the host.

Numeric policy matches HF/the reference:
- gate logits and softmax in f32 (deepseek_v2.rs:584-589),
- top-k over probabilities with first-index tie-break,
- expert outputs combined with f32 weights (deepseek_v2.rs:772-781).

Two dispatch strategies (identical math):
- prefill: sort-by-expert + `lax.ragged_dot` grouped GEMM — streams each
  expert's weights once, MXU-friendly (the TPU-native answer to the
  reference's sorted per-expert GEMM slices, deepseek_v2.rs:706-797);
- decode: gather the <=k selected experts per token — reads only B*k expert
  weight slices from HBM (the bandwidth-optimal path for tiny batches,
  replacing the reference's direct expert loop, deepseek_v2.rs:669-698).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def route(
    x_flat: jnp.ndarray,  # [N, H]
    router_w: jnp.ndarray,  # [H, E]
    top_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k routing: returns (weights [N,k] f32, idx [N,k] i32).

    Gate math is forced to f32 regardless of model dtype
    (reference deepseek_v2.rs:584-589): routing is discontinuous and tiny
    numeric differences flip expert selection.
    """
    logits = jnp.einsum(
        "nh,he->ne",
        x_flat.astype(jnp.float32),
        router_w.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    probs = jax.nn.softmax(logits, axis=-1)
    weights, idx = jax.lax.top_k(probs, top_k)  # first-index tie-break
    return weights, idx.astype(jnp.int32)


def _swiglu_ragged(
    x_sorted: jnp.ndarray,  # [M, H]
    w_gate: jnp.ndarray,  # [E, H, I]
    w_up: jnp.ndarray,  # [E, H, I]
    w_down: jnp.ndarray,  # [E, I, H]
    group_sizes: jnp.ndarray,  # [E] i32
) -> jnp.ndarray:
    gate = jax.lax.ragged_dot(x_sorted, w_gate, group_sizes)
    up = jax.lax.ragged_dot(x_sorted, w_up, group_sizes)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    return jax.lax.ragged_dot(act, w_down, group_sizes)


def moe_ffn_prefill(
    x_flat: jnp.ndarray,  # [N, H]
    experts: Dict[str, jnp.ndarray],  # gate/up: [E, H, I], down: [E, I, H]
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
) -> jnp.ndarray:
    """Grouped-GEMM MoE FFN for prefill. Returns [N, H] in x dtype."""
    n, h = x_flat.shape
    k = idx.shape[1]
    e = experts["gate"].shape[0]
    m = n * k

    flat_idx = idx.reshape(m)
    # Stable sort by expert id -> contiguous groups.
    order = jnp.argsort(flat_idx, stable=True)
    token_of = order // k  # original token for each sorted assignment
    x_sorted = jnp.take(x_flat, token_of, axis=0)  # [M, H]
    group_sizes = jnp.bincount(flat_idx, length=e).astype(jnp.int32)

    y_sorted = _swiglu_ragged(
        x_sorted, experts["gate"], experts["up"], experts["down"], group_sizes
    )  # [M, H]

    # Unsort back to token-major assignment order.
    inv = jnp.argsort(order, stable=True)
    y = jnp.take(y_sorted, inv, axis=0).reshape(n, k, h)
    out = jnp.sum(y.astype(jnp.float32) * weights[:, :, None], axis=1)
    return out.astype(x_flat.dtype)


def moe_ffn_decode(
    x_flat: jnp.ndarray,  # [N, H] (N small: decode batch)
    experts: Dict[str, jnp.ndarray],
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
) -> jnp.ndarray:
    """Gather-based MoE FFN: reads only the selected experts' weights."""
    w_gate = jnp.take(experts["gate"], idx, axis=0)  # [N, k, H, I]
    w_up = jnp.take(experts["up"], idx, axis=0)
    w_down = jnp.take(experts["down"], idx, axis=0)  # [N, k, I, H]
    gate = jnp.einsum("nh,nkhi->nki", x_flat, w_gate)
    up = jnp.einsum("nh,nkhi->nki", x_flat, w_up)
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    y = jnp.einsum("nki,nkih->nkh", act, w_down)  # [N, k, H]
    out = jnp.sum(y.astype(jnp.float32) * weights[:, :, None], axis=1)
    return out.astype(x_flat.dtype)


def swiglu(x: jnp.ndarray, w_gate, w_up, w_down) -> jnp.ndarray:
    """Dense SwiGLU MLP (reference deepseek_v2.rs:195-200)."""
    gate = x @ w_gate
    up = x @ w_up
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    return act @ w_down
