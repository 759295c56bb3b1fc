"""Attention ops — XLA reference paths.

Numeric policy mirrors the reference: scores/softmax/PV in f32, masked
positions filled with -1e4 (NOT -inf; reference deepseek_v2.rs:508,
qwen2.rs:226), output cast back to the activation dtype.

Pallas flash-attention kernels (ops/flash_attention.py) plug in behind the
same signatures; these XLA paths remain the correctness reference and the
CPU-test backend.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

MASK_VALUE = -1.0e4


def sdpa(
    q: jnp.ndarray,  # [B, H, Sq, D]
    k: jnp.ndarray,  # [B, H, Sk, D]
    v: jnp.ndarray,  # [B, H, Sk, D]
    *,
    scale: float,
    mask: Optional[jnp.ndarray] = None,  # bool, True = disallowed; broadcastable to [B,H,Sq,Sk]
    bias: Optional[jnp.ndarray] = None,  # added to scores pre-softmax (f32)
    out_dtype: Optional[jnp.dtype] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention with f32 inner math."""
    out_dtype = out_dtype or q.dtype
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q32, k32, preferred_element_type=jnp.float32)
    scores = scores * jnp.float32(scale)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if mask is not None:
        scores = jnp.where(mask, jnp.float32(MASK_VALUE), scores)
    weights = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum("bhqk,bhkd->bhqd", weights, v32, preferred_element_type=jnp.float32)
    return ctx.astype(out_dtype)


def causal_mask(seq_q: int, seq_k: int, q_start: int = 0) -> jnp.ndarray:
    """Causal mask [Sq, Sk]: True where key position > query position.

    Query i sits at absolute position q_start + i (reference
    deepseek_v2.rs:498-505).
    """
    q_pos = q_start + jnp.arange(seq_q)[:, None]
    k_pos = jnp.arange(seq_k)[None, :]
    return k_pos > q_pos


def prefix_lm_mask(seq: int, n_prefix: int) -> jnp.ndarray:
    """Prefix-LM mask [S, S], True = disallowed (reference qwen2.rs:45-72).

    - prefix rows attend to prefix columns only;
    - suffix rows attend to all prefix columns plus causal self-attention.
    """
    pos = jnp.arange(seq)
    row = pos[:, None]
    col = pos[None, :]
    prefix_row = row < n_prefix
    query_col = col >= n_prefix
    disallow_prefix = prefix_row & query_col
    query_row = row >= n_prefix
    future = col > row
    disallow_query = query_row & query_col & future
    return disallow_prefix | disallow_query


def decode_mask(cap: int, pos: jnp.ndarray) -> jnp.ndarray:
    """Mask [1, cap] for a single decode step at absolute position `pos`.

    Valid keys are positions 0..pos inclusive (the new token's K/V has just
    been written at index `pos`).
    """
    k_pos = jnp.arange(cap)[None, :]
    return k_pos > pos


def repeat_kv(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """Expand KV heads for GQA: [B, Hk, S, D] -> [B, Hk*groups, S, D].

    Matches HF `repeat_kv` ordering (reference qwen2.rs:209-219): each KV head
    is repeated `groups` times contiguously.
    """
    if groups == 1:
        return x
    b, hk, s, d = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, hk, groups, s, d))
    return x.reshape(b, hk * groups, s, d)
