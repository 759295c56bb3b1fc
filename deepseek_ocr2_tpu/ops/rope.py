"""Rotary position embeddings (LLaMA/Qwen half-split variant).

Matches `transformers` `apply_rotary_pos_emb` as reproduced in the reference
(deepseek_v2.rs:49-91 for the cached LM variant, qwen2.rs:77-113 for the
on-the-fly Qwen2 variant). RoPE math is always f32.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rope_inv_freq(head_dim: int, theta: float) -> np.ndarray:
    """inv_freq[i] = theta^(-2i/head_dim) (reference deepseek_v2.rs:252-257)."""
    exponents = np.arange(0, head_dim, 2, dtype=np.float32) / np.float32(head_dim)
    return (1.0 / (np.float32(theta) ** exponents)).astype(np.float32)


def rope_cache(
    max_pos: int, head_dim: int, theta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Precompute cos/sin caches `[max_pos, head_dim]` in f32.

    Matches the reference's per-module cache (deepseek_v2.rs:259-265):
    emb = concat([freqs, freqs], -1) so both halves see the same frequency.
    """
    inv_freq = rope_inv_freq(head_dim, theta)
    pos = np.arange(max_pos, dtype=np.float32)
    freqs = np.outer(pos, inv_freq)  # [S, D/2]
    emb = np.concatenate([freqs, freqs], axis=-1)  # [S, D]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,  # [B, H, S, D] (f32)
    k: jnp.ndarray,  # [B, Hk, S, D] (f32)
    cos_cache: jnp.ndarray,  # [max_pos, D] f32
    sin_cache: jnp.ndarray,  # [max_pos, D] f32
    start: jnp.ndarray | int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Half-split RoPE on new tokens at positions [start, start+S).

    `start` may be a traced scalar (decode step). Math in f32
    (reference deepseek_v2.rs:321-324).
    """
    seq = q.shape[2]
    dim = q.shape[3]
    cos = jax.lax.dynamic_slice(cos_cache, (start, 0), (seq, dim))
    sin = jax.lax.dynamic_slice(sin_cache, (start, 0), (seq, dim))
    cos = cos[None, None, :, :]
    sin = sin[None, None, :, :]
    q32 = q.astype(jnp.float32)
    k32 = k.astype(jnp.float32)
    q_out = q32 * cos + _rotate_half(q32) * sin
    k_out = k32 * cos + _rotate_half(k32) * sin
    return q_out, k_out
