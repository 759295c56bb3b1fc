"""Normalization ops with f32 inner math.

Numeric policy mirrors the reference (and HF):
- RMSNorm: variance/normalize in f32, cast back, apply weight in model dtype
  (reference deepseek_v2.rs:152-162).
- LayerNorm2d: per-channel mean/var in f32 (reference sam.rs:161-175).
- LayerNorm (token): standard LN with eps inside sqrt (reference sam.rs:432).
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float) -> jnp.ndarray:
    """RMSNorm over the last axis (reference deepseek_v2.rs:152-162)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    x_norm = (x32 / rms).astype(dtype)
    return weight.astype(dtype) * x_norm


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """LayerNorm over the last axis, f32 inner math."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = ((x32 - mean) / jnp.sqrt(var + eps)).astype(dtype)
    return y * weight.astype(dtype) + bias.astype(dtype)


def layer_norm_2d(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float
) -> jnp.ndarray:
    """Channel LayerNorm on NCHW tensors (reference sam.rs:161-175).

    Normalizes across the channel axis (dim 1); note the reference divides by
    sqrt(var + eps) with biased variance, matching SAM's LayerNorm2d.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=1, keepdims=True)
    y = ((x32 - mean) / jnp.sqrt(var + eps)).astype(dtype)
    c = weight.shape[0]
    return y * weight.astype(dtype).reshape(1, c, 1, 1) + bias.astype(dtype).reshape(
        1, c, 1, 1
    )
