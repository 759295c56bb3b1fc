"""Static-shape KV cache.

TPU-native replacement for the reference's amortized-doubling cache
(deepseek_v2.rs:203-211, 341-454): XLA requires static shapes, so the cache
is preallocated at a bucketed capacity and written with
`lax.dynamic_update_slice` (the in-place analogue of the reference's
`slice_assign`). Dtype is selectable — the reference's `--kv-cache f32|f16`
maps to f32|bf16 on TPU (f16 has no hardware support; bf16 is the native
16-bit type). Attention math always upcasts cached K/V to f32
(reference deepseek_v2.rs:456-470).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

KVCache = Dict[str, jnp.ndarray]  # {'k': [L,B,H,cap,D], 'v': [L,B,H,cap,D]}


def make_kv_cache(
    num_layers: int,
    batch: int,
    num_heads: int,
    capacity: int,
    head_dim: int,
    dtype: jnp.dtype = jnp.bfloat16,
) -> KVCache:
    if (isinstance(dtype, str) and dtype.startswith("int8")) or (
        not isinstance(dtype, str) and jnp.dtype(dtype) == jnp.int8
    ):
        raise ValueError(
            "int8/int8tail KV applies to the paged pool only (serve "
            "--continuous/--http with --kv-cache int8|int8tail); contiguous "
            "caches are f32/bf16"
        )
    shape = (num_layers, batch, num_heads, capacity, head_dim)
    return {
        "k": jnp.zeros(shape, dtype=dtype),
        "v": jnp.zeros(shape, dtype=dtype),
    }


def bucket_capacity(needed: int, bucket: int = 256, minimum: int = 1024) -> int:
    """Round capacity up to a bucket boundary to limit compile variants."""
    cap = max(needed, minimum)
    return ((cap + bucket - 1) // bucket) * bucket
