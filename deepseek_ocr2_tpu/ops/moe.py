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
    experts: Dict[str, jnp.ndarray],  # gate/up: [(L,) E, H, I], down: [(L,) E, I, H]
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
    *,
    layer_idx=0,  # traced i32 when experts are layer-stacked (gmm path only)
) -> jnp.ndarray:
    """Prefill MoE FFN. Returns [N, H] in x dtype.

    Shape-adaptive dispatch (v5e measurements, scripts/bench_moe_pieces.py +
    docs/DESIGN.md): dense all-expert wins at small N (the MXU eats the
    10.7x extra FLOPs while per-expert scheduling overhead dominates); above
    ~512 tokens the Pallas visit-scheduled grouped GEMM (ops/moe_gmm.py)
    wins — `lax.ragged_dot` itself lowers to ~5 TF/s on this backend and is
    kept only as the non-Pallas grouped fallback. All paths are exact (no
    capacity dropping); dense sums experts in ascending id order matching HF
    `moe_infer`. Overrides: DEEPSEEK_MOE_PREFILL=gmm|ragged|dense.
    """
    import os

    from .flash_attention import pallas_enabled

    mode = os.environ.get("DEEPSEEK_MOE_PREFILL")
    big = x_flat.shape[0] > 512
    if mode == "gmm" or (mode is None and big and pallas_enabled()):
        from .moe_gmm import moe_ffn_gmm

        return moe_ffn_gmm(x_flat, experts, weights, idx, layer_idx=layer_idx)
    if experts["gate"].ndim == 4:  # XLA fallbacks take one layer's experts
        li = jnp.asarray(layer_idx, jnp.int32).reshape(())
        experts = {
            k: jax.lax.dynamic_index_in_dim(v, li, 0, keepdims=False)
            for k, v in experts.items()
        }
    if mode == "ragged" or (mode is None and big):
        return moe_ffn_ragged(x_flat, experts, weights, idx)
    return moe_ffn_dense(x_flat, experts, weights, idx)


def moe_ffn_ragged(
    x_flat: jnp.ndarray,  # [N, H]
    experts: Dict[str, jnp.ndarray],  # gate/up: [E, H, I], down: [E, I, H]
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
) -> jnp.ndarray:
    """Grouped-GEMM MoE FFN (sort by expert + lax.ragged_dot)."""
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
    """Decode-time MoE FFN.

    TPU note: `jnp.take` with traced indices lowers to a scalar gather that
    is ~13x slower than streaming contiguous slices (measured 25 ms vs 1 ms
    per 11-layer step on v5e). Two fast paths instead:

    - N*k <= E: unrolled `dynamic_slice` per selected expert — reads exactly
      the chosen experts' weights from HBM (bandwidth-optimal, the TPU
      analogue of the reference's direct expert loop, deepseek_v2.rs:669-698);
    - N*k > E: the fused distinct-expert-visit Pallas kernel
      (ops/moe_decode.py) — each distinct selected expert's weights stream
      once at the byte floor (measured 725 GB/s at b=32 vs dense XLA's
      skinny batched GEMMs). Dense all-expert dispatch is the non-Pallas
      fallback. The prefill gmm kernel was measured slower at decode scale
      (26.5 vs 19.2 ms/step at b=32: per-step visit-schedule construction +
      two extra launches per layer).
    """
    from .flash_attention import pallas_enabled

    n, h = x_flat.shape
    k = idx.shape[1]
    e = experts["gate"].shape[0]
    if n * k <= e:
        i_moe = experts["gate"].shape[2]
        acc = jnp.zeros((n, h), jnp.float32)
        for t in range(n):
            x_t = x_flat[t : t + 1]  # [1, H]
            for j in range(k):
                ex = idx[t, j]
                g = jax.lax.dynamic_slice(experts["gate"], (ex, 0, 0), (1, h, i_moe))[0]
                u = jax.lax.dynamic_slice(experts["up"], (ex, 0, 0), (1, h, i_moe))[0]
                d = jax.lax.dynamic_slice(experts["down"], (ex, 0, 0), (1, i_moe, h))[0]
                gate = x_t @ g
                up = x_t @ u
                act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
                acc = acc.at[t].add((act @ d)[0].astype(jnp.float32) * weights[t, j])
        return acc.astype(x_flat.dtype)
    if pallas_enabled():
        from .moe_decode import moe_ffn_decode_fused

        return moe_ffn_decode_fused(x_flat, experts, weights, idx)
    return moe_ffn_dense(x_flat, experts, weights, idx)


def moe_ffn_dense(
    x_flat: jnp.ndarray,  # [N, H]
    experts: Dict[str, jnp.ndarray],
    weights: jnp.ndarray,  # [N, k] f32
    idx: jnp.ndarray,  # [N, k] i32
) -> jnp.ndarray:
    """Dense all-expert dispatch: compute every expert, combine selected.

    Exact (no capacity dropping); reads all expert weights once regardless of
    routing, so it wins when N*k exceeds the expert count.
    """
    n, h = x_flat.shape
    e = experts["gate"].shape[0]
    gate = jnp.einsum("nh,ehi->nei", x_flat, experts["gate"])
    up = jnp.einsum("nh,ehi->nei", x_flat, experts["up"])
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    y = jnp.einsum("nei,eih->neh", act, experts["down"])  # [N, E, H]
    w_full = jnp.zeros((n, e), jnp.float32)
    w_full = w_full.at[jnp.arange(n)[:, None], idx].add(weights)
    out = jnp.einsum("neh,ne->nh", y.astype(jnp.float32), w_full)
    return out.astype(x_flat.dtype)


def swiglu(x: jnp.ndarray, w_gate, w_up, w_down) -> jnp.ndarray:
    """Dense SwiGLU MLP (reference deepseek_v2.rs:195-200)."""
    gate = x @ w_gate
    up = x @ w_up
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype) * up
    return act @ w_down
