"""Weight-only int8 linear — fused Pallas dequant + matmul.

Extends the int8 recipe proven on the routed experts (ops/moe_q8.py) to the
rest of the decode-step bandwidth: lm_head, attention projections, shared
experts, and the dense layer's MLP. Decode at batch<=32 is bandwidth-bound
on weight bytes; XLA's `convert(int8) -> dot` materializes the dequantized
bf16 weights to HBM (read int8 + write bf16 + read bf16 = worse than bf16),
so the dequant must live in VMEM. The kernel streams int8 output-column
blocks, converts in VMEM, and runs the MXU dot per block — Pallas
double-buffers consecutive grid steps so the next block's DMA overlaps the
current dot.

Quantization is symmetric per-output-channel int8 (scale = absmax/127 over
the input dim), identical to ops/moe_q8.quantize_per_col. Opt-in: greedy
parity vs the torch oracles is pinned on the bf16 path; the q8 path carries
its own logit-error-bound and kernel==XLA tests.

Reference parity note: the reference has no quantization at all (weights are
f32/f16, main.rs:1361-1385); this is a beyond-reference serving optimization.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moe_q8 import quantize_per_col

QLinear = Dict[str, jnp.ndarray]  # {"q8": int8 [In, Out], "scale": f32 [1, Out]}


def quantize_linear(w: jnp.ndarray) -> QLinear:
    """[In, Out] weight -> {"q8", "scale"} (per-output-channel symmetric)."""
    q, s = quantize_per_col(w)
    return {"q8": q, "scale": s}


def is_qlinear(w) -> bool:
    return isinstance(w, dict) and "q8" in w


def _pick_block_o(in_dim: int, out_dim: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest multiple-of-128 output-block width keeping the int8 weight
    block under `budget_bytes` (so the double-buffered pair fits VMEM)."""
    bo = max(128, (budget_bytes // in_dim) // 128 * 128)
    return min(out_dim, bo)


def _q8_linear_kernel(x_ref, w_ref, s_ref, o_ref):
    x = x_ref[:]  # [B, In]
    w = w_ref[:].astype(x.dtype)  # dequant-to-compute dtype in VMEM
    # Precision pinned to DEFAULT: the global "highest" setting lowers bf16
    # dots to multi-pass forms Mosaic rejects for int8-converted operands
    # (same trap as ops/moe_q8.py).
    acc = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )
    o_ref[:] = acc * s_ref[:]


def linear_q8(
    x: jnp.ndarray,  # [B, In] (bf16/f32), B small (decode batch)
    w: QLinear,
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 linear: (x @ dequant(w)). Returns [B, Out] in out_dtype
    (default: x.dtype). Accumulation in f32, scale applied post-dot."""
    b, in_dim = x.shape
    out_dim = w["q8"].shape[1]
    block_o = _pick_block_o(in_dim, out_dim)
    grid = (pl.cdiv(out_dim, block_o),)
    out = pl.pallas_call(
        _q8_linear_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, in_dim), lambda oi: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((in_dim, block_o), lambda oi: (0, oi), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_o), lambda oi: (0, oi), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, block_o), lambda oi: (0, oi), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
        interpret=interpret,
    )(x, w["q8"], w["scale"])
    return out.astype(out_dtype or x.dtype)


def linear_q8_xla(x: jnp.ndarray, w: QLinear, *, out_dtype=None) -> jnp.ndarray:
    """XLA path, same math as the kernel (dequant to x dtype, f32 accum).

    Used for prefill (many rows: compute-bound, and the x block would not
    fit VMEM) and as the correctness oracle / CPU fallback for the kernel.
    """
    acc = jax.lax.dot_general(
        x,
        w["q8"].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * w["scale"]).astype(out_dtype or x.dtype)


def qmm(x: jnp.ndarray, w, *, decode: bool = False, out_dtype=None) -> jnp.ndarray:
    """Matmul that transparently handles bf16 tensors or QLinear dicts.

    x: [B, In]. `decode=True` selects the fused Pallas kernel (small-batch,
    bandwidth-bound); prefill takes the XLA dequant path.
    """
    if not is_qlinear(w):
        y = x @ w
        return y.astype(out_dtype) if out_dtype is not None else y
    from .flash_attention import pallas_enabled

    if decode and pallas_enabled():
        return linear_q8(x, w, out_dtype=out_dtype)
    return linear_q8_xla(x, w, out_dtype=out_dtype)


def swiglu_q8(
    x: jnp.ndarray,  # [B, H]
    gu,  # QLinear [H, 2I] (gate||up fused) or bf16 tensor
    down,  # QLinear [I, H] or bf16 tensor
    *,
    decode: bool = False,
) -> jnp.ndarray:
    """SwiGLU with fused gate||up projection (one weight stream, split after
    the dot). silu in f32 to match ops/moe.swiglu numerics."""
    h2 = qmm(x, gu, decode=decode, out_dtype=jnp.float32)
    i = h2.shape[-1] // 2
    gate, up = h2[:, :i], h2[:, i:]
    act = (jax.nn.silu(gate) * up).astype(x.dtype)
    return qmm(act, down, decode=decode)
