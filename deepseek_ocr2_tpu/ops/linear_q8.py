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

from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .moe_q8 import quantize_per_col

QLinear = Dict[str, jnp.ndarray]  # {"q8": int8 [In, Out], "scale": f32 [1, Out]}


def quantize_linear(w: jnp.ndarray) -> QLinear:
    """[In, Out] weight -> {"q8", "scale"} (per-output-channel symmetric).

    The input dim is zero-padded to a multiple of 128 so the K-blocked
    decode kernel can walk even, lane-aligned contraction slabs (zero rows
    contribute nothing to the dot; `linear_q8*` pad x to match)."""
    q, s = quantize_per_col(w)
    pad = (-q.shape[0]) % 128
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
    return {"q8": q, "scale": s}


def _pad_x(x: jnp.ndarray, k_in: int) -> jnp.ndarray:
    if x.shape[-1] == k_in:
        return x
    return jnp.pad(x, ((0, 0), (0, k_in - x.shape[-1])))


def is_qlinear(w) -> bool:
    return isinstance(w, dict) and ("q8" in w or "q4" in w)


def _pick_block_o(in_dim: int, out_dim: int, budget_bytes: int = 4 * 1024 * 1024) -> int:
    """Largest multiple-of-128 output-block width keeping the int8 weight
    block under `budget_bytes` (so the double-buffered pair fits VMEM)."""
    bo = max(128, (budget_bytes // in_dim) // 128 * 128)
    return min(out_dim, bo)


def _pick_block_k(in_dim: int, out_dim: int, budget_bytes: int = 4 * 1024 * 1024):
    """Contraction-block height for tall weights: must divide in_dim evenly
    (Pallas pads out-of-range tail blocks, which would corrupt the
    accumulation) and be a multiple of 128 (lane alignment for the x block).
    Returns None if no such split fits the budget."""
    n_min = max(1, -(-in_dim * out_dim // budget_bytes))
    for n in range(n_min, in_dim // 128 + 1):
        if in_dim % n == 0 and (in_dim // n) % 128 == 0:
            return in_dim // n
    return None


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


def _q8_linear_kernel_kblocked(x_ref, w_ref, s_ref, o_ref):
    """Accumulating variant: grid walks the contraction dim, so each weight
    block is a fully contiguous [block_k, Out] row-slab (the column-blocked
    kernel reads Out-strided chunks of block_o bytes — for narrow outputs
    that degrades the DMA to a fraction of peak HBM bandwidth)."""
    ki = pl.program_id(0)
    x = x_ref[:]  # [B, block_k]
    w = w_ref[:].astype(x.dtype)
    acc = jax.lax.dot_general(
        x,
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )

    @pl.when(ki == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] = o_ref[:] + acc

    @pl.when(ki == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = o_ref[:] * s_ref[:]


def linear_q8(
    x: jnp.ndarray,  # [B, In] (bf16/f32), B small (decode batch)
    w: QLinear,
    *,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused int8 linear: (x @ dequant(w)). Returns [B, Out] in out_dtype
    (default: x.dtype). Accumulation in f32, scale applied post-dot.

    Wide weights (Out large) stream output-column blocks; tall weights
    (In >= 2*Out, e.g. down-projections) stream contraction-row slabs
    instead — column blocks of a narrow matrix are heavily strided DMA
    (measured 197 GB/s vs 740+ for contiguous slabs on v5e)."""
    x = _pad_x(x, w["q8"].shape[0])
    b, in_dim = x.shape
    out_dim = w["q8"].shape[1]
    block_k = _pick_block_k(in_dim, out_dim) if in_dim >= 2 * out_dim else None
    if block_k is not None and block_k < in_dim:
        grid = (in_dim // block_k,)
        out = pl.pallas_call(
            _q8_linear_kernel_kblocked,
            grid=grid,
            in_specs=[
                pl.BlockSpec((b, block_k), lambda ki: (0, ki), memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (block_k, out_dim), lambda ki: (ki, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((1, out_dim), lambda ki: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b, out_dim), lambda ki: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, out_dim), jnp.float32),
            interpret=interpret,
        )(x, w["q8"], w["scale"])
        return out.astype(out_dtype or x.dtype)
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
    x = _pad_x(x, w["q8"].shape[0])
    acc = jax.lax.dot_general(
        x,
        w["q8"].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return (acc * w["scale"]).astype(out_dtype or x.dtype)


def qmm(x: jnp.ndarray, w, *, decode: bool = False, out_dtype=None) -> jnp.ndarray:
    """Matmul that transparently handles bf16 tensors or QLinear/QLinear4
    dicts (int8 "q8" or int4 "q4" key — see ops/linear_q4).

    x: [B, In]. `decode=True` selects the fused Pallas kernel (small-batch,
    bandwidth-bound); prefill takes the XLA dequant path.
    """
    if not is_qlinear(w):
        y = x @ w
        return y.astype(out_dtype) if out_dtype is not None else y
    from .flash_attention import pallas_enabled

    if "q4" in w:
        from .linear_q4 import linear_q4, linear_q4_xla

        if decode and pallas_enabled():
            return linear_q4(x, w, out_dtype=out_dtype)
        return linear_q4_xla(x, w, out_dtype=out_dtype)
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
